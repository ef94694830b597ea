"""Per-row transform stages: map / parallel_map / filter / drop_keys /
add_uuid parity (SURVEY.md §2.1).

Reference semantics mirrored (deterministically, no LLM):
  - ``code_map``  ≈ docetl ``map`` / ``code_map``
    (``/root/reference/docetl/operations/map.py:308-422``,
    ``code_operations.py:12-73``): merge computed columns over the row,
    then optionally drop keys (``map.py:276-284``).
  - ``parallel_map`` ≈ ``parallel_map`` (``map.py:556-778``): N transforms
    each contributing a disjoint set of output columns, fused into ONE
    ``map_batches`` pass (no extra scan per prompt).
  - ``code_filter`` ≈ ``filter``/``code_filter`` (``filter.py:80-98``):
    the predicate column never appears in the output.
  - ``add_hash_id`` ≈ ``add_uuid`` (``add_uuid.py:29-38``) but
    deterministic: md5 of the key columns instead of uuid4, so results
    are reproducible across runs and match a SQL oracle.

All bodies are Arrow-vectorized; a transform is a function
``pa.Table -> pa.Table | dict[str, Array]`` applied zero-copy.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc


def code_map(
    ds,
    transform: Callable[[pa.Table], pa.Table],
    *,
    drop: list[str] | None = None,
    batch_size: int | None = None,
    concurrency=None,
    num_cpus: float | None = None,
):
    """Vectorized map: ``transform`` computes/overwrites columns per batch.

    Pass a callable *class* as ``transform`` with ``concurrency`` to get an
    actor pool (stateful setup once per actor in ``__init__``).
    """
    kwargs = {}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    if num_cpus is not None:
        kwargs["num_cpus"] = num_cpus
    out = ds.map_batches(transform, batch_format="pyarrow", **kwargs)
    if drop:
        out = out.drop_columns(drop)
    return out


def parallel_map(ds, transforms: list[Callable[[pa.Table], dict[str, pa.Array]]]):
    """N transforms per batch, each returning new columns; fused single pass.

    Later transforms win on column-name collisions (reference merges prompt
    outputs in order, ``map.py:700-737``).
    """

    def fused(batch: pa.Table) -> pa.Table:
        for t in transforms:
            cols = t(batch)
            for name, arr in cols.items():
                if name in batch.column_names:
                    batch = batch.set_column(batch.column_names.index(name), name, arr)
                else:
                    batch = batch.append_column(name, arr)
        return batch

    return ds.map_batches(fused, batch_format="pyarrow")


def code_filter(ds, predicate: Callable[[pa.Table], pa.Array | pa.ChunkedArray]):
    """Keep rows where the vectorized ``predicate(batch)`` mask is true."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(predicate(batch))

    return ds.map_batches(fn, batch_format="pyarrow")


def drop_keys(ds, keys: list[str]):
    """Drop columns (docetl map drop_keys-only mode)."""
    return ds.drop_columns(keys)


def add_hash_id(ds, key_cols: list[str], id_key: str = "doc_id_hash"):
    """Deterministic row id: md5 hex of '|'-joined key column values.

    SQL-oracle equivalent: ``md5(concat_ws('|', cols...))`` in DuckDB.
    """
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        cols = [pc.cast(batch[c], pa.string()).to_pylist() for c in key_cols]
        ids = [
            hashlib.md5("|".join("" if v is None else v for v in row).encode()).hexdigest()
            for row in zip(*cols)
        ]
        return batch.append_column(id_key, pa.array(ids, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
