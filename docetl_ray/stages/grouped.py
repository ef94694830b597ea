"""Bucketed grouped-map: per-key grouped execution without per-key task
overhead.

``ds.groupby(keys).map_groups(fn)`` invokes ``fn`` once per DISTINCT KEY
— measured ~1-4 ms of pandas/task overhead per group, which dominates
wall time when keys are high-cardinality (one group per document, per
user, per LSH bucket...).  ``grouped_map`` instead:

  1. adds ``_gbucket = hash(key) % num_partitions`` (vectorized via
     ``util_ray.bucket_codes`` — no per-row Python),
  2. shuffles ONCE on the bucket (``groupby("_gbucket",
     num_partitions=...)`` after a coalescing repartition),
  3. inside each bucket task, iterates the key-groups with pandas'
     C-level ``groupby`` and calls ``fn`` per key-group locally.

Same semantics as per-key ``map_groups`` (every key's rows are processed
together by ``fn``), one bounded shuffle, ~``num_partitions`` tasks.
This is the fix that took MinHash dedup from 40 s to 6 s; reused by
gather / session windows / stratified ops.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import pyarrow as pa

from .util_ray import bucket_codes


def _drop_bucket(df: pd.DataFrame) -> pd.DataFrame:
    if "_gbucket" in df.columns:  # the exchange drops it already
        df = df.drop(columns=["_gbucket"])
    return df


def _arrow_out(out: pd.DataFrame | None) -> pa.Table:
    """Wrap a pandas result for the exchange.  A ``None`` / no-column
    empty frame becomes a no-column table: collect()/union skip it, and
    ``fn``'s output schema is unknown when a partition yielded nothing."""
    if out is None or not len(out.columns):
        return pa.table({})
    return pa.Table.from_pandas(
        out, preserve_index=False
    ).replace_schema_metadata(None)


def _bucketed_exchange(ds, keys: list[str], num_partitions: int, arrow_fn):
    """ONE take()-based task exchange on a vectorized hash-bucket column
    — shared by ``grouped_map`` and ``partitioned_map`` so their
    bucketing / empty-output plumbing cannot drift.  The exchange
    replaces ``ds.groupby``: Ray's sort shuffle slices map blocks, and
    sliced Arrow tables pickle their FULL parent buffers — payload rows
    (texts) would ship ~num_partitions times, plus the sort pays seconds
    of fixed cost per invocation (same reasoning as the CDC apply /
    asof_join / lww_latest exchanges)."""
    from .util_ray import exchange_map_groups

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_codes(batch, keys, num_partitions)
        return batch.append_column("_gbucket", pa.array(b, pa.int32()))

    return exchange_map_groups(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "_gbucket",
        num_partitions,
        arrow_fn,
    )


def grouped_map(
    ds,
    keys,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_partitions: int = 32,
):
    """Apply ``fn`` to each key-group; returns the concatenated result."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def per_bucket(bucket_df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in bucket_df.groupby(keys, sort=True, dropna=False):
            out = fn(g)
            if out is not None and len(out):
                outs.append(out)
        if not outs:
            return pd.DataFrame()
        return pd.concat(outs, ignore_index=True)

    def per_bucket_arrow(group: pa.Table) -> pa.Table:
        return _arrow_out(per_bucket(_drop_bucket(group.to_pandas())))

    per_bucket_arrow.__name__ = getattr(fn, "__name__", "grouped_map")
    return _bucketed_exchange(ds, keys, num_partitions, per_bucket_arrow)


def partitioned_map(
    ds,
    keys,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_partitions: int = 32,
):
    """Apply pandas ``fn`` to each hash partition of ``keys`` as a WHOLE
    — not per key-group.  For fns already vectorized ACROSS key-groups
    (LSH-bucket pair generation via index arithmetic, drop_duplicates
    over keys) this is the right altitude: same-key rows are co-located
    by the single take()-based exchange and ``fn`` runs once per
    partition with zero per-key call overhead.  Replaces the
    ``repartition(P).groupby(part % P).map_groups(fn)`` pattern, which
    paid Ray's sort-shuffle fixed cost (seconds) per invocation and
    shipped sliced blocks' full parent buffers."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def whole_partition(group: pa.Table) -> pa.Table:
        return _arrow_out(fn(_drop_bucket(group.to_pandas())))

    whole_partition.__name__ = getattr(fn, "__name__", "partitioned_map")
    return _bucketed_exchange(ds, keys, num_partitions, whole_partition)
