"""Round-5 regression tests for the ADVICE.md findings."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def _collect(ds) -> pa.Table:
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    return pa.concat_tables(tabs, promote_options="permissive") if tabs \
        else pa.table({})


def test_llm_resolve_no_admitted_pairs_falls_back_to_all(ray_session):
    """When no blocking condition admits ANY pair in a block, ALL pairs
    are compared (reference resolve.py:411-412) — blocks with at least
    one admitted pair keep the filtered behavior."""
    from docetl_ray.stages.resolve import llm_resolve

    rows = [
        # block x: no pair shares a 4-char prefix -> fallback, all merge
        {"eid": 1, "blk": "x", "text": "aaaa one"},
        {"eid": 2, "blk": "x", "text": "bbbb two"},
        {"eid": 3, "blk": "x", "text": "cccc three"},
        # block y: one admitted pair (4,5); 6 stays out despite the
        # always-match client because y does NOT fall back
        {"eid": 4, "blk": "y", "text": "dddd one"},
        {"eid": 5, "blk": "y", "text": "dddd two"},
        {"eid": 6, "blk": "y", "text": "eeee three"},
    ]
    ds = rd.from_items(rows).map_batches(
        lambda t: pa.table({k: t[k] for k in ("eid", "blk", "text")}),
        batch_format="pyarrow",
    )

    class AlwaysMatch:
        model = "always"

        def complete(self, prompt, schema):
            return {"is_match": True}

    out = _collect(llm_resolve(
        ds, blocking_col="blk", id_col="eid",
        comparison_prompt="{{ input1.text }} vs {{ input2.text }}",
        client_factory=AlwaysMatch,
        blocking_conditions=['input1["text"][:4] == input2["text"][:4]'],
    ))
    canon = dict(zip(out["eid"].to_pylist(), out["_canonical"].to_pylist()))
    assert canon == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_combine_partials_all_empty_count_is_int64():
    """A count output in the all-empty branch must be int64 even when the
    source column is a string — a later tree level mixes it with real
    int64 counts (ADVICE r4: util_ray.py:306)."""
    from docetl_ray.stages.util_ray import _combine_partials

    empty = pa.table({"k": pa.array([], pa.large_string()),
                      "v": pa.array([], pa.large_string())})
    out = _combine_partials(["k"], [("v", "count", "c")], empty, empty)
    assert out.num_rows == 0
    assert out.schema.field("c").type == pa.int64()
    # and the empty result must concat cleanly with a real count partial
    real = pa.table({"k": pa.array(["a"], pa.large_string()),
                     "c": pa.array([3], pa.int64())})
    merged = _combine_partials(["k"], [("c", "sum", "c")], out, real)
    assert merged["c"].to_pylist() == [3]


def test_metadata_free_schema_heterogeneous_dir_falls_back(tmp_path):
    """A directory whose files carry metadata but different schemas must
    return None (Ray unifies), not force file 0's schema on every file
    (ADVICE r4: sources.py:43)."""
    from docetl_ray.sources import _metadata_free_schema

    d = tmp_path / "mixed"
    d.mkdir()
    # pandas writes pandas-metadata-bearing schemas
    pd.DataFrame({"a": [1, 2], "b": [None, None]}).to_parquet(d / "0.parquet")
    pd.DataFrame({"a": [3, 4], "b": ["x", "y"]}).to_parquet(d / "1.parquet")
    assert _metadata_free_schema(str(d), None) is None

    # homogeneous directory still returns the stripped schema
    h = tmp_path / "same"
    h.mkdir()
    pd.DataFrame({"a": [1], "b": ["x"]}).to_parquet(h / "0.parquet")
    pd.DataFrame({"a": [2], "b": ["y"]}).to_parquet(h / "1.parquet")
    schema = _metadata_free_schema(str(h), None)
    assert schema is not None and schema.metadata is None
    assert schema.names == ["a", "b"]


def test_auto_pin_estimate_scales_by_column_share(ray_session, tmp_path):
    """pin="auto" must compare the single projected column's share of the
    metadata size estimate, not the full-table estimate — a wide table
    with one small numeric column should still pin (ADVICE r4:
    quantiles.py:128)."""
    import numpy as np

    from docetl_ray.stages.quantiles import _auto_pin_size_estimate

    n = 5000
    wide = pa.table({
        "v": pa.array(np.arange(n, dtype=np.float64)),
        **{f"pad{i}": pa.array(["x" * 200] * n) for i in range(7)},
    })
    path = str(tmp_path / "wide.parquet")
    pq.write_table(wide, path)
    ds = rd.read_parquet(path)
    est = _auto_pin_size_estimate(ds)
    full = ds.size_bytes()
    assert est is not None and full is not None
    assert est <= full // 8 + 1  # 8 columns -> at most a 1/8 share


def test_quantiles_pin_auto_wide_table_still_exact(ray_session, tmp_path):
    """End-to-end: pin="auto" over a wide table (threshold between the
    column share and the full size, i.e. the pre-fix code would skip the
    pin) stays exact."""
    import math

    import numpy as np

    from docetl_ray.stages.quantiles import quantiles

    n = 4000
    rng = np.random.default_rng(5)
    vals = rng.normal(size=n).round(6)
    wide = pa.table({
        "v": pa.array(vals),
        **{f"pad{i}": pa.array(["y" * 100] * n) for i in range(7)},
    })
    path = str(tmp_path / "wideq.parquet")
    pq.write_table(wide, path)
    ds = rd.read_parquet(path)
    full = ds.size_bytes()
    out = quantiles(ds, "v", [0.25, 0.5, 0.75], collect_threshold=256,
                    pin="auto", pin_threshold_bytes=full // 2)
    s = np.sort(vals)
    exp = [s[max(1, math.ceil(q * n)) - 1] for q in (0.25, 0.5, 0.75)]
    assert out["value"].to_pylist() == exp
