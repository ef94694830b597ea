"""Exact distributed order statistics — stages/quantiles.py."""

import numpy as np
import pyarrow as pa


def _ds(vals, dtype=pa.float64()):
    import ray.data as rd

    return rd.from_arrow(pa.table({"x": pa.array(vals, dtype)}))


def test_kth_smallest_forces_refinement():
    from docetl_ray.stages.quantiles import kth_smallest

    rng = np.random.default_rng(3)
    vals = rng.normal(size=20_000).round(8)
    ds = _ds(vals.tolist())
    s = np.sort(vals)
    # threshold 100 -> multiple histogram passes before the final collect
    for k in (1, 7, 9_999, 20_000):
        assert kth_smallest(ds, "x", k, collect_threshold=100) == s[k - 1]


def test_kth_smallest_massive_duplicates():
    # 50k copies of one value + a few outliers: refinement stalls inside
    # an ulp-scale bin and the value-count fallback must resolve exactly
    from docetl_ray.stages.quantiles import kth_smallest

    vals = [3.25] * 50_000 + [1.0, 2.0, 99.0]
    ds = _ds(vals)
    assert kth_smallest(ds, "x", 1, collect_threshold=10) == 1.0
    assert kth_smallest(ds, "x", 3, collect_threshold=10) == 3.25
    assert kth_smallest(ds, "x", 50_002, collect_threshold=10) == 3.25
    assert kth_smallest(ds, "x", 50_003, collect_threshold=10) == 99.0


def test_quantiles_match_duckdb():
    import duckdb

    from docetl_ray.stages.quantiles import quantiles

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [rng.normal(size=5_000), rng.integers(0, 5, 2_000).astype(float)]
    ).round(6)
    ds = _ds(vals.tolist())
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = quantiles(ds, "x", qs, collect_threshold=50)
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(vals, pa.float64())}))
    exp = [
        con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        for q in qs
    ]
    assert got["value"].to_pylist() == exp


def test_quantiles_nulls_and_ints():
    from docetl_ray.stages.quantiles import kth_smallest, quantiles

    ds = _ds([5, None, 1, 3, None, 9], pa.int64())
    assert kth_smallest(ds, "x", 2) == 3.0
    t = quantiles(ds, "x", [0.5])
    assert t["value"].to_pylist() == [3.0]
