"""Round-4 regression tests for the ADVICE.md findings."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_tree_aggregate_beyond_fanin(ray_session):
    """>fanin blocks forces a second tree level, which must aggregate the
    RENAMED output columns (ADVICE: util_ray.py tree_aggregate spec reuse)."""
    from docetl_ray.stages.util_ray import tree_aggregate

    # 130 one-row blocks, fanin=8 -> 3 levels
    blocks = [pa.table({"k": ["a" if i % 2 else "b"], "v": [float(i)]})
              for i in range(130)]
    ds = rd.from_arrow(blocks)
    out = tree_aggregate(ds, ["k"], [("v", "sum", "s")], fanin=8)
    got = {k: v for k, v in zip(out["k"].to_pylist(), out["s"].to_pylist())}
    exp_a = sum(float(i) for i in range(130) if i % 2)
    exp_b = sum(float(i) for i in range(130) if not i % 2)
    assert got == {"a": exp_a, "b": exp_b}


def test_tree_aggregate_count_folds_to_sum(ray_session):
    from docetl_ray.stages.util_ray import tree_aggregate

    blocks = [pa.table({"k": ["x"], "v": [1.0]}) for _ in range(20)]
    ds = rd.from_arrow(blocks)
    out = tree_aggregate(ds, ["k"], [("v", "count", "c")], fanin=4)
    assert out["c"].to_pylist() == [20]


def test_grouped_aggregate_tree_mean_beyond_fanin(ray_session):
    """The production combine="tree" path (partial names __out_sum etc.)
    across >fanin blocks, including a mean agg."""
    from docetl_ray.stages.reduces import grouped_aggregate

    blocks = [pa.table({"g": ["p", "q"], "x": [float(i), float(i) * 2]})
              for i in range(100)]
    ds = rd.from_arrow(blocks)
    out = grouped_aggregate(ds, ["g"], [("x", "mean", "m"), ("x", "sum", "s")],
                            combine="tree")
    tab = out.to_pandas().set_index("g")
    exp = sum(range(100))
    assert tab.loc["p", "s"] == pytest.approx(exp)
    assert tab.loc["q", "s"] == pytest.approx(exp * 2)
    assert tab.loc["p", "m"] == pytest.approx(exp / 100)
    assert tab.loc["q", "m"] == pytest.approx(exp * 2 / 100)


def test_grouped_aggregate_tree_all_empty(ray_session):
    """All-empty partials must yield a stable empty schema, not a KeyError
    in the mean-finishing code (ADVICE: _combine_partials empty case)."""
    from docetl_ray.stages.reduces import grouped_aggregate

    empty = pa.table({"g": pa.array([], pa.string()),
                      "x": pa.array([], pa.float64())})
    ds = rd.from_arrow([empty, empty, empty])
    out = grouped_aggregate(ds, ["g"], [("x", "mean", "m")], combine="tree")
    assert out.count() == 0
    # NB: ray's to_pandas() drops columns on empty datasets; the Dataset
    # schema is the authoritative check
    assert set(out.schema().names) >= {"g", "m"}


def test_combine_partials_all_empty_pandas_inputs():
    from docetl_ray.stages.util_ray import _combine_partials

    df = pd.DataFrame({"k": pd.Series([], dtype=str),
                       "v": pd.Series([], dtype=float)})
    out = _combine_partials(["k"], [("v", "sum", "s")], df, df)
    assert isinstance(out, pa.Table)
    assert out.num_rows == 0
    assert set(out.schema.names) == {"k", "s"}


def test_hierarchy_headers_empty_header_clears_lower():
    """Reference gather.py:305-315 clears lower levels for EVERY header
    entry — an entry with empty header text but a valid level still clears
    (ADVICE: unnest_split_gather._hierarchy_headers)."""
    from docetl_ray.stages.unnest_split_gather import _hierarchy_headers

    prefix = [
        {"h": [{"header": "Intro", "level": 1},
               {"header": "Sub", "level": 2}]},
        # empty header text, valid level 1: must clear level 2
        {"h": [{"header": "", "level": 1}]},
    ]
    current = {"h": [{"header": "Deep", "level": 3}]}
    got = _hierarchy_headers(current, prefix, "h")
    # level-2 "Sub" was cleared by the empty level-1 entry; only "Intro"
    # (set earlier, not overwritten by the falsy header) survives
    assert "Sub" not in got
    assert "# Intro" in got


def test_hierarchy_headers_missing_key_aborts():
    from docetl_ray.stages.unnest_split_gather import _hierarchy_headers

    prefix = [{"h": [{"header": "A"}]}]  # no "level" key -> reference: ""
    current = {"h": [{"header": "Deep", "level": 3}]}
    assert _hierarchy_headers(current, prefix, "h") == ""


def test_runner_gather_null_peripheral_chunks(ray_session):
    """YAML `peripheral_chunks:` with explicit null must not AttributeError
    (ADVICE: runner.py pc_cfg)."""
    from docetl_ray.runner import _apply_op

    ds = rd.from_items([
        {"doc": 1, "ord": 0, "txt": "a"},
        {"doc": 1, "ord": 1, "txt": "b"},
    ])
    op = {"type": "gather", "name": "g", "content_key": "txt",
          "doc_id_key": "doc", "order_key": "ord",
          "peripheral_chunks": None}
    out = _apply_op(ds, op)
    assert out.count() == 2
