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


def _collect(ds) -> pa.Table:
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    return pa.concat_tables(tabs, promote_options="permissive") if tabs \
        else pa.table({})


def test_llm_resolve_blocking_conditions(ray_session):
    """Pairs failing every blocking condition are never compared
    (reference resolve.py:290-294): with an always-match client, clusters
    form only within predicate-passing pairs."""
    from docetl_ray.stages.resolve import llm_resolve

    rows = [
        {"eid": 1, "blk": "x", "text": "aaaa one"},
        {"eid": 2, "blk": "x", "text": "aaaa two"},
        {"eid": 3, "blk": "x", "text": "bbbb one"},
        {"eid": 4, "blk": "x", "text": "bbbb two"},
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
    assert canon == {1: 1, 2: 1, 3: 3, 4: 3}

    # without conditions the always-match client merges the whole block
    out2 = _collect(llm_resolve(
        ds, blocking_col="blk", id_col="eid",
        comparison_prompt="{{ input1.text }} vs {{ input2.text }}",
        client_factory=AlwaysMatch,
    ))
    canon2 = dict(zip(out2["eid"].to_pylist(), out2["_canonical"].to_pylist()))
    assert canon2 == {1: 1, 2: 1, 3: 1, 4: 1}


def test_llm_resolve_blocked_pairs_do_not_consume_budget(ray_session):
    """Skipped (condition-failing) pairs must not count toward
    limit_comparisons — the reference filters blocked pairs BEFORE
    capping."""
    from docetl_ray.stages.resolve import llm_resolve

    # sorted-id pair order: (1,2) fails, (1,3) passes, (1,4) fails,
    # (2,3) fails, (2,4) passes ... with limit=2 the two PASSING pairs
    # must both be compared even though earlier pairs were skipped
    rows = [
        {"eid": 1, "blk": "x", "g": "a"},
        {"eid": 2, "blk": "x", "g": "b"},
        {"eid": 3, "blk": "x", "g": "a"},
        {"eid": 4, "blk": "x", "g": "b"},
    ]
    ds = rd.from_items(rows).map_batches(
        lambda t: pa.table({k: t[k] for k in ("eid", "blk", "g")}),
        batch_format="pyarrow",
    )

    class AlwaysMatch:
        model = "always"

        def complete(self, prompt, schema):
            return {"is_match": True}

    out = _collect(llm_resolve(
        ds, blocking_col="blk", id_col="eid",
        comparison_prompt="{{ input1.eid }} vs {{ input2.eid }}",
        client_factory=AlwaysMatch,
        blocking_conditions=['input1["g"] == input2["g"]'],
        limit_comparisons=2,
    ))
    canon = dict(zip(out["eid"].to_pylist(), out["_canonical"].to_pylist()))
    assert canon == {1: 1, 3: 1, 2: 2, 4: 2}


def test_condition_blocked_pairs(ray_session):
    from docetl_ray.stages.fuzzy_join import condition_blocked_pairs

    left = rd.from_items([{"lid": i, "k": i % 3} for i in range(6)])
    right = rd.from_items([{"rid": 10 + j, "rk": j} for j in range(3)])
    pairs = _collect(condition_blocked_pairs(
        left, right, ['left["k"] == right["rk"]'],
        left_id="lid", right_id="rid",
    ))
    got = sorted(zip(pairs["lid"].to_pylist(), pairs["rid"].to_pylist()))
    assert got == [(0, 10), (1, 11), (2, 12), (3, 10), (4, 11), (5, 12)]


def test_condition_blocked_pairs_same_id_name_raises(ray_session):
    import pytest as _pytest

    from docetl_ray.stages.fuzzy_join import condition_blocked_pairs

    left = rd.from_items([{"id": 1}])
    with _pytest.raises(ValueError, match="distinct"):
        condition_blocked_pairs(left, left, ["True"], left_id="id",
                                right_id="id")


def test_runner_equijoin_blocking_conditions(tmp_path, ray_session):
    """YAML equijoin with blocking_conditions + comparison_prompt routes
    through condition_blocked_pairs -> llm_equijoin."""
    import pyarrow.parquet as pq

    from docetl_ray.runner import PipelineRunner
    from docetl_ray.stages.llm import FakeDeterministicClient

    pq.write_table(
        pa.table({"lid": [1, 2, 3], "name": ["acme", "acme", "zeta"]}),
        tmp_path / "l.parquet",
    )
    pq.write_table(
        pa.table({"rid": [7, 8], "rname": ["acme", "beta"]}),
        tmp_path / "r.parquet",
    )
    cfg = {
        "datasets": {
            "left": {"type": "file", "path": str(tmp_path / "l.parquet")},
            "right": {"type": "file", "path": str(tmp_path / "r.parquet")},
        },
        "operations": [
            {"name": "j", "type": "equijoin", "right": "right",
             "left_id": "lid", "right_id": "rid",
             "blocking_conditions": ['left["name"] == right["rname"]'],
             "comparison_prompt": "M?\nA: {{ input1.name }}\nB: {{ input2.rname }}"},
        ],
        "pipeline": {"steps": [{"name": "s1", "input": "left",
                                "operations": ["j"]}]},
    }
    out = _collect(PipelineRunner(cfg).run())
    # blocked candidates are exactly (1,7) and (2,7); the fake client's
    # md5 verdict is shared by both (identical rendered prompt)
    expect = bool(FakeDeterministicClient().complete(
        "M?\nA: acme\nB: acme", {"is_match": "bool"}).get("is_match"))
    if expect:
        assert sorted(out["lid"].to_pylist()) == [1, 2]
        assert set(out["rid"].to_pylist()) == {7}
    else:
        assert out.num_rows == 0


def test_value_sample_sem_sim():
    """sem_sim: cosine vs caller-supplied query embedding, top-k in the
    reference's ascending-similarity order (reduce.py:462-464)."""
    from docetl_ray.stages.llm import _value_sample

    rows = [
        {"i": 0, "emb": [1.0, 0.0]},
        {"i": 1, "emb": [0.0, 1.0]},
        {"i": 2, "emb": [0.9, 0.1]},
        {"i": 3, "emb": [-1.0, 0.0]},
        {"i": 4, "emb": [0.7, 0.7]},
    ]
    cfg = {"enabled": True, "method": "sem_sim", "sample_size": 3,
           "embedding_col": "emb", "query_embedding": [1.0, 0.0]}
    out = _value_sample(rows, cfg)
    # ascending similarity: 4 (0.707) < 2 (~0.994) < 0 (1.0)
    assert [r["i"] for r in out] == [4, 2, 0]


def test_value_sample_cluster_covers_clusters():
    """cluster: deterministic k-means + round-robin pick — one member
    from each of two well-separated clusters."""
    from docetl_ray.stages.llm import _value_sample

    rows = (
        [{"i": i, "emb": [10.0 + 0.01 * i, 10.0]} for i in range(3)]
        + [{"i": 10 + i, "emb": [-10.0 - 0.01 * i, -10.0]} for i in range(3)]
    )
    cfg = {"enabled": True, "method": "cluster", "sample_size": 2,
           "embedding_col": "emb"}
    out = _value_sample(rows, cfg)
    assert len(out) == 2
    groups = {r["i"] // 10 for r in out}
    assert groups == {0, 1}  # one from each cluster
    # deterministic across calls
    assert [r["i"] for r in _value_sample(rows, cfg)] == [r["i"] for r in out]


def test_value_sample_needs_embedding_col():
    import pytest as _pytest

    from docetl_ray.stages.llm import _value_sample

    with _pytest.raises(NotImplementedError, match="embedding_col"):
        _value_sample([{"i": 0}] * 5, {"enabled": True, "method": "cluster",
                                       "sample_size": 2})


def test_llm_reduce_value_sampling_cluster(ray_session):
    """llm_reduce end-to-end: value_sampling bounds the rows rendered into
    the prompt while _counts_prereduce still counts the FULL group."""
    from docetl_ray.stages.llm import llm_reduce

    rows = []
    for g in ("a", "b"):
        for i in range(4):
            sign = 1.0 if i < 2 else -1.0
            rows.append({"g": g, "i": i, "emb": [sign * 5.0 + 0.1 * i, sign]})
    ds = rd.from_items(rows)

    class CountingClient:
        model = "counting"

        def complete(self, prompt, schema):
            # the prompt renders one "row:" line per sampled input
            return {"n_in_prompt": prompt.count("row:")}

    out = _collect(llm_reduce(
        ds, "g",
        "{% for r in inputs %}row: {{ r.i }}\n{% endfor %}",
        {"n_in_prompt": "int"},
        client_factory=CountingClient,
        value_sampling={"enabled": True, "method": "cluster",
                        "sample_size": 2, "embedding_col": "emb"},
    ))
    got = dict(zip(out["g"].to_pylist(), out["n_in_prompt"].to_pylist()))
    assert got == {"a": 2, "b": 2}
    counts = dict(zip(out["g"].to_pylist(),
                      out["_counts_prereduce"].to_pylist()))
    assert counts == {"a": 4, "b": 4}


def test_llm_reduce_value_sampling_sem_sim(ray_session):
    from docetl_ray.stages.llm import llm_reduce

    rows = [{"g": "a", "i": i, "emb": [float(i), 1.0]} for i in range(5)]
    ds = rd.from_items(rows)

    class EchoClient:
        model = "echo"

        def complete(self, prompt, schema):
            ids = [int(x) for x in prompt.replace("row:", " ").split()]
            return {"picked": ",".join(map(str, ids))}

    out = _collect(llm_reduce(
        ds, "g",
        "{% for r in inputs %}row: {{ r.i }} {% endfor %}",
        {"picked": "str"},
        client_factory=EchoClient,
        value_sampling={"enabled": True, "method": "sem_sim",
                        "sample_size": 2, "embedding_col": "emb",
                        "query_embedding": [1.0, 0.0]},
    ))
    # highest cosine with [1,0]: i=4 then i=3; ascending-sim order -> 3,4
    assert out["picked"].to_pylist() == ["3,4"]


def test_quantiles_unpinned_reread(tmp_path, ray_session):
    """pin auto falls back to re-reading a pruned source above the size
    threshold; results match the pinned path exactly."""
    import pyarrow.parquet as pq

    from docetl_ray.stages.quantiles import quantiles

    vals = [float(i) for i in range(10_000)]
    pq.write_table(pa.table({"x": vals, "y": vals}), tmp_path / "t.parquet")
    src = lambda: rd.read_parquet(str(tmp_path / "t.parquet"), columns=["x"])  # noqa: E731
    pinned = quantiles(src(), "x", [0.1, 0.5, 0.9], pin=True)
    # threshold of 1 byte forces the unpinned re-read path on the bare read
    unpinned = quantiles(src(), "x", [0.1, 0.5, 0.9], pin="auto",
                         pin_threshold_bytes=1)
    assert pinned["value"].to_pylist() == unpinned["value"].to_pylist()


def test_quantiles_lazy_upstream_single_execution(tmp_path, ray_session):
    """A TRANSFORMED (non-bare-read) upstream keeps the pin in auto mode
    — its batches execute once, not once per refinement pass."""
    import os as _os

    import pyarrow.parquet as pq

    from docetl_ray.stages.quantiles import quantiles

    pq.write_table(
        pa.table({"x": [float(i) for i in range(200_000)]}),
        tmp_path / "t.parquet",
    )
    marker = str(tmp_path / "exec_count")

    def bump(t: pa.Table) -> pa.Table:
        with open(marker, "a") as f:
            f.write("x\n")
            f.flush()
            _os.fsync(f.fileno())
        return t

    ds = rd.read_parquet(str(tmp_path / "t.parquet")).map_batches(
        bump, batch_format="pyarrow"
    )
    out = quantiles(ds, "x", [0.5], collect_threshold=256)
    # quantile_disc: 1-indexed rank ceil(0.5*200000)=100000 -> value 99999.0
    assert out["value"].to_pylist() == [99999.0]
    with open(marker) as f:
        n_first = len(f.readlines())
    assert n_first >= 1
    # rerun the SAME lazy upstream via the unpinned path: each pass would
    # re-execute; with the pin (auto on transformed upstream) the batch
    # count must not multiply -- compare against a forced-unpinned run
    with open(marker, "w"):
        pass
    quantiles(ds, "x", [0.5], collect_threshold=256, pin=False)
    with open(marker) as f:
        n_unpinned = len(f.readlines())
    # the refinement makes >=3 passes; unpinned re-executes each pass
    assert n_unpinned >= 2 * n_first


def test_asof_join_salted_hot_key(ray_session):
    """salt>1 splits a hot by-key's left rows across sub-tasks while
    replicating the key's right side — results identical to unsalted."""
    from docetl_ray.stages.asof import asof_join

    # one hot key carrying 2000 left rows, two cold keys; right side is
    # bounded per-key state
    left_rows = (
        [{"k": "hot", "t": i, "lv": i} for i in range(2000)]
        + [{"k": "a", "t": i, "lv": 100 + i} for i in range(5)]
        + [{"k": "b", "t": i, "lv": 200 + i} for i in range(5)]
    )
    right_rows = [
        {"k": k, "t": t, "rv": f"{k}@{t}"}
        for k in ("hot", "a", "b")
        for t in (0, 500, 1500)
    ]
    left = rd.from_items(left_rows)
    right = rd.from_items(right_rows)

    base = _collect(asof_join(left, right, on="t", by="k", num_buckets=4))
    salted = _collect(
        asof_join(left, right, on="t", by="k", num_buckets=4, salt=4)
    )
    key = ["k", "t"]
    b = base.to_pandas().sort_values(key).reset_index(drop=True)
    s = salted.to_pandas().sort_values(key).reset_index(drop=True)
    assert len(b) == len(s) == 2010
    assert (b["rv"].fillna("") == s["rv"].fillna("")).all()
    # spot-check the asof semantics on the hot key
    hot = s[s["k"] == "hot"].set_index("t")["rv"]
    assert hot.loc[499] == "hot@0"
    assert hot.loc[500] == "hot@500"
    assert hot.loc[1999] == "hot@1500"


def test_minhash_exact_sparse_matches_dense(ray_session):
    """The sparse broadcast-text verify and the dense keyed-shuffle-join
    verify must produce identical exact-Jaccard pairs."""
    import numpy as np

    from docetl_ray import synth
    from docetl_ray.stages.dedup import minhash_candidates

    docs = rd.from_arrow(synth.docs_for_indices(np.arange(300)))

    def pairs_with(thr):
        out = _collect(minhash_candidates(
            docs, "text", "doc_id", threshold=0.8, verify="exact",
            sparse_text_pairs=thr,
        ))
        return sorted(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist(),
                          [round(j, 12) for j in out["est_jaccard"].to_pylist()]))

    sparse = pairs_with(10_000)   # all pairs fit the broadcast path
    dense = pairs_with(0)         # force the keyed-shuffle join path
    assert sparse == dense
    assert len(sparse) == 30      # the planted i%10==1 near-dup pairs


def test_fuzzy_join_paths_equivalent(ray_session):
    """sparse broadcast-text, dense join, and prefiltered variants of
    fuzzy_join must all produce the same verified pairs."""
    import numpy as np

    from docetl_ray import synth
    from docetl_ray.stages.fuzzy_join import fuzzy_join

    # cross-side near-dups: right row j is a light mutation of left row j
    # for j % 3 == 0, otherwise an unrelated doc
    ltexts = [synth._distinct_text(i) for i in range(100)]
    rtexts = [
        ltexts[j] + " tail" if j % 3 == 0 else synth._distinct_text(1000 + j)
        for j in range(100)
    ]
    left = rd.from_arrow(pa.table(
        {"lid": pa.array(range(100), pa.int64()), "ltext": ltexts}))
    right = rd.from_arrow(pa.table(
        {"rid": pa.array(range(100, 200), pa.int64()), "rtext": rtexts}))

    def run(**kw):
        out = _collect(fuzzy_join(
            left, right, left_text="ltext", right_text="rtext",
            left_id="lid", right_id="rid", threshold=0.8, **kw,
        ))
        return sorted(zip(out["lid"].to_pylist(), out["rid"].to_pylist(),
                          [round(j, 12) for j in out["jaccard"].to_pylist()]))

    sparse = run()
    dense = run(sparse_text_pairs=0)
    pre = run(prefilter=True)
    assert sparse == dense == pre
    assert len(sparse) == 34  # j in {0,3,...,99}
    # zero-match case returns an empty, correctly-typed pair set on
    # every path (the sparse path must not KeyError on no candidates)
    far = rd.from_arrow(pa.table(
        {"rid": pa.array([500], pa.int64()),
         "rtext": [synth._distinct_text(5000)]}))
    for kw in ({}, {"sparse_text_pairs": 0}, {"prefilter": True}):
        out = _collect(fuzzy_join(
            left, far, left_text="ltext", right_text="rtext",
            left_id="lid", right_id="rid", threshold=0.8, **kw,
        ))
        assert out.num_rows == 0


def test_arrow_refs_single_execution(tmp_path, ray_session):
    """util_ray.arrow_refs must execute the pipeline exactly once —
    Ray's bare to_arrow_refs re-executes it behind a limit(1) schema
    probe (the bug this helper exists to avoid)."""
    import os as _os

    from docetl_ray.stages.util_ray import arrow_refs

    marker = str(tmp_path / "execs")

    def bump(t: pa.Table) -> pa.Table:
        with open(marker, "a") as f:
            f.write("x\n")
            f.flush()
            _os.fsync(f.fileno())
        return t

    ds = rd.range(1000, override_num_blocks=4).map_batches(
        bump, batch_format="pyarrow"
    )
    refs = arrow_refs(ds)
    assert sum(t.num_rows for t in __import__("ray").get(refs)) == 1000
    with open(marker) as f:
        n = len(f.readlines())
    assert n == 4  # one bump per block, exactly one pipeline execution


def test_synth_docs_vectors_deterministic():
    """Scale-bench generators are pure functions of the absolute index —
    identical regardless of chunk boundaries."""
    import numpy as np

    from docetl_ray import synth

    whole = synth.docs_for_indices(np.arange(0, 40))
    parts = pa.concat_tables([
        synth.docs_for_indices(np.arange(0, 7)),
        synth.docs_for_indices(np.arange(7, 25)),
        synth.docs_for_indices(np.arange(25, 40)),
    ])
    assert whole.equals(parts)

    vw = synth.vectors_for_indices(np.arange(0, 20), dim=16)
    vp = pa.concat_tables([
        synth.vectors_for_indices(np.arange(0, 3), dim=16),
        synth.vectors_for_indices(np.arange(3, 20), dim=16),
    ])
    assert vw.equals(vp)

    # near-dup structure: i%10==1 is a suffix mutation of i-1
    t10 = whole["text"][10].as_py()
    t11 = whole["text"][11].as_py()
    assert t11.startswith(t10) and t11 != t10
    # non-dup neighbors are unrelated
    assert not whole["text"][3].as_py().startswith(whole["text"][2].as_py()[:20])


def test_read_dataset_strips_pandas_metadata(tmp_path, ray_session):
    """Pandas-written parquet (schema metadata) reads through the library
    with a metadata-free schema — the 4x shuffle slow-path guard."""
    import pandas as pd

    from docetl_ray.sources import _metadata_free_schema, read_dataset

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    df.to_parquet(tmp_path / "p.parquet")
    sch = _metadata_free_schema(str(tmp_path / "p.parquet"), None)
    assert sch is not None and not sch.metadata
    ds = read_dataset(str(tmp_path / "p.parquet"), columns=["a"])
    tab = _collect(ds)
    assert tab.column_names == ["a"]
    assert not tab.schema.metadata
    assert sorted(tab["a"].to_pylist()) == [1, 2, 3]

    # metadata-free parquet keeps Ray's own inference (schema=None)
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"c": [1]}), tmp_path / "clean.parquet")
    assert _metadata_free_schema(str(tmp_path / "clean.parquet"), None) is None


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


def test_grouped_map_all_empty_groups_keeps_schema(ray_session):
    """Every group yielding zero rows must still produce a result whose
    schema is derivable (the task exchange feeds all-empty bundles the
    materialized input schema)."""
    from docetl_ray.stages.grouped import grouped_map

    ds = rd.from_arrow(pa.table({"k": ["a", "b", "c"], "v": [1, 2, 3]}))
    out = grouped_map(ds, ["k"], lambda g: g.iloc[0:0], num_partitions=4)
    tabs = [t for t in out.to_arrow_refs()]
    import ray as _ray

    total = sum(t.num_rows for t in _ray.get(tabs))
    assert total == 0


def test_grouped_map_payload_roundtrip(ray_session):
    """Exchange-routed grouped_map returns exactly the per-group fn
    output, across more partitions than groups and with a payload col."""
    from docetl_ray.stages.grouped import grouped_map

    ds = rd.from_arrow(
        pa.table({"k": ["a", "a", "b", "b", "b", "c"],
                  "txt": [f"t{i}" * 50 for i in range(6)],
                  "v": [5, 3, 9, 1, 7, 2]})
    )

    def pick_max(g):
        return g.sort_values("v", ascending=False).head(1)

    out = grouped_map(ds, ["k"], pick_max, num_partitions=16)
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["v"].tolist() == [5, 9, 2]
    assert df["txt"].tolist() == ["t0" * 50, "t2" * 50, "t5" * 50]


def test_bench_steal_helpers():
    """_steal_pct is a safe ratio of /proc/stat deltas."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    s0, t0 = bench._cpu_sample()
    assert t0 >= s0 >= 0
    assert bench._steal_pct((0, 0), (0, 0)) == 0.0
    assert bench._steal_pct((10, 100), (30, 300)) == 10.0


def test_agglomerative_nn_cache_matches_full_argmin():
    """The nearest-neighbor row cache must reproduce the exact merge
    sequence (ids, order, distances) of a full-matrix-argmin
    Lance-Williams loop, including first-occurrence tie-breaks."""
    import numpy as np

    from docetl_ray.stages.cluster import agglomerative_merges

    def plain_lw(matrix):
        matrix = np.ascontiguousarray(matrix, dtype=np.float64)
        n = len(matrix)
        if n <= 1:
            return []
        sq = (matrix * matrix).sum(axis=1)
        dist = np.sqrt(np.maximum(
            sq[:, None] + sq[None, :] - 2.0 * (matrix @ matrix.T), 0.0))
        np.fill_diagonal(dist, np.inf)
        size = np.ones(n)
        merges = []
        for _ in range(n - 1):
            flat = int(np.argmin(dist))
            ci, cj = divmod(flat, n)
            if ci > cj:
                ci, cj = cj, ci
            merges.append((ci, cj, float(dist[ci, cj])))
            si, sj = size[ci], size[cj]
            new = (si * dist[ci] + sj * dist[cj]) / (si + sj)
            dist[ci, :] = new
            dist[:, ci] = new
            dist[ci, ci] = np.inf
            dist[cj, :] = np.inf
            dist[:, cj] = np.inf
            size[ci] = si + sj
        return merges

    rng = np.random.default_rng(23)
    for _ in range(15):
        n = int(rng.integers(2, 50))
        m = rng.normal(size=(n, int(rng.integers(1, 8))))
        assert plain_lw(m) == agglomerative_merges(m)
    # exact ties: duplicates, grids, equally-spaced lines
    for m in (
        np.zeros((7, 2)),
        np.array([[float(i % 3), float(i // 3)] for i in range(9)]),
        np.array([[float(i)] for i in range(6)]),
    ):
        assert plain_lw(m) == agglomerative_merges(m)
