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


def test_llm_resolve_fallback_is_global_not_per_block(ray_session):
    """The fall-back-to-all-pairs fires only when NO blocking condition
    admits any pair GLOBALLY (reference resolve.py:411-412 — a
    misconfiguration guard).  A sparse block with zero admitted pairs,
    while another block admits some, compares nothing."""
    from docetl_ray.stages.resolve import llm_resolve

    class AlwaysMatch:
        model = "always"

        def complete(self, prompt, schema):
            return {"is_match": True}

    rows = [
        # block x: no pair shares a 4-char prefix -> zero admitted
        {"eid": 1, "blk": "x", "text": "aaaa one"},
        {"eid": 2, "blk": "x", "text": "bbbb two"},
        {"eid": 3, "blk": "x", "text": "cccc three"},
        # block y: one admitted pair (4,5)
        {"eid": 4, "blk": "y", "text": "dddd one"},
        {"eid": 5, "blk": "y", "text": "dddd two"},
        {"eid": 6, "blk": "y", "text": "eeee three"},
    ]
    ds = rd.from_items(rows).map_batches(
        lambda t: pa.table({k: t[k] for k in ("eid", "blk", "text")}),
        batch_format="pyarrow",
    )

    # some pair admitted globally: block x must NOT fall back
    out = _collect(llm_resolve(
        ds, blocking_col="blk", id_col="eid",
        comparison_prompt="{{ input1.text }} vs {{ input2.text }}",
        client_factory=AlwaysMatch,
        blocking_conditions=['input1["text"][:4] == input2["text"][:4]'],
    ))
    canon = dict(zip(out["eid"].to_pylist(), out["_canonical"].to_pylist()))
    assert canon == {1: 1, 2: 2, 3: 3, 4: 4, 5: 4, 6: 6}

    # zero pairs admitted anywhere: the guard fires, every block
    # compares all of its pairs
    out2 = _collect(llm_resolve(
        ds, blocking_col="blk", id_col="eid",
        comparison_prompt="{{ input1.text }} vs {{ input2.text }}",
        client_factory=AlwaysMatch,
        blocking_conditions=['input1["text"][:9] == input2["text"][:9]'],
    ))
    canon2 = dict(zip(out2["eid"].to_pylist(), out2["_canonical"].to_pylist()))
    assert canon2 == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


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


def test_minhash_exact_builds_no_driver_sig_map(ray_session, monkeypatch):
    """verify="exact" must never collect the signature table to the
    driver — its est-prefilter routes signatures to the pairs with
    keyed-shuffle joins (r4 verdict item 3 removed the ~10M-doc ceiling
    from the exact path)."""
    import ray.data as rd

    import docetl_ray.stages.util_ray as util_ray
    from docetl_ray.stages.dedup import minhash_candidates

    real = util_ray.collect_small
    collected_cols = []

    def guard(ds, *a, **k):
        t = real(ds, *a, **k)
        collected_cols.append(list(t.column_names))
        assert "_sig" not in t.column_names, \
            "exact path materialized the signature table on the driver"
        return t

    monkeypatch.setattr(util_ray, "collect_small", guard)

    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank every single morning before breakfast")
    t = pa.table({
        "doc_id": list(range(6)),
        "text": [base, base + " today", base.replace("quick", "rapid"),
                 "completely unrelated content about database query engines",
                 "another distinct document covering distributed systems",
                 "yet another unique text on stream processing backpressure"],
    })
    ds = rd.from_arrow(t)
    out = _collect(minhash_candidates(ds, "text", "doc_id", threshold=0.6,
                                      verify="exact"))
    got = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert (0, 1) in got and (0, 2) in got
    # the sparse text fast path IS allowed to collect survivor pairs/texts
    assert collected_cols, "guard never exercised"

    # force the DENSE path (keyed-shuffle est-prefilter + text joins):
    # still no signature table on the driver
    out_dense = _collect(minhash_candidates(
        ds, "text", "doc_id", threshold=0.6, verify="exact",
        sparse_text_pairs=0,
    ))
    got_dense = set(zip(out_dense["id_a"].to_pylist(),
                        out_dense["id_b"].to_pylist()))
    assert (0, 1) in got_dense and (0, 2) in got_dense


def test_delta_auto_compaction_default_bounds_levels(tmp_path, ray_session):
    """apply_events defaults to compact_after="auto": level count stays
    <= AUTO_COMPACT_LEVELS + 1 across many delta epochs without any
    manual compact() call, and state still matches the replay oracle
    (r4 verdict item 6 — read-side level-merge cost stays bounded)."""
    import ray.data as rd

    from docetl_ray import synth
    from docetl_ray.cdc import LakeTable, apply_events, replay_oracle, read_state
    from docetl_ray.cdc.apply import AUTO_COMPACT_LEVELS
    from docetl_ray.util import collect

    table = LakeTable(str(tmp_path / "lake"), num_partitions=2)
    segs = [synth.events_table(i * 400, 400) for i in range(10)]
    for i, seg in enumerate(segs):
        apply_events(table, rd.from_arrow(seg), epoch=i, mode="delta")
        assert all(
            len(p) <= AUTO_COMPACT_LEVELS + 1
            for p in table.partition_map().values()
        ), f"epoch {i} exceeded the auto-compaction level bound"

    oracle = replay_oracle(pa.concat_tables(segs))
    engine = collect(read_state(table)).sort_by([("url", "ascending")])
    assert engine.num_rows == oracle.num_rows
    for c in ("url", "lsn", "text"):
        assert engine[c].to_pylist() == oracle[c].to_pylist(), c


def test_cluster_dendrogram_coarse_above_cap(ray_session):
    # 3000 rows in 3 well-separated 8-dim blobs, cap forced down to 500:
    # cluster_dendrogram must degrade to the coarse path (not raise) and
    # return a valid single hierarchy over every row.
    import numpy as np

    from docetl_ray.stages.cluster import cluster_dendrogram
    from docetl_ray.util import collect

    n = 3000
    i = np.arange(n)
    blob = (i % 3).astype(np.float64)
    base = np.zeros((n, 8))
    base[:, 0] = blob * 100.0
    jitter = ((i * 2654435761) % 997).astype(np.float64)[:, None] / 997.0
    emb = base + jitter
    ds = rd.from_arrow(pa.table({
        "vid": pa.array(i, pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float64())),
    }))
    out = collect(cluster_dendrogram(ds, "embedding", "vid",
                                     max_driver_rows=500))
    assert out.num_rows == n
    assert sorted(out["vid"].to_pylist()) == list(range(n))
    paths = dict(zip(out["vid"].to_pylist(), out["clusters"].to_pylist()))
    roots = {tuple(p[-1:]) for p in paths.values()}
    # nearest-first paths all end at the SAME top-tree root -> one tree
    assert len(roots) == 1 and next(iter(roots))[0].startswith("cluster_n")
    # ancestor-chain closure: every path suffix is itself a path some
    # internal node produced (tree validity, no dangling ancestors)
    suffixes = {tuple(p[k:]) for p in paths.values() for k in range(len(p))}
    assert all(tuple(p) in suffixes for p in paths.values())
    # blob separation survives the coarse hierarchy: two rows of the same
    # blob share a deeper common suffix than rows of different blobs
    p0, p1 = paths[0], paths[3]      # same blob (0 and 3 both blob 0)
    q = paths[1]                     # different blob
    def common_suffix(a, b):
        k = 0
        while k < min(len(a), len(b)) and a[-1 - k] == b[-1 - k]:
            k += 1
        return k
    assert common_suffix(p0, p1) >= common_suffix(p0, q)


def test_cluster_coarse_auto_clamps_num_cells(ray_session):
    """coarse='auto' past n > max_driver_rows^2/2 must clamp the auto
    cell count to the driver cap (cells grow, per-cell positional split
    bounds the in-task work) instead of raising the hard error the
    coarse path exists to avoid."""
    import numpy as np

    from docetl_ray.stages.cluster import cluster_dendrogram
    from docetl_ray.util import collect

    # cap=6 -> auto num_cells would be ceil(2*60/6)=20 > cap without
    # the clamp
    n = 60
    i = np.arange(n)
    emb = np.stack([(i % 4) * 50.0, (i * 7 % 13).astype(np.float64)], 1)
    ds = rd.from_arrow(pa.table({
        "vid": pa.array(i, pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float64())),
    }))
    out = collect(cluster_dendrogram(ds, "embedding", "vid",
                                     max_driver_rows=6))
    assert out.num_rows == n
    assert sorted(out["vid"].to_pylist()) == list(range(n))


def test_cluster_coarse_deterministic_across_block_layout(ray_session):
    """Coarse per-cell dendrograms sort by id before building, so the
    output paths must not depend on upstream block count / row order."""
    import numpy as np

    from docetl_ray.stages.cluster import cluster_dendrogram
    from docetl_ray.util import collect

    n = 1200
    i = np.arange(n)
    emb = np.stack([(i % 3) * 100.0 + (i * 31 % 17) / 17.0,
                    (i * 13 % 29).astype(np.float64)], 1)
    tbl = pa.table({
        "vid": pa.array(i, pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float64())),
    })
    perm = np.argsort((i * 2654435761) % (1 << 32))  # deterministic shuffle
    outs = []
    for t, nblocks in ((tbl, 4), (tbl.take(pa.array(perm)), 11)):
        ds = rd.from_arrow(t).repartition(nblocks)
        out = collect(cluster_dendrogram(ds, "embedding", "vid",
                                         max_driver_rows=300))
        outs.append(dict(zip(out["vid"].to_pylist(),
                             [tuple(p) for p in out["clusters"].to_pylist()])))
    assert outs[0] == outs[1]


def test_auto_pin_estimate_uses_parquet_column_share(ray_session, tmp_path):
    """A table DOMINATED by the quantile column must not be divided by
    the column count (that would undershoot by ncols x and wrongly pin
    past the threshold); the share comes from the parquet footer."""
    import numpy as np

    from docetl_ray.stages.quantiles import _auto_pin_size_estimate

    n = 4000
    vals = (np.arange(n * 64, dtype=np.float64) * 1.7).reshape(n, 64)
    dom = pa.table({
        "v": pa.array(list(vals), pa.list_(pa.float64())),
        **{f"k{i}": pa.array(np.arange(n, dtype=np.int64)) for i in range(7)},
    })
    path = str(tmp_path / "dom.parquet")
    pq.write_table(dom, path)
    ds = rd.read_parquet(path)
    est = _auto_pin_size_estimate(ds, "v")
    full = ds.size_bytes()
    assert est is not None and full is not None
    # "v" holds the overwhelming majority of the bytes; the equal-share
    # fallback would report full/8
    assert est > full // 2
    # and the narrow-column case still reports a small share
    est_k = _auto_pin_size_estimate(ds, "k0")
    assert est_k < full // 8


def test_minhash_exact_prefilter_tolerates_duplicate_ids(ray_session):
    """The broadcast exact-verify prefilter indexes signatures by id;
    duplicate id_col values must resolve last-wins (as the pre-round-5
    dict did), not raise InvalidIndexError from pd.Index.get_indexer."""
    from docetl_ray.stages.dedup import minhash_dedup
    from docetl_ray.util import collect

    rows = []
    for i in range(40):
        text = " ".join(f"tok{i}_{j}" for j in range(30))
        rows.append({"doc_id": i, "text": text})
        # near-duplicate pair to force candidate pairs through the
        # prefilter
        rows.append({"doc_id": i + 1000,
                     "text": text.replace("_29", "_29x")})
    # duplicated id value with identical text (LWW-equivalent)
    rows.append({"doc_id": 0, "text": rows[0]["text"]})
    ds = rd.from_pandas(pd.DataFrame(rows))
    kept, _labels = minhash_dedup(ds, "text", "doc_id", threshold=0.7,
                                  verify="exact")
    out = collect(kept)
    # every near-dup pair collapsed; no crash on the duplicate id
    assert out.num_rows <= 41


def test_metadata_free_schema_bounded_footer_scan(tmp_path):
    """Past 32 files the per-file footer check verifies a head+tail
    SAMPLE instead of O(files) — large pandas-written dirs (the 4x
    schema-dedup wall this helper fixes) still get the strip, and a
    schema divergence at either end still disables the force."""
    from docetl_ray.sources import _metadata_free_schema

    d = tmp_path / "many"
    d.mkdir()
    t = pa.Table.from_pandas(pd.DataFrame({"a": [1, 2]}))
    for i in range(40):
        pq.write_table(t, str(d / f"f{i:03d}.parquet"))
    s = _metadata_free_schema(str(d), None)
    assert s is not None and s.metadata is None   # large dir still strips
    # a divergent TAIL file (schema evolution) is caught by the sample
    t2 = pa.Table.from_pandas(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}))
    pq.write_table(t2, str(d / "f999.parquet"))
    assert _metadata_free_schema(str(d), None) is None
    # under 32 files the pandas-metadata strip applies with a full check
    few = tmp_path / "few"
    few.mkdir()
    for i in range(2):
        pq.write_table(t, str(few / f"f{i}.parquet"))
    s = _metadata_free_schema(str(few), None)
    assert s is not None and s.metadata is None


def test_tiered_compaction_keeps_base_and_bounds_write_cost(
        tmp_path, ray_session):
    """policy="tiered" (the auto-trigger default) folds only the delta
    levels, leaving the partition's largest run untouched — a trigger
    must not rewrite O(state) — while the state stays oracle-exact;
    once the folded middle run rivals the base, the fold goes full."""
    import ray.data as rd

    from docetl_ray import synth
    from docetl_ray.cdc import LakeTable, apply_events, read_state, replay_oracle
    from docetl_ray.cdc.apply import compact
    from docetl_ray.util import collect

    table = LakeTable(str(tmp_path / "lake"), num_partitions=2)
    # big bootstrap epoch = the base run, then small deltas
    segs = [synth.events_table(0, 3000)]
    apply_events(table, rd.from_arrow(segs[0]), epoch=0, mode="delta",
                 compact_after=None)
    base_paths = {pid: p[0] for pid, p in table.partition_map().items()}
    for e in range(1, 4):
        segs.append(synth.events_table(3000 + (e - 1) * 50, 50))
        apply_events(table, rd.from_arrow(segs[-1]), epoch=e, mode="delta",
                     compact_after=None)
    assert all(len(p) == 4 for p in table.partition_map().values())

    compact(table, tag="tier1", policy="tiered")
    pmap = table.partition_map()
    for pid, paths in pmap.items():
        assert len(paths) == 2, "tiered fold must leave [base, middle]"
        assert paths[0] == base_paths[pid], \
            "tiered fold rewrote the base run"
    oracle = replay_oracle(pa.concat_tables(segs))
    engine = collect(read_state(table)).sort_by([("url", "ascending")])
    assert engine["text"].to_pylist() == oracle["text"].to_pylist()

    # deltas that rival the base force the full fold
    segs.append(synth.events_table(4000, 3000))
    apply_events(table, rd.from_arrow(segs[-1]), epoch=9, mode="delta",
                 compact_after=None)
    compact(table, tag="tier2", policy="tiered")
    pmap2 = table.partition_map()
    assert all(len(p) == 1 for p in pmap2.values()), \
        "rivaling middle+deltas must fold fully"
    oracle2 = replay_oracle(pa.concat_tables(segs))
    engine2 = collect(read_state(table)).sort_by([("url", "ascending")])
    assert engine2["text"].to_pylist() == oracle2["text"].to_pylist()


def test_tiered_fold_checksum_and_live_rows_contract(tmp_path, ray_session):
    """Tiered folds must record a non-null newest-level checksum (the
    same multi-level contract delta commits use — deterministic per fold
    schedule, so cross-run audits stay sound) and a live_rows upper
    bound, without scanning the kept base run's columns."""
    import ray.data as rd

    from docetl_ray import synth
    from docetl_ray.cdc import LakeTable, apply_events, read_state
    from docetl_ray.cdc.apply import compact
    from docetl_ray.util import collect

    def build(root):
        table = LakeTable(root, num_partitions=2)
        apply_events(table, rd.from_arrow(synth.events_table(0, 2000)),
                     epoch=0, mode="delta", compact_after=None)
        for e in range(1, 3):
            apply_events(
                table, rd.from_arrow(synth.events_table(2000 + e * 40, 40)),
                epoch=e, mode="delta", compact_after=None)
        compact(table, tag="tier", policy="tiered")
        return table

    t1 = build(str(tmp_path / "lake1"))
    t2 = build(str(tmp_path / "lake2"))
    m1 = t1.manifest(refresh=True)["partitions"]
    m2 = t2.manifest(refresh=True)["partitions"]
    for pid, rec in m1.items():
        assert len(rec["paths"]) == 2, "expected a tiered [base, middle]"
        assert rec["checksum"], "tiered fold must not void the checksum"
        assert rec["checksum"] == m2[pid]["checksum"], \
            "identical histories+schedules must reproduce the checksum"
        assert rec["rows"] >= rec["live_rows"] >= 0
    live = collect(read_state(t1)).num_rows
    assert sum(r["live_rows"] for r in m1.values()) >= live, \
        "live_rows must upper-bound logical live rows"


def test_tombstone_gc_watermark_forces_full_fold(tmp_path, ray_session):
    """drop_tombstones_below_lsn with policy="tiered" must fold every
    level: GC'ing a tombstone in a partial fold would resurrect an
    older live row in an untouched level."""
    import ray.data as rd

    from docetl_ray import synth
    from docetl_ray.cdc import LakeTable, apply_events
    from docetl_ray.cdc.apply import compact

    table = LakeTable(str(tmp_path / "lake"), num_partitions=2)
    apply_events(table, rd.from_arrow(synth.events_table(0, 2000)),
                 epoch=0, mode="delta", compact_after=None)
    apply_events(table, rd.from_arrow(synth.events_table(2000, 100)),
                 epoch=1, mode="delta", compact_after=None)
    compact(table, tag="gc", policy="tiered",
            drop_tombstones_below_lsn=10**12)
    assert all(len(p) == 1 for p in table.partition_map().values())


def test_tiered_fold_across_schema_evolution(tmp_path, ray_session):
    """A tiered fold after column-add (v2) deltas leaves the v1 base run
    untouched on disk: the folded middle run carries the evolved schema
    while the kept base still has the old one, and merge-on-read must
    unify the two layouts back to the oracle state (rows last written by
    a v1 event read as null in the added columns)."""
    import os

    from docetl_ray import synth
    from docetl_ray.cdc import LakeTable, apply_events, read_state, replay_oracle
    from docetl_ray.cdc.apply import compact
    from docetl_ray.util import collect

    table = LakeTable(str(tmp_path / "lake"), num_partitions=2)
    segs = [synth.events_table(0, 3000, v2=False)]
    apply_events(table, rd.from_arrow(segs[0]), epoch=0, mode="delta",
                 compact_after=None)
    base_paths = {pid: p[0] for pid, p in table.partition_map().items()}
    for e in range(1, 4):
        segs.append(synth.events_table(3000 + (e - 1) * 80, 80, v2=True))
        apply_events(table, rd.from_arrow(segs[-1]), epoch=e, mode="delta",
                     compact_after=None)

    compact(table, tag="tier-evo", policy="tiered")
    pmap = table.partition_map()
    for pid, paths in pmap.items():
        assert len(paths) == 2 and paths[0] == base_paths[pid]
        base_schema = pq.read_schema(paths[0])
        mid_schema = pq.read_schema(paths[1])
        assert "fetch_status" not in base_schema.names, \
            "tiered fold must not rewrite the v1 base run"
        assert "fetch_status" in mid_schema.names

    oracle = replay_oracle(
        pa.concat_tables(segs, promote_options="permissive"))
    engine = collect(read_state(table)).sort_by([("url", "ascending")])
    assert engine["text"].to_pylist() == oracle["text"].to_pylist()
    assert "fetch_status" in engine.column_names
    eng_rows = engine.sort_by([("url", "ascending")]).to_pylist()
    v1_last = [r for r in eng_rows if r["lsn"] < 3000]
    assert v1_last and all(r["fetch_status"] is None for r in v1_last)
    v2_vals = {r["fetch_status"] for r in eng_rows if r["lsn"] >= 3000}
    assert v2_vals == {200}

    # one more v2 delta on top of [v1-base, v2-middle] still reads exact
    segs.append(synth.events_table(3240, 80, v2=True))
    apply_events(table, rd.from_arrow(segs[-1]), epoch=9, mode="delta",
                 compact_after=None)
    oracle2 = replay_oracle(
        pa.concat_tables(segs, promote_options="permissive"))
    engine2 = collect(read_state(table)).sort_by([("url", "ascending")])
    assert engine2["text"].to_pylist() == oracle2["text"].to_pylist()


def test_tiered_auto_fold_soak_and_full_transition(tmp_path, ray_session):
    """Soak the auto trigger against a big base + many small deltas: the
    trigger must fold tiered (base untouched, [base, middle] layout)
    while the folded middle is small, switch to a FULL fold once the
    middle+deltas rival half the base, keep levels bounded throughout,
    and stay oracle-exact at every step."""
    import ray.data as rd

    from docetl_ray import synth
    from docetl_ray.cdc import LakeTable, apply_events, read_state, replay_oracle
    from docetl_ray.cdc.apply import AUTO_COMPACT_LEVELS
    from docetl_ray.util import collect

    table = LakeTable(str(tmp_path / "lake"), num_partitions=2)
    segs = [synth.events_table(0, 4000)]
    apply_events(table, rd.from_arrow(segs[0]), epoch=0, mode="delta")
    saw_tiered = saw_full = False
    for e in range(1, 17):
        segs.append(synth.events_table(4000 + (e - 1) * 150, 150))
        apply_events(table, rd.from_arrow(segs[-1]), epoch=e, mode="delta")
        level_counts = {len(p) for p in table.partition_map().values()}
        assert max(level_counts) <= AUTO_COMPACT_LEVELS + 1, \
            f"epoch {e}: levels {level_counts} exceed the bound"
        if level_counts == {2}:
            saw_tiered = True
        if level_counts == {1} and e > 1:
            saw_full = True
    assert saw_tiered, "soak never exercised a tiered (partial) fold"
    assert saw_full, \
        "middle+deltas rivaling the base never escalated to a full fold"

    oracle = replay_oracle(pa.concat_tables(segs))
    engine = collect(read_state(table)).sort_by([("url", "ascending")])
    assert engine["text"].to_pylist() == oracle["text"].to_pylist()


def test_resplit_over_tiered_mixed_schema_layout(tmp_path, ray_session):
    """resplit must read through a tiered [v1-base, v2-middle, deltas]
    layout: the rewritten partitions carry the unified schema, collapse
    to one level each, and the state stays oracle-exact."""
    import ray.data as rd

    from docetl_ray import synth
    from docetl_ray.cdc import (
        LakeTable, apply_events, read_state, replay_oracle, resplit,
    )
    from docetl_ray.cdc.apply import compact
    from docetl_ray.util import collect

    table = LakeTable(str(tmp_path / "lake"), num_partitions=2)
    segs = [synth.events_table(0, 3000, v2=False)]
    apply_events(table, rd.from_arrow(segs[0]), epoch=0, mode="delta",
                 compact_after=None)
    for e in range(1, 3):
        segs.append(synth.events_table(3000 + (e - 1) * 80, 80, v2=True))
        apply_events(table, rd.from_arrow(segs[-1]), epoch=e, mode="delta",
                     compact_after=None)
    compact(table, tag="pre-resplit", policy="tiered")
    segs.append(synth.events_table(3160, 80, v2=True))
    apply_events(table, rd.from_arrow(segs[-1]), epoch=3, mode="delta",
                 compact_after=None)
    assert all(len(p) == 3 for p in table.partition_map().values())

    m = resplit(table, 4, tag="grow-4")
    assert table.num_partitions == 4
    assert all(len(p) == 1 for p in table.partition_map().values())
    oracle = replay_oracle(
        pa.concat_tables(segs, promote_options="permissive"))
    engine = collect(read_state(table)).sort_by([("url", "ascending")])
    assert engine["text"].to_pylist() == oracle["text"].to_pylist()
    assert "fetch_status" in engine.column_names


def test_tiered_fold_never_keeps_a_newer_level(tmp_path, ray_session):
    """A bulk delta that OUTGROWS the base must escalate to a full fold
    — keeping the (larger, newer) delta would break the manifest's
    oldest->newest path order and the newest-level checksum contract
    (table.py module docstring); the partial fold fires only while the
    oldest level dominates."""
    import ray.data as rd

    from docetl_ray import synth
    from docetl_ray.cdc import LakeTable, apply_events, read_state, replay_oracle
    from docetl_ray.cdc.apply import compact
    from docetl_ray.util import collect

    table = LakeTable(str(tmp_path / "lake"), num_partitions=2)
    # tiny bootstrap base, then a bulk delta far larger than it
    segs = [synth.events_table(0, 100)]
    apply_events(table, rd.from_arrow(segs[0]), epoch=0, mode="delta",
                 compact_after=None)
    segs.append(synth.events_table(100, 5000))
    apply_events(table, rd.from_arrow(segs[-1]), epoch=1, mode="delta",
                 compact_after=None)
    compact(table, tag="bulk", policy="tiered")
    assert all(len(p) == 1 for p in table.partition_map().values()), \
        "a delta outgrowing the base must trigger a FULL fold"
    oracle = replay_oracle(pa.concat_tables(segs))
    engine = collect(read_state(table)).sort_by([("url", "ascending")])
    assert engine["text"].to_pylist() == oracle["text"].to_pylist()


def test_cli_compact_after_parses_auto_none_int():
    """The CLI mirrors the library's compact_after="auto" default — an
    int-typed None default silently disabled auto-compaction for every
    CLI delta ingest; "none" restores manual compact().  Guards the
    PARSED namespace (not just the type fn), so reverting the default
    back to None fails here."""
    from docetl_ray.cli import _compact_after, build_parser

    assert _compact_after("auto") == "auto"
    assert _compact_after("none") is None
    assert _compact_after("3") == 3

    base = ["apply", "--wal", "w", "--table", "t", "--epoch", "0"]
    parse = build_parser().parse_args
    assert parse(base).compact_after == "auto"
    assert parse(base + ["--compact-after", "none"]).compact_after is None
    assert parse(base + ["--compact-after", "7"]).compact_after == 7


def test_minhash_pick_sigs_tolerates_null_ids(ray_session):
    """Null corpus ids on the exact-verify small-pair branch must be
    treated as non-members (parity with the pc.is_in filter the
    searchsorted rewrite replaced) — a None inside an object id array
    made np.searchsorted raise TypeError, failing the whole run."""
    import ray.data as rd

    from docetl_ray.stages.dedup import minhash_candidates

    texts = {
        "a": "the quick brown fox jumps over the lazy dog again today",
        "b": "the quick brown fox jumps over the lazy dog again now",
        "c": "completely unrelated text about arrow batches and ray data",
    }
    rows = [{"id": k, "text": v * 4} for k, v in texts.items()]
    rows.append({"id": None, "text": rows[0]["text"]})  # null id dupe
    ds = rd.from_items(rows)
    pairs = minhash_candidates(ds, "text", "id", threshold=0.5,
                               verify="exact")
    got = {tuple(sorted((r["id_a"], r["id_b"])))
           for r in pairs.take_all()}
    assert ("a", "b") in got
    assert all(None not in p for p in got)


def test_correctness_window_rotation_policy():
    """Every queries() entry must have a green driver row within the
    last two rounds: entries lacking a row in the newest CORRECTNESS
    artifact must sit inside the 50-entry window the driver checks."""
    import json
    import os

    import __ray_entry__ as entry

    names = list(entry.queries().keys())
    assert len(names) == len(set(names)), "duplicate query names"
    arts = sorted(
        f for f in os.listdir("/root/repo") if f.startswith("CORRECTNESS_r")
    )
    if not arts:
        pytest.skip("no driver correctness artifacts present")
    with open(os.path.join("/root/repo", arts[-1])) as f:
        latest = json.load(f)
    green = {k for k, v in latest.items()
             if isinstance(v, dict) and v.get("hash_match")}
    uncovered = [n for n in names if n not in green and n not in names[:50]]
    assert uncovered == [], (
        f"queries outside the 50-row driver window with no green row in "
        f"{arts[-1]}: {uncovered} — rotate them to the front of queries()")


def test_cluster_ops_tolerate_empty_input(ray_session):
    """An upstream filter that drops every row is routine — the cluster
    entry points must return the empty input, not crash in Arrow sort
    or dendrogram internals."""
    import ray.data as rd

    from docetl_ray.stages.cluster import (cluster_dendrogram,
                                           cluster_embeddings,
                                           cluster_threshold)

    empty = rd.from_items([{"id": 1, "emb": [0.0, 1.0]}]).filter(
        lambda r: False)
    assert cluster_dendrogram(empty, "emb", "id").count() == 0
    assert cluster_embeddings(empty, "emb", "id", num_clusters=2).count() == 0
    assert cluster_threshold(empty, "emb", "id",
                             distance_threshold=0.5).count() == 0


def test_kmeans_cells_tolerates_nan_embeddings(ray_session):
    """A NaN embedding cell must not corrupt the fixed-point centroid
    accumulators (NaN bypasses np.clip and casts to INT64_MIN)."""
    import numpy as np
    import ray.data as rd

    from docetl_ray.stages.cluster import kmeans_cells

    rows = [{"id": i, "emb": [float(i % 2) * 10, 1.0]} for i in range(40)]
    rows[7]["emb"] = [float("nan"), 1.0]
    cents, assigned = kmeans_cells(rd.from_items(rows), "emb", "id",
                                   num_cells=2, iters=4)
    assert np.isfinite(cents).all(), cents
    # NaN quantizes to 0 (not INT64_MIN, which put centroids at ~1e18/n
    # or wrapped the accumulator): the two blobs still separate cleanly
    xs = sorted(c[0] for c in cents)
    assert xs[0] < 2.0 and xs[-1] > 8.0, cents
    assert assigned.count() == 40
    # an inf cell saturates at the documented clip (bounded skew, no
    # wrap): centroids stay finite and physically bounded
    rows[23]["emb"] = [float("nan"), float("inf")]
    cents2, assigned2 = kmeans_cells(rd.from_items(rows), "emb", "id",
                                     num_cells=2, iters=4)
    assert np.isfinite(cents2).all(), cents2
    assert np.abs(cents2).max() < 1e7, cents2
    assert assigned2.count() == 40
