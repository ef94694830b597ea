"""Fuzzy (similarity) join: the deterministic recast of docetl's
LLM-verified ``equijoin`` (SURVEY.md §2.1; reference
``/root/reference/docetl/operations/equijoin.py``).

The reference blocks candidate pairs (embedding cosine / eval'd
conditions, ``equijoin.py:253-406``) and has an LLM confirm each pair;
here blocking is MinHash-LSH over the join-text columns (same banding
machinery as ``stages/dedup.py``) and confirmation is exact n-gram
Jaccard ≥ threshold — deterministic and scalable:

    left + right (side-tagged)
      -> minhash bands per row      (map, vectorized)
      -> ONE groupby on band bucket -> cross-side candidate pairs
      -> texts routed TO the pairs by two keyed-shuffle hash joins
         (never a whole-side broadcast — scales to corpora far larger
         than driver memory)
      -> exact-Jaccard verify + per-side match ``limits``

Per-side ``limits`` mirror ``equijoin.py:474-489`` (cap matches per
left/right row, keeping the highest-similarity pairs deterministically).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import (
    _band_buckets_vec,
    _perm_params,
    jaccard_ngram,
    minhash_signatures_batch,
)


def fuzzy_join(
    left,
    right,
    *,
    left_text: str,
    right_text: str,
    left_id: str,
    right_id: str,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    limits: tuple[int | None, int | None] = (None, None),
    left_schema=None,
    right_schema=None,
    prefilter: bool = False,
    sparse_text_pairs: int = 100_000,
):
    """Similarity join; returns Dataset of
    ``(left_id, right_id, jaccard)`` pairs with exact n-gram Jaccard >=
    threshold.  Join payload columns back with ``broadcast_join`` /
    ``hash_join`` on the id columns.

    ``left_schema`` / ``right_schema``: optional input wire schemas; when
    given (or lazily inferable) the internal text-routing hash joins
    stream instead of materializing their inputs.

    ``sparse_text_pairs``: when the deduped candidate count fits under
    it, the needed texts are fetched with one map-only ``is_in`` pass
    per side and broadcast for verification instead of two keyed-shuffle
    text joins (measured 6.5 -> 4.6 s on the sf0.1 bench query).  The
    bound is DRIVER memory: ~2x pairs texts are collected once, so the
    default (100k) assumes ~KB texts; lower it for big documents.
    ``prefilter=True`` adds an est-Jaccard pass (two extra signature
    scans) that kills ~99% of band-collision candidates BEFORE the pair
    aggregate — a net loss at fixture scale but the right trade when
    candidate volume explodes (boilerplate-heavy web corpora), since it
    shrinks both the aggregate shuffle and the pair table below any
    sparse threshold."""
    from .reduces import grouped_aggregate

    rows_per_band = num_perm // bands
    a, b = _perm_params(num_perm)

    def bander(text_col, id_col, side):
        def fn(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"bucket": pa.array([], pa.int64()), "rid": batch[id_col],
                     "side": pa.array([], pa.string())}
                )
            sigs = minhash_signatures_batch(
                batch[text_col].to_pylist(), a, b, shingle_k
            ).astype(np.int64)
            # vectorized FNV band hash (see dedup._band_buckets_vec) —
            # replaces the per-(doc, band) crc32 Python loop
            bucket, ids_rep = _band_buckets_vec(
                sigs, batch[id_col], bands, rows_per_band
            )
            return pa.table(
                {
                    "bucket": bucket,
                    "rid": ids_rep,
                    "side": pa.array([side] * len(bucket), pa.string()),
                }
            )

        fn.__name__ = f"bands_{side}"
        return fn

    lb = left.map_batches(bander(left_text, left_id, "l"), batch_format="pyarrow")
    rb = right.map_batches(bander(right_text, right_id, "r"), batch_format="pyarrow")

    def cross_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # FULLY vectorized cross products across every bucket in the
        # partition at once: dedup (bucket, side, rid), count l/r per
        # bucket, then index arithmetic generates all pairs with zero
        # per-bucket Python (a pandas-groupby iteration over ~80k LSH
        # buckets cost ~2.5 s per run before this)
        rid_dtype = group["rid"].dtype
        empty = pd.DataFrame(
            {"lid": pd.Series([], dtype=rid_dtype),
             "rid_": pd.Series([], dtype=rid_dtype)}
        )
        g = group.drop_duplicates(subset=["bucket", "side", "rid"])
        lmask = (g["side"] == "l").to_numpy()
        l = g[lmask].sort_values(["bucket", "rid"], kind="mergesort")
        r = g[~lmask].sort_values(["bucket", "rid"], kind="mergesort")
        if not len(l) or not len(r):
            return empty
        lb_arr = l["bucket"].to_numpy()
        rb_arr = r["bucket"].to_numpy()
        lv = l["rid"].to_numpy()
        rv = r["rid"].to_numpy()
        # per-bucket runs on each side
        lu, l_start, l_cnt = np.unique(lb_arr, return_index=True, return_counts=True)
        ru, r_start, r_cnt = np.unique(rb_arr, return_index=True, return_counts=True)
        common, li, ri = np.intersect1d(lu, ru, assume_unique=True,
                                        return_indices=True)
        if len(common) == 0:
            return empty
        nl, nr = l_cnt[li], r_cnt[ri]
        ls, rs = l_start[li], r_start[ri]
        # degenerate-bucket guard: a band bucket with a huge cross product
        # (boilerplate collisions) is clamped to the first _BUCKET_CAP
        # id-ordered members per side — bounded pair volume, mirroring the
        # reference's comparison caps (equijoin.py:549-603); dropped
        # volume is logged.  Genuine matches in real corpora concentrate
        # in small buckets; giant ones are low-information collisions.
        from .dedup import _BUCKET_CAP

        big = (nl.astype(np.int64) * nr.astype(np.int64)) > _BUCKET_CAP * _BUCKET_CAP
        if big.any():
            import logging

            logging.getLogger("docetl_ray.dedup").warning(
                "capped %d degenerate fuzzy-join bucket(s) (> %d^2 pairs) "
                "to %d members per side", int(big.sum()), _BUCKET_CAP, _BUCKET_CAP,
            )
            nl = np.where(big, np.minimum(nl, _BUCKET_CAP), nl)
            nr = np.where(big, np.minimum(nr, _BUCKET_CAP), nr)
        per_bucket = nl * nr
        total = int(per_bucket.sum())
        # pair index arithmetic: within-bucket pair p -> (p // nr, p % nr)
        pb = np.repeat(np.arange(len(common)), per_bucket)
        offs = np.concatenate(([0], np.cumsum(per_bucket)[:-1]))
        within = np.arange(total) - offs[pb]
        lid = lv[ls[pb] + within // nr[pb]]
        rid = rv[rs[pb] + within % nr[pb]]
        return pd.DataFrame({"lid": lid, "rid_": rid})

    # partition by hash(bucket), not per distinct bucket: per-bucket
    # map_groups pays ~ms task/pandas overhead per LSH bucket and there
    # are ~docs x bands buckets; partitioned_map co-locates whole
    # buckets through the take()-based exchange and cross_pairs runs
    # vectorized across them inside the task
    from .grouped import partitioned_map

    cand = partitioned_map(lb.union(rb), "bucket", cross_pairs,
                           num_partitions=32)
    # est-Jaccard prefilter BEFORE the pair aggregate (the same 0.25
    # margin as the minhash exact path — ≥4 sigma of the 64-perm
    # estimator at any threshold ≥ 0.5, and DETERMINISTIC: signatures
    # are a fixed function of the texts, so a pair's verdict never
    # varies run-to-run): band-collision pairs nowhere near the
    # threshold die here instead of paying the aggregate + text joins.
    # The side signature maps broadcast through one ray.put (bounded
    # ~10M total rows at 64 perms, the minhash broadcast ceiling).
    pre_thr = max(0.0, threshold - 0.25)
    if prefilter and pre_thr > 0:
        import ray

        from .dedup import _broadcast_sig_cache
        from .util_ray import collect_small as _cs

        def _sig_side(ds_side, text_col, id_col, tag):
            def fn(batch: pa.Table) -> pa.Table:
                sigs = minhash_signatures_batch(
                    batch[text_col].to_pylist(), a, b, shingle_k
                ).astype(np.int64)
                flat = pa.array(sigs.reshape(-1), pa.int64())
                col = pa.FixedSizeListArray.from_arrays(flat, num_perm).cast(
                    pa.list_(pa.int64())
                )
                return pa.table({"_id": batch[id_col], "_sig": col})

            fn.__name__ = f"fuzzy_sig_{tag}"
            return _cs(ds_side.map_batches(fn, batch_format="pyarrow"))

        lsig = _sig_side(left, left_text, left_id, "l")
        rsig = _sig_side(right, right_text, right_id, "r")
        sig_map = {
            ("l", i): np.asarray(s, np.int64)
            for i, s in zip(lsig["_id"].to_pylist(), lsig["_sig"].to_pylist())
        }
        sig_map.update({
            ("r", i): np.asarray(s, np.int64)
            for i, s in zip(rsig["_id"].to_pylist(), rsig["_sig"].to_pylist())
        })
        sref = ray.put(sig_map)

        def pre(batch: pa.Table) -> pa.Table:
            sigs = _broadcast_sig_cache(sref)
            la = batch["lid"].to_pylist()
            if not la:
                return batch
            sa = np.stack([sigs[("l", x)] for x in la])
            sb = np.stack([sigs[("r", y)] for y in batch["rid_"].to_pylist()])
            est = (sa == sb).mean(axis=1)
            return batch.filter(pa.array(est >= pre_thr))

        pre.__name__ = "fuzzy_join_prefilter"
        cand = cand.map_batches(pre, batch_format="pyarrow")

    uniq = grouped_aggregate(
        cand.map_batches(
            lambda t: t.append_column("_one", pa.array([1] * t.num_rows, pa.int8())),
            batch_format="pyarrow",
        ),
        ["lid", "rid_"],
        [("_one", "count", "_n")],
    )
    # pair table is bounded by the (prefiltered) candidate count —
    # materializing it lets the sparse/dense decision read the count for
    # free and the dense joins reuse it
    uniq = uniq.materialize()
    n_pairs = uniq.count()

    rid_out = right_id if right_id != left_id else f"{right_id}_right"

    from .dedup import shingles

    if n_pairs == 0:
        import ray.data as rd

        from .joins import _ds_arrow_schema_lazy

        ls_ = left_schema or _ds_arrow_schema_lazy(left)
        rs_ = right_schema or _ds_arrow_schema_lazy(right)
        lidt = ls_.field(left_id).type if ls_ is not None else pa.int64()
        ridt = rs_.field(right_id).type if rs_ is not None else pa.int64()
        return rd.from_arrow(pa.schema(
            [(left_id, lidt), (rid_out, ridt), ("jaccard", pa.float64())]
        ).empty_table())

    if n_pairs <= sparse_text_pairs:
        # SPARSE fast path (same shape as the minhash exact verify): few
        # enough surviving pairs that their texts fit a broadcast — one
        # map-only ``is_in`` pass per side fetches exactly the needed
        # texts, the verify runs over the pair table with dict lookups,
        # and both keyed-shuffle text joins are skipped.
        import ray

        from .dedup import _broadcast_sig_cache
        from .util_ray import collect_small as _cs

        pt = _cs(uniq)
        need_l = pa.array(sorted(set(pt["lid"].to_pylist())))
        need_r = pa.array(sorted(set(pt["rid_"].to_pylist())))

        def pick(ds_side, id_col, text_col, need, tag):
            def fn(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                t = batch.filter(pc.is_in(batch[id_col], value_set=need))
                return pa.table({"_pid": t[id_col], "_ptxt": t[text_col]})

            fn.__name__ = f"fuzzy_pick_{tag}"
            return _cs(ds_side.map_batches(fn, batch_format="pyarrow"))

        lsmall = pick(left, left_id, left_text, need_l, "l")
        rsmall = pick(right, right_id, right_text, need_r, "r")
        tmap = {("l", i): t for i, t in zip(lsmall["_pid"].to_pylist(),
                                            lsmall["_ptxt"].to_pylist())}
        tmap.update({("r", i): t for i, t in zip(rsmall["_pid"].to_pylist(),
                                                 rsmall["_ptxt"].to_pylist())})
        tref = ray.put(tmap)

        def verify_sparse(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            texts = _broadcast_sig_cache(tref)
            cache: dict = {}

            def sh(key):
                s = cache.get(key)
                if s is None:
                    s = set(shingles(texts.get(key) or "", shingle_k).tolist())
                    cache[key] = s
                return s

            jac = []
            for lid_v, rid_v in zip(batch["lid"].to_pylist(),
                                    batch["rid_"].to_pylist()):
                sa, sb = sh(("l", lid_v)), sh(("r", rid_v))
                if not sa and not sb:
                    jac.append(1.0)
                    continue
                inter = len(sa & sb)
                jac.append(inter / (len(sa) + len(sb) - inter))
            out = pa.table(
                {left_id: batch["lid"], rid_out: batch["rid_"],
                 "jaccard": pa.array(jac, pa.float64())}
            )
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

        verify_sparse.__name__ = "fuzzy_verify_sparse"
        pairs = uniq.map_batches(verify_sparse, batch_format="pyarrow")
        return _fuzzy_apply_limits(pairs, left_id, rid_out, limits)

    # Route each side's text TO its candidate pairs with a keyed-shuffle
    # hash join (pairs are sparse; texts ship through the exchange once
    # per side — no whole-corpus driver materialization or broadcast).
    from .joins import _ds_arrow_schema_lazy, hash_join

    def _proj(ds_side, id_col, text_col, id_out, text_out):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({id_out: batch[id_col], text_out: batch[text_col]})

        fn.__name__ = f"project_{id_out}"
        return ds_side.map_batches(fn, batch_format="pyarrow")

    lt = _proj(left, left_id, left_text, "_jl_id", "_jl_text")
    rt = _proj(right, right_id, right_text, "_jr_id", "_jr_text")

    # wire schemas: stream the (lazy) pair pipeline + text projections
    # through the joins when the side schemas are known (caller-supplied
    # or metadata-only inferable); else hash_join falls back to
    # materialize-for-schema on that side only
    ls = left_schema or _ds_arrow_schema_lazy(left)
    rs = right_schema or _ds_arrow_schema_lazy(right)
    jk = {}
    if ls is not None and rs is not None:
        lidt = ls.field(left_id).type
        ridt = rs.field(right_id).type
        pair_schema = pa.schema(
            [("lid", lidt), ("rid_", ridt), ("_n", pa.int64())]
        )
        jk = {
            "left_schema": pair_schema,
            "right_schema": pa.schema(
                [("_jl_id", lidt), ("_jl_text", ls.field(left_text).type)]
            ),
        }
    with_l = hash_join(uniq, lt, on="lid", right_on="_jl_id", **jk)
    jk2 = {}
    if ls is not None and rs is not None:
        jk2 = {
            "left_schema": pa.schema(
                list(pair_schema)
                + [pa.field("_jl_id", lidt),
                   pa.field("_jl_text", ls.field(left_text).type)]
            ),
            "right_schema": pa.schema(
                [("_jr_id", ridt), ("_jr_text", rs.field(right_text).type)]
            ),
        }
    with_lr = hash_join(with_l, rt, on="rid_", right_on="_jr_id", **jk2)

    def verify(batch: pa.Table) -> pa.Table:
        # shingle each distinct doc ONCE per batch (hot docs appear in
        # many candidate pairs; re-shingling per pair dominated)
        cache: dict[int, set] = {}

        def sh(rid, text):
            s = cache.get(rid)
            if s is None:
                s = set(shingles(text or "", shingle_k).tolist())
                cache[rid] = s
            return s

        jac = []
        for lid_v, rid_v, a, b in zip(
            batch["lid"].to_pylist(), batch["rid_"].to_pylist(),
            batch["_jl_text"].to_pylist(), batch["_jr_text"].to_pylist(),
        ):
            sa, sb = sh(("l", lid_v), a), sh(("r", rid_v), b)
            if not sa and not sb:
                jac.append(1.0)
                continue
            inter = len(sa & sb)
            jac.append(inter / (len(sa) + len(sb) - inter))
        out = pa.table(
            {
                left_id: batch["lid"],
                rid_out: batch["rid_"],
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        import pyarrow.compute as pc

        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    verify.__name__ = "fuzzy_verify"
    pairs = with_lr.map_batches(verify, batch_format="pyarrow")
    return _fuzzy_apply_limits(pairs, left_id, rid_out, limits)


def _fuzzy_apply_limits(pairs, left_id: str, rid_col: str, limits):
    """Per-side match caps, highest-jaccard-first deterministic
    (``equijoin.py:474-489``)."""
    lim_l, lim_r = limits
    if lim_l is None and lim_r is None:
        return pairs

    from .grouped import partitioned_map

    def cap(key: str, other: str, n: int):
        # vectorized across every key in the partition: global sort once,
        # then pandas' C-level groupby().head — join ids are
        # high-cardinality, so per-key fn calls are the wrong altitude
        def capper(group: pd.DataFrame) -> pd.DataFrame:
            return (
                group.sort_values(["jaccard", other],
                                  ascending=[False, True], kind="mergesort")
                .groupby(key, sort=False).head(n)
            )

        capper.__name__ = f"cap_{key}"
        return capper

    if lim_l is not None:
        pairs = partitioned_map(pairs, left_id, cap(left_id, rid_col, lim_l))
    if lim_r is not None:
        pairs = partitioned_map(pairs, rid_col, cap(rid_col, left_id, lim_r))
    return pairs


def embedding_blocked_join(
    left,
    right,
    *,
    left_emb: str,
    right_emb: str,
    left_id: str,
    right_id: str,
    blocking_threshold: float,
    num_planes: int = 8,
    probe_flips: int = 1,
    limit_comparisons: int | None = None,
    seed: int = 11,
    num_partitions: int = 32,
):
    """Embedding-blocked join candidates: the reference equijoin's
    embedding blocking phase (``/root/reference/docetl/operations/
    equijoin.py:300-406`` — embed both sides, keep pairs with cosine >=
    ``blocking_threshold``) recast shuffle-consciously:

    - both sides are bucketed by md5-integer-plane sign codes over
      4096-quantized embeddings (``util_ray.md5_int_planes`` /
      ``quantized_lsh_codes`` — exact integer arithmetic, so a SQL oracle
      recomputes the buckets bit-for-bit); the right side also lands in
      every code within ``probe_flips`` bit flips, so a cross-side pair
      surfaces iff ``hamming(code_l, code_r) <= probe_flips``,
    - exact cosine within co-bucketed cross-side pairs (vectorized
      matmul per bucket),
    - ``limit_comparisons``: deterministic stratified cap mirroring the
      reference's ``stratified_length_sample`` (``equijoin.py:549-603``):
      stratify by the smaller-cardinality side and round-robin the BEST
      pairs per stratum (cosine here stands in for the reference's
      token-length priority — no tokenizer dependency, same
      stratified round-robin shape).

    Returns ``(left_id, right_id)`` pairs (ids only — downstream
    verification/LLM compare attaches payloads by id).
    """
    from .grouped import grouped_map
    from .util_ray import md5_int_planes, quantized_lsh_codes

    dim = len(left.take(1)[0][left_emb])
    planes = md5_int_planes(num_planes, dim, tag=f"emb{seed}")

    def bucketer(emb_col, id_col, side, probe: bool):
        def fn(batch: pa.Table) -> pa.Table:
            embs = np.asarray(batch[emb_col].to_pylist(), dtype=np.float64)
            codes = quantized_lsh_codes(embs, planes)
            ids = batch[id_col]
            bks, out_idx = [], []
            for i, c in enumerate(codes.tolist()):
                bks.append(c)
                out_idx.append(i)
                if probe and probe_flips >= 1:
                    for b in range(num_planes):
                        bks.append(c ^ (1 << b))
                        out_idx.append(i)
            emb_list = batch[emb_col].take(pa.array(out_idx))
            return pa.table(
                {
                    "bucket": pa.array(bks, pa.int64()),
                    "rid": ids.take(pa.array(out_idx)),
                    "side": pa.array([side] * len(bks), pa.string()),
                    "emb": emb_list,
                }
            )

        fn.__name__ = f"ebucket_{side}"
        return fn

    lb = left.map_batches(bucketer(left_emb, left_id, "l", False),
                          batch_format="pyarrow")
    rb = right.map_batches(bucketer(right_emb, right_id, "r", True),
                           batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        lm = (g["side"] == "l").to_numpy()
        lg = g[lm].drop_duplicates(subset=["rid"]).sort_values("rid", kind="mergesort")
        rg = g[~lm].drop_duplicates(subset=["rid"]).sort_values("rid", kind="mergesort")
        if not len(lg) or not len(rg):
            return pd.DataFrame({"lid": [], "rid_": [], "cosine": []})
        ml = np.asarray([np.asarray(e, dtype=np.float64) for e in lg["emb"]])
        mr = np.asarray([np.asarray(e, dtype=np.float64) for e in rg["emb"]])
        for m in (ml, mr):
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            m /= n[:, None]
        sim = ml @ mr.T
        xs, ys = np.where(sim >= blocking_threshold)
        return pd.DataFrame(
            {
                "lid": lg["rid"].to_numpy()[xs],
                "rid_": rg["rid"].to_numpy()[ys],
                "cosine": sim[xs, ys],
            }
        )

    pairs.__name__ = "embedding_block_pairs"
    cand = grouped_map(lb.union(rb), "bucket", pairs,
                       num_partitions=num_partitions)

    # probe buckets overlap -> same pair can surface several times
    from .reduces import grouped_aggregate

    uniq = grouped_aggregate(cand, ["lid", "rid_"], [("cosine", "max", "cosine")])

    if limit_comparisons is None:
        def ids_only(t: pa.Table) -> pa.Table:
            return pa.table({left_id: t["lid"], right_id: t["rid_"]})

        ids_only.__name__ = "pairs_ids"
        return uniq.map_batches(ids_only, batch_format="pyarrow")

    # stratified deterministic cap (equijoin.py:549-603 recast): group by
    # the smaller-cardinality side, order each stratum best-first, take
    # round-robin across strata until the cap fills.  Pairs are sparse
    # post-blocking, so the cap runs on the driver like the reference.
    from .util_ray import collect_small

    t = collect_small(uniq)
    df = t.to_pandas()
    n_l, n_r = df["lid"].nunique(), df["rid_"].nunique()
    key = "lid" if n_l <= n_r else "rid_"
    df = df.sort_values(["cosine", "lid", "rid_"],
                        ascending=[False, True, True], kind="mergesort")
    df["_rr"] = df.groupby(key, sort=False).cumcount()
    capped = df.sort_values(["_rr", "cosine"], ascending=[True, False],
                            kind="mergesort").head(limit_comparisons)
    capped = capped.sort_values(["lid", "rid_"], kind="mergesort")
    import ray.data as rd

    return rd.from_arrow(
        pa.table({left_id: pa.array(capped["lid"].to_numpy()),
                  right_id: pa.array(capped["rid_"].to_numpy())})
    )


def condition_blocked_pairs(
    left,
    right,
    conditions: list[str],
    *,
    left_id: str,
    right_id: str,
):
    """Candidate ``(left_id, right_id)`` pairs where ANY eval'd pair
    predicate holds — the reference equijoin's ``blocking_conditions``
    surface (``/root/reference/docetl/operations/equijoin.py:38-43``:
    ``eval(condition, {"left": item1, "right": item2})``), recast with
    ``_safe_eval`` (no builtins) instead of bare ``eval``.

    Physical shape: the right side is collected once and broadcast
    (``ray.put`` + per-worker cache); each left batch evaluates the
    predicates against every right row — O(|L|x|R|) predicate evals,
    exactly the reference's cost (its multiprocessing starmap over the
    cross product), but distributed over left blocks with no shuffle.
    This is inherently a small-side blocking strategy: at scale use LSH
    (``minhash_candidates``) or ``embedding_blocked_join`` and reserve
    predicates for the compare stage."""
    import ray

    from .joins import _broadcast_cache_get
    from .llm import _safe_eval
    from .util_ray import collect_small

    if left_id == right_id:
        raise ValueError(
            "condition_blocked_pairs needs distinct left_id/right_id "
            "column names (rename one side first)"
        )
    rt = collect_small(right)
    right_rows = rt.to_pylist()
    rref = ray.put(right_rows)
    rid_type = rt.schema.field(right_id).type  # type only — never close
    del rt, right  # over the table (it would ship with every task)

    def block(batch: pa.Table) -> pa.Table:
        rrows = _broadcast_cache_get(rref)
        out_l, out_r = [], []
        for lrow in batch.to_pylist():
            for rrow in rrows:
                if any(
                    _safe_eval(c, {"left": lrow, "right": rrow})
                    for c in conditions
                ):
                    out_l.append(lrow[left_id])
                    out_r.append(rrow[right_id])
        lt = batch.schema.field(left_id).type
        return pa.table(
            {left_id: pa.array(out_l, lt), right_id: pa.array(out_r, rid_type)}
        )

    block.__name__ = "condition_block"
    return left.map_batches(block, batch_format="pyarrow")


def llm_equijoin(
    left,
    right,
    blocked_pairs,
    *,
    left_id: str,
    right_id: str,
    comparison_prompt: str,
    client_factory=None,
    limits: tuple[int | None, int | None] = (None, None),
):
    """LLM-verified equijoin over a blocked candidate set — the compare +
    merge phase of the reference equijoin
    (``/root/reference/docetl/operations/equijoin.py:440-509``):

    - ``blocked_pairs``: Dataset of ``(left_id, right_id)`` candidates
      (from ``embedding_blocked_join``, ``fuzzy_join`` pairs, or a code
      blocking stage),
    - both sides' full rows are routed TO the pairs with keyed-shuffle
      hash joins (never a whole-side broadcast),
    - ``comparison_prompt`` rendered with ``input1``/``input2`` per pair;
      the pluggable client returns ``{"is_match": bool}`` — distributed,
      stateless tasks,
    - matched rows merge with the reference's collision suffixing
      (``{k}_left`` / ``{k}_right`` when a key exists on both sides,
      ``equijoin.py:480-483``),
    - per-side match ``limits`` (``equijoin.py:474-478``) are enforced on
      the (sparse) match set in deterministic ``(left_id, right_id)``
      order — the reference caps in completion order, which is
      thread-timing dependent; sorted order is the reproducible recast.
    """
    from .joins import _ds_arrow_schema_lazy, hash_join
    from .llm import FakeDeterministicClient, render_prompt
    from .util_ray import collect_small

    def proj(ds_side, prefix):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([f"{prefix}{c}" for c in batch.column_names])

        fn.__name__ = f"proj{prefix}"
        return ds_side.map_batches(fn, batch_format="pyarrow")

    lp = proj(left, "_l_")
    rp = proj(right, "_r_")
    with_l = hash_join(blocked_pairs, lp, on=left_id, right_on=f"_l_{left_id}")
    with_lr = hash_join(with_l, rp, on=right_id, right_on=f"_r_{right_id}")

    def compare(batch: pa.Table) -> pa.Table:
        client = (client_factory or FakeDeterministicClient)()
        lcols = [c for c in batch.column_names if c.startswith("_l_")]
        rcols = [c for c in batch.column_names if c.startswith("_r_")]
        keep = []
        for row in batch.to_pylist():
            input1 = {c[3:]: row[c] for c in lcols}
            input2 = {c[3:]: row[c] for c in rcols}
            rendered = render_prompt(
                comparison_prompt, {"input1": input1, "input2": input2}
            )
            keep.append(
                bool(client.complete(rendered, {"is_match": "bool"}).get("is_match"))
            )
        return batch.filter(pa.array(keep, pa.bool_()))

    compare.__name__ = "llm_equijoin_compare"
    matches = with_lr.map_batches(compare, batch_format="pyarrow")

    def merge_names(t: pa.Table) -> pa.Table:
        # keep only the side-prefixed columns (the pairs' own key columns
        # duplicate _l_/_r_ ids), then apply the reference's collision
        # suffixing: shared keys -> {k}_left / {k}_right, else bare k
        t = t.select([c for c in t.column_names if c.startswith(("_l_", "_r_"))])
        lnames = {c[3:] for c in t.column_names if c.startswith("_l_")}
        rnames = {c[3:] for c in t.column_names if c.startswith("_r_")}
        out_names = []
        for c in t.column_names:
            k = c[3:]
            if c.startswith("_l_"):
                out_names.append(f"{k}_left" if k in rnames else k)
            else:
                out_names.append(f"{k}_right" if k in lnames else k)
        return t.rename_columns(out_names)

    lim_l, lim_r = limits
    if lim_l is None and lim_r is None:
        out = matches.map_batches(merge_names, batch_format="pyarrow")
        return out

    # caps need global per-key match counts; matches are sparse
    # post-compare, so the cap runs on the driver like the reference
    t = collect_small(matches)
    if t.num_rows == 0:
        import ray.data as rd

        return rd.from_arrow(merge_names(t)) if t.num_columns else rd.from_arrow(t)
    t = t.sort_by([(f"_l_{left_id}", "ascending"), (f"_r_{right_id}", "ascending")])
    from collections import defaultdict

    lcount: dict = defaultdict(int)
    rcount: dict = defaultdict(int)
    keep = []
    lids = t[f"_l_{left_id}"].to_pylist()
    rids = t[f"_r_{right_id}"].to_pylist()
    for lv, rv in zip(lids, rids):
        ok = (lim_l is None or lcount[lv] < lim_l) and (
            lim_r is None or rcount[rv] < lim_r
        )
        keep.append(ok)
        if ok:
            lcount[lv] += 1
            rcount[rv] += 1
    import ray.data as rd

    return rd.from_arrow(merge_names(t.filter(pa.array(keep, pa.bool_()))))
