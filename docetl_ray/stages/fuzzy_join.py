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

from .dedup import _perm_params, jaccard_ngram, minhash_signatures_batch


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
):
    """Similarity join; returns Dataset of
    ``(left_id, right_id, jaccard)`` pairs with exact n-gram Jaccard >=
    threshold.  Join payload columns back with ``broadcast_join`` /
    ``hash_join`` on the id columns."""
    from .reduces import grouped_aggregate

    rows_per_band = num_perm // bands
    a, b = _perm_params(num_perm)

    def bander(text_col, id_col, side):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_pylist()
            sigs = minhash_signatures_batch(
                batch[text_col].to_pylist(), a, b, shingle_k
            ).astype(np.int64)
            out_bucket, out_id = [], []
            for i, sig in zip(ids, sigs):
                for bi in range(bands):
                    chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                    out_bucket.append((bi << 32) | zlib.crc32(chunk.tobytes()))
                    out_id.append(i)
            n = len(out_id)
            return pa.table(
                {
                    "bucket": pa.array(out_bucket, pa.int64()),
                    "rid": pa.array(out_id),
                    "side": pa.array([side] * n, pa.string()),
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
        per_bucket = nl * nr
        total = int(per_bucket.sum())
        # pair index arithmetic: within-bucket pair p -> (p // nr, p % nr)
        pb = np.repeat(np.arange(len(common)), per_bucket)
        offs = np.concatenate(([0], np.cumsum(per_bucket)[:-1]))
        within = np.arange(total) - offs[pb]
        lid = lv[ls[pb] + within // nr[pb]]
        rid = rv[rs[pb] + within % nr[pb]]
        return pd.DataFrame({"lid": lid, "rid_": rid})

    # group by a PARTITION of buckets (bucket % P), not per distinct
    # bucket: per-bucket map_groups pays ~ms task/pandas overhead per LSH
    # bucket and there are ~docs x bands buckets; whole buckets stay
    # co-located and cross_pairs iterates them with pandas' C groupby
    def add_part(batch: pa.Table) -> pa.Table:
        part = (batch["bucket"].to_numpy(zero_copy_only=False) % 32).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    cand = (
        lb.union(rb)
        .map_batches(add_part, batch_format="pyarrow")
        .repartition(32)
        .groupby("part", num_partitions=32)
        .map_groups(cross_pairs, batch_format="pandas")
    )
    uniq = grouped_aggregate(
        cand.map_batches(
            lambda t: t.append_column("_one", pa.array([1] * t.num_rows, pa.int8())),
            batch_format="pyarrow",
        ),
        ["lid", "rid_"],
        [("_one", "count", "_n")],
    )

    # Route each side's text TO its candidate pairs with a keyed-shuffle
    # hash join (pairs are sparse; texts ship through the exchange once
    # per side — no whole-corpus driver materialization or broadcast).
    from .joins import hash_join

    def _proj(ds_side, id_col, text_col, id_out, text_out):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({id_out: batch[id_col], text_out: batch[text_col]})

        fn.__name__ = f"project_{id_out}"
        return ds_side.map_batches(fn, batch_format="pyarrow")

    lt = _proj(left, left_id, left_text, "_jl_id", "_jl_text")
    rt = _proj(right, right_id, right_text, "_jr_id", "_jr_text")
    with_l = hash_join(uniq, lt, on="lid", right_on="_jl_id")
    with_lr = hash_join(with_l, rt, on="rid_", right_on="_jr_id")

    rid_out = right_id if right_id != left_id else f"{right_id}_right"

    from .dedup import shingles

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

    lim_l, lim_r = limits
    if lim_l is None and lim_r is None:
        return pairs

    rid_col = right_id if right_id != left_id else f"{right_id}_right"

    def cap(group: pd.DataFrame, key: str, n: int) -> pd.DataFrame:
        return (
            group.sort_values(["jaccard", key], ascending=[False, True], kind="mergesort")
            .head(n)
        )

    if lim_l is not None:
        pairs = pairs.groupby(left_id).map_groups(
            lambda g: cap(g, rid_col, lim_l), batch_format="pandas"
        )
    if lim_r is not None:
        pairs = pairs.groupby(rid_col).map_groups(
            lambda g: cap(g, left_id, lim_r), batch_format="pandas"
        )
    return pairs
