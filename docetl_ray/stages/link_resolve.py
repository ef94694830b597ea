"""Dangling-edge repair: docetl ``link_resolve`` parity
(SURVEY.md §2.1; reference ``/root/reference/docetl/operations/link_resolve.py``).

The reference collects link values absent from the id set
(``link_resolve.py:57-66``), blocks candidates by embedding cosine, has
an LLM confirm matches, and rewrites links via a replacement map
(``link_resolve.py:142-146``).  Here: the id dictionary (small side) is
broadcast, dangling links are matched to the nearest id by token-Jaccard
above a threshold (deterministic; ties -> lexicographically smallest id),
and the rewrite happens inside ``map_batches`` — a broadcast dictionary
join, no shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from .resolve import char_ngram_jaccard


def link_resolve(
    ds,
    *,
    id_col: str,
    link_col: str,
    id_values=None,
    threshold: float = 0.5,
    out_col: str | None = None,
):
    """Rewrite ``link_col`` values that don't appear among the known ids.

    ``id_values``: iterable of valid ids; defaults to the distinct values
    of ``id_col`` in ``ds`` (collected once — the small side).
    Unmatched links (best Jaccard < threshold) are kept as-is.
    """
    import ray

    if id_values is None:
        id_values = ds.unique(id_col)
    ids = sorted({v for v in id_values if v is not None})
    ref = ray.put(ids)

    # stateless tasks + per-worker-process cache of the BUILT index (not
    # an actor pool: actor startup costs seconds per pipeline invocation,
    # which dominated this stage's wall time).  The n-gram inverted index
    # is built once per worker process per id set — a dangling link only
    # needs Jaccard against ids sharing >=1 gram, so lookup is
    # O(|link grams| x bucket) instead of an O(|ids|) linear scan.
    def rewrite(batch: pa.Table) -> pa.Table:
        st = _link_state(ref)
        idset, index, all_ids, cache = (
            st["idset"], st["index"], st["ids"], st["cache"]
        )

        def best_match(v):
            if threshold <= 0:
                cands = all_ids  # gram pruning unsound at threshold 0
            else:
                seen = set()
                cands = []
                for g in _grams(str(v)):
                    for cand in index.get(g, ()):
                        if cand not in seen:
                            seen.add(cand)
                            cands.append(cand)
                cands.sort()  # deterministic ties: smallest id wins
            best, best_s = v, threshold
            for cand in cands:
                s = char_ngram_jaccard(str(v), str(cand))
                if s > best_s:
                    best, best_s = cand, s
            return best

        out = []
        for v in batch[link_col].to_pylist():
            if v is None or v in idset:
                out.append(v)
                continue
            if v not in cache:
                cache[v] = best_match(v)
            out.append(cache[v])
        col = pa.array(out, batch[link_col].type)
        target = out_col or link_col
        if target in batch.column_names:
            return batch.set_column(batch.column_names.index(target), target, col)
        return batch.append_column(target, col)

    rewrite.__name__ = "link_rewrite"
    return ds.map_batches(rewrite, batch_format="pyarrow")


_LINK_STATE: dict = {}


def _grams(s: str, n: int = 3) -> set:
    s = s.lower()
    return {s[i : i + n] for i in range(max(1, len(s) - n + 1))}


def _link_state(ref) -> dict:
    """Per-worker-process cache: ray.get the id list once and build the
    3-gram inverted index once; every later batch on the worker hits the
    dict (same pattern as ``util_ray.broadcast_cached``)."""
    import ray

    key = ref.hex()
    st = _LINK_STATE.get(key)
    if st is None:
        ids = ray.get(ref)
        index: dict = {}
        for cand in ids:  # sorted -> bucket lists stay sorted
            for g in _grams(str(cand)):
                index.setdefault(g, []).append(cand)
        st = {"ids": ids, "idset": set(ids), "index": index, "cache": {}}
        if len(_LINK_STATE) > 16:
            _LINK_STATE.clear()
        _LINK_STATE[key] = st
    return st
