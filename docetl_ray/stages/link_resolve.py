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

    class Rewrite:
        __name__ = "link_rewrite"

        def __init__(self):
            self.ids = None
            self.idset = None
            self.index: dict | None = None  # 3-gram -> sorted candidate ids
            self.cache: dict = {}

        @staticmethod
        def _grams(s: str, n: int = 3) -> set:
            s = s.lower()
            return {s[i : i + n] for i in range(max(1, len(s) - n + 1))}

        def _build(self):
            self.ids = ray.get(ref)
            self.idset = set(self.ids)
            # n-gram inverted index, built ONCE per actor: a dangling link
            # only needs Jaccard against ids sharing >=1 gram (any id with
            # Jaccard >= threshold > 0 must share a gram), so lookup is
            # O(|link grams| x bucket) instead of O(|ids|) linear scan
            self.index = {}
            for cand in self.ids:  # sorted -> bucket lists stay sorted
                for g in self._grams(str(cand)):
                    self.index.setdefault(g, []).append(cand)

        def _best_match(self, v):
            if threshold <= 0:
                cands = self.ids  # gram pruning unsound at threshold 0
            else:
                seen = set()
                cands = []
                for g in self._grams(str(v)):
                    for cand in self.index.get(g, ()):
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

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.ids is None:
                self._build()
            links = batch[link_col].to_pylist()
            out = []
            for v in links:
                if v is None or v in self.idset:
                    out.append(v)
                    continue
                if v not in self.cache:
                    self.cache[v] = self._best_match(v)
                out.append(self.cache[v])
            col = pa.array(out, batch[link_col].type)
            target = out_col or link_col
            if target in batch.column_names:
                return batch.set_column(batch.column_names.index(target), target, col)
            return batch.append_column(target, col)

    return ds.map_batches(Rewrite, batch_format="pyarrow", concurrency=(1, 8))
