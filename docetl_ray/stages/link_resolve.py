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
            self.cache: dict = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.ids is None:
                self.ids = ray.get(ref)
                self.idset = set(self.ids)
            links = batch[link_col].to_pylist()
            out = []
            for v in links:
                if v is None or v in self.idset:
                    out.append(v)
                    continue
                if v in self.cache:
                    out.append(self.cache[v])
                    continue
                best, best_s = v, threshold
                for cand in self.ids:  # ids sorted -> deterministic ties
                    s = char_ngram_jaccard(str(v), str(cand))
                    if s > best_s:
                        best, best_s = cand, s
                self.cache[v] = best
                out.append(best)
            col = pa.array(out, batch[link_col].type)
            target = out_col or link_col
            if target in batch.column_names:
                return batch.set_column(batch.column_names.index(target), target, col)
            return batch.append_column(target, col)

    return ds.map_batches(Rewrite, batch_format="pyarrow", concurrency=(1, 8))
