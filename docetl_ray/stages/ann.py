"""Approximate-nearest-neighbor search over an embedding column
(``list<float>``), training-data-pipeline style.

- ``ann_topk_bruteforce`` — the exact baseline: the query matrix is
  ``ray.put`` ONCE (broadcast, never re-shipped per batch); every batch
  computes a cosine-score matmul and emits only its local top-k partials,
  so the final per-query merge sees ``k × num_batches`` rows instead of
  the corpus.
- ``ann_topk_lsh`` — the scale path: random-hyperplane bucket codes
  restrict scoring to vectors sharing a bucket with the query (probing
  multi-bit-flip neighbors for recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def ann_topk_bruteforce(ds, emb_col: str, id_col: str, queries: np.ndarray, k: int = 10):
    """Exact cosine top-k per query row.

    Returns a Dataset of ``(query_id, id, score)`` with k rows per query,
    deterministic ties broken by id ascending.
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(q)

    class Score:
        __name__ = "ann_score"

        def __init__(self):
            self.q = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.q is None:
                self.q = ray.get(qref)
            ids = np.asarray(batch[id_col].to_pylist())
            m = _normalize(np.asarray(batch[emb_col].to_pylist(), dtype=np.float64))
            sim = self.q @ m.T  # (nq, nb)
            nq, nb = sim.shape
            kk = min(k, nb)
            # local top-k partials per query (sorted for determinism)
            part = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
            out_q, out_id, out_s = [], [], []
            for qi in range(nq):
                cols = part[qi]
                order = np.lexsort((ids[cols], -sim[qi, cols]))
                for c in cols[order]:
                    out_q.append(qi)
                    out_id.append(ids[c])
                    out_s.append(float(sim[qi, c]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_id),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partials = ds.map_batches(Score, batch_format="pyarrow", concurrency=(1, 8))

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def ann_topk_lsh(
    ds,
    emb_col: str,
    id_col: str,
    queries: np.ndarray,
    k: int = 10,
    *,
    num_planes: int = 8,
    probe_flips: int = 1,
    seed: int = 11,
):
    """LSH-bucketed ANN: score only vectors whose hyperplane sign code is
    within ``probe_flips`` bit flips of the query's code (multi-probe).
    Approximate — recall grows with probes; same output schema as
    bruteforce."""
    import ray

    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, num_planes)

    def code_of(m: np.ndarray) -> np.ndarray:
        bits = (m @ planes > 0).astype(np.uint64)
        code = np.zeros(len(m), dtype=np.uint64)
        for i in range(num_planes):
            code |= bits[:, i] << np.uint64(i)
        return code

    qcodes = code_of(q)
    probe: set[int] = set()
    for c in qcodes.tolist():
        probe.add(c)
        if probe_flips >= 1:
            for i in range(num_planes):
                probe.add(c ^ (1 << i))
        if probe_flips >= 2:
            for i in range(num_planes):
                for j in range(i + 1, num_planes):
                    probe.add(c ^ (1 << i) ^ (1 << j))

    qn = _normalize(q)
    qref = ray.put((qn, probe))

    class Score:
        __name__ = "ann_lsh_score"

        def __init__(self):
            self.q = None
            self.probe = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.q is None:
                self.q, self.probe = ray.get(qref)
            ids = np.asarray(batch[id_col].to_pylist())
            m = np.asarray(batch[emb_col].to_pylist(), dtype=np.float64)
            codes = code_of(m)
            mask = np.fromiter((int(c) in self.probe for c in codes), bool, len(codes))
            if not mask.any():
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        id_col: pa.array([], batch[id_col].type),
                        "score": pa.array([], pa.float64()),
                    }
                )
            ids, mn = ids[mask], _normalize(m[mask])
            sim = self.q @ mn.T
            nq, nb = sim.shape
            kk = min(k, nb)
            part = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
            out_q, out_id, out_s = [], [], []
            for qi in range(nq):
                for c in part[qi]:
                    out_q.append(qi)
                    out_id.append(ids[c])
                    out_s.append(float(sim[qi, c]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_id),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partials = ds.map_batches(Score, batch_format="pyarrow", concurrency=(1, 8))

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return partials.groupby("query_id").map_groups(final, batch_format="pandas")
