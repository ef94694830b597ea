"""Approximate-nearest-neighbor search over an embedding column
(``list<float>``), training-data-pipeline style.

- ``ann_topk_bruteforce`` — the exact baseline: the query matrix is
  ``ray.put`` ONCE (broadcast, never re-shipped per batch); every batch
  computes a cosine-score matmul and emits only its local top-k partials,
  so the final per-query merge sees ``k × num_batches`` rows instead of
  the corpus.
- ``ann_topk_lsh`` — a scale path: random-hyperplane bucket codes
  restrict scoring to vectors sharing a bucket with the query (probing
  multi-bit-flip neighbors for recall).
- ``ann_topk_ivf`` — the other classic scale path (IVF-flat): a small
  coarse-quantizer centroid set partitions the corpus into ``nlist``
  inverted lists; each query probes its ``nprobe`` closest lists and is
  scored exactly against only those vectors.  At 100 TB the lists are a
  persisted partitioning key (write the corpus bucketed by ``_ivf_list``
  once; a query then reads only ``nprobe/nlist`` of the data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def _merge_topk_partials(partials, id_col: str, k: int):
    """Final top-k merge on the driver: the partial stage emits at most
    ``k x num_batches`` rows per query (tiny by contract), so a
    ``groupby(query_id)`` shuffle here is pure scheduling overhead
    (measured 3.6 s of Sort for 960 rows).  Deterministic ties by id."""
    import ray.data as rd

    from .util_ray import collect_small

    t = collect_small(partials)
    if t.num_rows == 0:
        return rd.from_arrow(t)
    df = t.to_pandas().sort_values(
        ["query_id", "score", id_col], ascending=[True, False, True],
        kind="mergesort",
    )
    out = df.groupby("query_id", sort=True).head(k)
    return rd.from_arrow(
        pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
    )


def ann_topk_bruteforce(ds, emb_col: str, id_col: str, queries: np.ndarray, k: int = 10):
    """Exact cosine top-k per query row.

    Returns a Dataset of ``(query_id, id, score)`` with k rows per query,
    deterministic ties broken by id ascending.
    """
    from .util_ray import closure_broadcast

    q = _normalize(np.asarray(queries, dtype=np.float64))
    get_q = closure_broadcast(q)

    # stateless tasks (NOT an actor pool: spinning actors up costs
    # seconds per invocation); small query matrices ride the serialized
    # closure, large ones go through one ray.put + per-worker cache
    def score(batch: pa.Table) -> pa.Table:
        qm = get_q()
        ids = np.asarray(batch[id_col].to_pylist())
        m = _normalize(np.asarray(batch[emb_col].to_pylist(), dtype=np.float64))
        sim = qm @ m.T  # (nq, nb)
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

    score.__name__ = "ann_score"
    partials = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk_partials(partials, id_col, k)


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
    within ``probe_flips`` bit flips of ANY query's code (multi-probe over
    the union probe set).  Approximate — recall grows with probes; same
    output schema as bruteforce.

    Bucket codes use md5-derived integer hyperplanes over 4096-quantized
    embeddings (``util_ray.md5_int_planes`` / ``quantized_lsh_codes``):
    exact integer arithmetic, reproducible bit-for-bit in SQL — so a
    DuckDB oracle can recompute the probed candidate set and the exact
    top-k WITHIN it, making this query exactly checkable even though its
    recall vs brute force is probabilistic."""
    from .util_ray import md5_int_planes, quantized_lsh_codes

    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    planes = md5_int_planes(num_planes, dim, tag=f"ann{seed}")

    def code_of(m: np.ndarray) -> np.ndarray:
        return quantized_lsh_codes(m, planes).astype(np.uint64)

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
    from .util_ray import closure_broadcast

    get_qp = closure_broadcast((qn, probe))

    # stateless tasks (see ann_topk_bruteforce)
    def score(batch: pa.Table) -> pa.Table:
        qm, probe_set = get_qp()
        ids = np.asarray(batch[id_col].to_pylist())
        m = np.asarray(batch[emb_col].to_pylist(), dtype=np.float64)
        codes = code_of(m)
        mask = np.fromiter((int(c) in probe_set for c in codes), bool, len(codes))
        if not mask.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], batch[id_col].type),
                    "score": pa.array([], pa.float64()),
                }
            )
        ids, mn = ids[mask], _normalize(m[mask])
        sim = qm @ mn.T
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

    score.__name__ = "ann_lsh_score"
    partials = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk_partials(partials, id_col, k)


def ivf_seed_centroids(ds, emb_col: str, id_col: str, nlist: int) -> np.ndarray:
    """Deterministic coarse-quantizer seeds: the ``nlist`` corpus vectors
    with the smallest ids.  One streaming pass — each batch emits only its
    local ``nlist`` smallest-id rows, the driver merges ``nlist x
    num_batches`` partials (tiny).  SQL-replicable (``ORDER BY id LIMIT
    nlist``), which is what makes the IVF query exactly oracle-checkable;
    production corpora would swap in ``ivf_train_kmeans`` centroids."""

    def local_head(batch: pa.Table) -> pa.Table:
        idx = np.argsort(np.asarray(batch[id_col].to_pylist()), kind="stable")[:nlist]
        return batch.select([id_col, emb_col]).take(pa.array(idx, pa.int64()))

    local_head.__name__ = "ivf_seed_partial"
    from .util_ray import collect_small

    t = collect_small(ds.map_batches(local_head, batch_format="pyarrow"))
    t = t.sort_by([(id_col, "ascending")]).slice(0, nlist)
    return np.asarray(t[emb_col].to_pylist(), dtype=np.float64)


def ivf_train_kmeans(
    sample: np.ndarray, nlist: int, *, iters: int = 10
) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-held sample (spherical:
    cosine assignment, mean + renormalize update).  Init = first ``nlist``
    sample rows.  The sample is bounded by the caller (e.g. ``ds.limit``
    or a hash-sampled slice); training never sees the full corpus."""
    m = _normalize(np.asarray(sample, dtype=np.float64))
    cents = m[:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(m @ _normalize(cents).T, axis=1)
        for c in range(nlist):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return _normalize(cents)


def ann_topk_ivf(
    ds,
    emb_col: str,
    id_col: str,
    queries: np.ndarray,
    k: int = 10,
    *,
    nlist: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
):
    """IVF-flat ANN: assign every corpus vector to its max-cosine centroid
    (ties -> lowest centroid index); each query probes its ``nprobe``
    closest centroids (ties -> lowest index) and is scored exactly against
    only vectors in those lists.  Output schema matches bruteforce:
    ``(query_id, id, score)``, k rows per query, ties by id ascending.

    ``centroids=None`` uses :func:`ivf_seed_centroids` (lowest-id corpus
    vectors) so a DuckDB oracle can recompute assignment, probe set, and
    the exact within-list top-k.  Recall vs brute force is probabilistic
    in ``nprobe/nlist`` exactly as in FAISS IVF-flat."""
    q = np.asarray(queries, dtype=np.float64)
    if centroids is None:
        centroids = ivf_seed_centroids(ds, emb_col, id_col, nlist)
    cm = _normalize(np.asarray(centroids, dtype=np.float64))
    nlist = cm.shape[0]
    nprobe = min(nprobe, nlist)
    qn = _normalize(q)

    # per-query probed lists as a (nq, nlist) bool matrix
    qsim = qn @ cm.T
    cids = np.arange(nlist)
    probe_mask = np.zeros((len(qn), nlist), dtype=bool)
    for qi in range(len(qn)):
        order = np.lexsort((cids, -qsim[qi]))[:nprobe]
        probe_mask[qi, order] = True

    from .util_ray import closure_broadcast

    get_state = closure_broadcast((qn, cm, probe_mask))

    # stateless tasks (see ann_topk_bruteforce)
    def score(batch: pa.Table) -> pa.Table:
        qm, cents, pmask = get_state()
        ids = np.asarray(batch[id_col].to_pylist())
        m = _normalize(np.asarray(batch[emb_col].to_pylist(), dtype=np.float64))
        # argmax picks the FIRST maximal index — the lowest-cid tie rule
        assign = np.argmax(m @ cents.T, axis=1)
        sim = qm @ m.T  # (nq, nb)
        sim = np.where(pmask[:, assign], sim, -np.inf)
        nq, nb = sim.shape
        kk = min(k, nb)
        part = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            cols = part[qi][np.isfinite(sim[qi, part[qi]])]
            order = np.lexsort((ids[cols], -sim[qi, cols]))
            for c in cols[order]:
                out_q.append(qi)
                out_id.append(ids[c])
                out_s.append(float(sim[qi, c]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, batch[id_col].type),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    score.__name__ = "ann_ivf_score"
    partials = ds.map_batches(score, batch_format="pyarrow")
    return _merge_topk_partials(partials, id_col, k)
