"""Hierarchical clustering stage: docetl ``cluster`` parity
(SURVEY.md §2.1; reference ``/root/reference/docetl/operations/cluster.py``).

The reference embeds documents then runs sklearn agglomerative clustering
into a dendrogram on the driver (``cluster.py:134-157``) and annotates
leaves with their root-to-leaf path (``cluster.py:275-282``).  Same
physical shape here: the embedding/feature stage is distributed
(``map_batches``), the dendrogram itself is a driver-side global
operation over the (small) embedding matrix — average-linkage
agglomerative, pure numpy, deterministic tie-breaks (no sklearn
dependency).  LLM summaries of internal nodes are replaced by
deterministic labels (node size + medoid id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def agglomerative(matrix: np.ndarray, *, num_clusters: int) -> np.ndarray:
    """Average-linkage agglomerative clustering -> flat labels.

    O(n^2) memory/time: a driver-side global op, intended for matrices up
    to ~10k rows (sample or pre-bucket larger inputs — the reference has
    the same constraint)."""
    n = len(matrix)
    if num_clusters >= n:
        return np.arange(n)
    d = np.linalg.norm(matrix[:, None, :] - matrix[None, :, :], axis=2)
    np.fill_diagonal(d, np.inf)
    active = {i: [i] for i in range(n)}
    # cluster ids grow from n upward; members tracked per active cluster
    dist = d.copy()
    while len(active) > num_clusters:
        # deterministic argmin: smallest distance, ties -> smallest (i, j)
        keys = sorted(active)
        sub = dist[np.ix_(keys, keys)]
        flat = np.argmin(sub)
        i, j = divmod(flat, len(keys))
        if i > j:
            i, j = j, i
        ci, cj = keys[i], keys[j]
        # merge cj into ci (average linkage over members)
        members = active[ci] + active[cj]
        del active[cj]
        active[ci] = members
        for ck in active:
            if ck == ci:
                continue
            # average pairwise distance between member sets
            dm = d[np.ix_(members, active[ck])].mean()
            dist[ci, ck] = dist[ck, ci] = dm
        dist[cj, :] = np.inf
        dist[:, cj] = np.inf
    labels = np.empty(n, dtype=np.int64)
    for lab, (_, members) in enumerate(sorted(active.items())):
        labels[members] = lab
    return labels


def cluster_embeddings(
    ds,
    emb_col: str,
    id_col: str,
    *,
    num_clusters: int,
    output_col: str = "cluster_id",
    max_driver_rows: int = 10_000,
):
    """Cluster rows by their embedding; adds ``output_col`` (int64 label)
    and ``{output_col}_label`` (deterministic cluster annotation).

    The matrix is pulled to the driver (bounded by ``max_driver_rows``);
    label assignment is then broadcast back through a ``map_batches``
    lookup — no shuffle."""
    import ray

    from .util_ray import collect_small

    small = collect_small(ds.select_columns([id_col, emb_col]))
    if small.num_rows > max_driver_rows:
        raise ValueError(
            f"cluster_embeddings: {small.num_rows} rows > max_driver_rows="
            f"{max_driver_rows}; sample or pre-bucket first"
        )
    small = small.sort_by([(id_col, "ascending")])
    ids = small[id_col].to_pylist()
    m = np.asarray(small[emb_col].to_pylist(), dtype=np.float64)
    labels = agglomerative(m, num_clusters=num_clusters)

    # deterministic annotation: size + medoid (closest-to-centroid) id
    ann = {}
    for lab in np.unique(labels):
        idx = np.flatnonzero(labels == lab)
        centroid = m[idx].mean(axis=0)
        medoid = idx[np.argmin(np.linalg.norm(m[idx] - centroid, axis=1))]
        ann[int(lab)] = f"cluster_{lab}_n{len(idx)}_medoid{ids[medoid]}"
    assign = {i: int(l) for i, l in zip(ids, labels)}
    ref = ray.put((assign, ann))

    def fn(batch: pa.Table) -> pa.Table:
        a, an = ray.get(ref)
        ls = [a[i] for i in batch[id_col].to_pylist()]
        batch = batch.append_column(output_col, pa.array(ls, pa.int64()))
        return batch.append_column(
            f"{output_col}_label", pa.array([an[l] for l in ls], pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow")
