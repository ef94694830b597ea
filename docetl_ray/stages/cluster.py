"""Hierarchical clustering stage: docetl ``cluster`` parity
(SURVEY.md §2.1; reference ``/root/reference/docetl/operations/cluster.py``).

The reference embeds documents then runs sklearn agglomerative clustering
into a dendrogram on the driver (``cluster.py:134-157``), optionally
collapses shallow internal nodes (``cluster.py:176-208``), annotates
internal nodes bottom-up with LLM summaries (``cluster.py:210-273``) and
leaves with their root-to-leaf path under ``output_key``
(``cluster.py:275-282``).  Same physical shape here: the
embedding/feature stage is distributed (``map_batches``), the dendrogram
itself is a driver-side global operation over the (small) embedding
matrix — average-linkage agglomerative, pure numpy, deterministic
tie-breaks (no sklearn dependency).  LLM summaries of internal nodes are
replaced by deterministic labels (node size + medoid id).

Two flat-clustering cuts are offered:

- ``cluster_embeddings`` — cut at ``num_clusters`` (the agglomerative
  merge sequence stopped early), labels 0..k-1.
- ``cluster_threshold`` — single-linkage threshold cut: clusters are the
  connected components of the "distance <= threshold" graph (sklearn's
  ``AgglomerativeClustering(linkage="single", distance_threshold=t)``
  flat result), labels = min member id.  This cut is exactly
  SQL-expressible (recursive-CTE components over a pairwise-distance
  join), so it carries the operator's DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def agglomerative_merges(matrix: np.ndarray) -> list[tuple[int, int, float]]:
    """Full average-linkage merge sequence.

    Returns n-1 tuples ``(id_a, id_b, distance)`` with ``id_a < id_b``;
    cluster ids are the minimum member row index (both start as row
    indices and every merge keeps the smaller id), so the sequence fully
    determines every cut.  Deterministic tie-breaks: smallest distance,
    ties -> smallest (i, j) in sorted-active-key order.

    O(n^2) memory/time via the Lance-Williams UPGMA update
    (``d(i∪j, k) = (|i|·d(i,k) + |j|·d(j,k)) / (|i|+|j|)`` — exactly the
    mean over raw member pairs): a driver-side global op, intended for
    matrices up to ~10k rows (sample or pre-bucket larger inputs — the
    reference has the same constraint, ``cluster.py:134-157``)."""
    n = len(matrix)
    if n <= 1:
        return []
    matrix = np.ascontiguousarray(matrix, dtype=np.float64)
    # gram-trick euclidean distances: O(n^2) memory, no n x n x dim
    # broadcast intermediate (which costs seconds and gigabytes by n=2k)
    sq = (matrix * matrix).sum(axis=1)
    dist = np.sqrt(
        np.maximum(sq[:, None] + sq[None, :] - 2.0 * (matrix @ matrix.T), 0.0)
    )
    np.fill_diagonal(dist, np.inf)
    size = np.ones(n)
    alive = np.ones(n, dtype=bool)
    # per-row nearest-neighbor cache: the global (ci, cj) equals the
    # row-major full-matrix argmin — first row attaining the global min
    # (which is the smallest member over every tied pair, so ci < cj),
    # then the first column within it.  rowarg is maintained to always
    # equal np.argmin(dist[k]) so tie-breaks match that scan exactly.
    rowmin = dist.min(axis=1)
    rowarg = dist.argmin(axis=1)
    merges: list[tuple[int, int, float]] = []
    for _ in range(n - 1):
        ci = int(np.argmin(np.where(alive, rowmin, np.inf)))
        cj = int(rowarg[ci])
        merges.append((ci, cj, float(dist[ci, cj])))
        si, sj = size[ci], size[cj]
        new = (si * dist[ci] + sj * dist[cj]) / (si + sj)  # inf stays inf
        dist[ci, :] = new
        dist[:, ci] = new
        dist[ci, ci] = np.inf
        dist[cj, :] = np.inf
        dist[:, cj] = np.inf
        size[ci] = si + sj
        alive[cj] = False
        rowmin[cj] = np.inf
        # stale rows (their cached argmin pointed at a changed column, or
        # are the merged row itself) get an exact recompute; other rows
        # only improve if the new ci column beats — or first-occurrence-
        # ties — their cached min
        stale = alive & ((rowarg == ci) | (rowarg == cj))
        stale[ci] = True
        better = (
            alive & ~stale
            & ((new < rowmin) | ((new == rowmin) & (ci < rowarg)))
        )
        rowmin[better] = new[better]
        rowarg[better] = ci
        idx = np.flatnonzero(stale)
        if len(idx):
            sub = dist[idx]
            args = sub.argmin(axis=1)
            rowarg[idx] = args
            rowmin[idx] = sub[np.arange(len(idx)), args]
    return merges


def agglomerative(matrix: np.ndarray, *, num_clusters: int) -> np.ndarray:
    """Average-linkage agglomerative clustering -> flat labels.

    Cuts the merge sequence after ``n - num_clusters`` merges; label =
    rank of the cluster's min member index among surviving clusters."""
    n = len(matrix)
    if num_clusters >= n:
        return np.arange(n)
    merges = agglomerative_merges(matrix)[: n - num_clusters]
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in merges:
        parent[find(b)] = find(a)  # a < b: min-id root is preserved
    roots = np.array([find(x) for x in range(n)])
    uniq = np.unique(roots)
    lab_of = {r: i for i, r in enumerate(uniq.tolist())}
    return np.array([lab_of[r] for r in roots], dtype=np.int64)


# ---------------------------------------------------------------------------
# Dendrogram: build / collapse / annotate (reference cluster.py parity)
# ---------------------------------------------------------------------------

def build_dendrogram(matrix: np.ndarray) -> dict:
    """Nested dendrogram mirroring the reference's ``build_tree``
    (``cluster.py:144-157``): leaves are ``{"index": i}``, internal nodes
    ``{"children": [...], "distance": d}``."""
    n = len(matrix)
    nodes: dict[int, dict] = {i: {"index": i} for i in range(n)}
    for a, b, dist in agglomerative_merges(matrix):
        nodes[a] = {"children": [nodes[a], nodes[b]], "distance": dist}
    return nodes[0] if n else {}


def _tree_distance_gaps(t: dict) -> set:
    """Set of parent-child distance gaps (reference ``get_tree_distances``,
    ``cluster.py:158-175``)."""
    res: set = set()
    if "children" in t:
        if "distance" in t:
            res.update(
                t["distance"] - c["distance"]
                for c in t["children"]
                if "distance" in c
            )
        for c in t["children"]:
            res.update(_tree_distance_gaps(c))
    return res


def _collapse(t: dict, parent_dist, thresh) -> list[dict]:
    """Reference ``_collapse_tree`` (``cluster.py:176-200``): an internal
    node whose distance gap to its parent is below ``thresh`` dissolves
    into its parent's child list (multi-way nodes)."""
    if "children" not in t:
        return [t]
    if (
        "distance" in t
        and parent_dist is not None
        and thresh is not None
        and parent_dist - t["distance"] < thresh
    ):
        return [g for c in t["children"] for g in _collapse(c, parent_dist, thresh)]
    res = dict(t)
    res["children"] = [
        g for c in t["children"] for g in _collapse(c, t.get("distance"), thresh)
    ]
    return [res]


def collapse_tree(tree: dict, collapse: float | None) -> dict:
    """Reference ``collapse_tree`` (``cluster.py:202-208``): ``collapse``
    is a quantile in [0, 1) over the sorted distance gaps; nodes with a
    smaller gap than that quantile are dissolved."""
    thresh = None
    if collapse is not None:
        gaps = np.array(sorted(_tree_distance_gaps(tree)))
        if len(gaps) == 0:
            return tree
        thresh = gaps[int(len(gaps) * collapse)]
    return _collapse(tree, None, thresh)[0]


def _node_members(t: dict) -> list[int]:
    if "children" in t:
        return [i for c in t["children"] for i in _node_members(c)]
    return [t["index"]]


def annotate_tree(tree: dict, matrix: np.ndarray, ids: list) -> None:
    """Deterministic stand-in for the reference's bottom-up LLM summary
    annotation (``cluster.py:210-273``): every internal node gets
    ``label = "cluster_n{size}_medoid{id}"`` (medoid = member closest to
    the node centroid, ties -> first in member order)."""
    if "children" not in tree:
        return
    for c in tree["children"]:
        annotate_tree(c, matrix, ids)
    idx = np.array(_node_members(tree))
    centroid = matrix[idx].mean(axis=0)
    medoid = idx[np.argmin(np.linalg.norm(matrix[idx] - centroid, axis=1))]
    tree["label"] = f"cluster_n{len(idx)}_medoid{ids[medoid]}"


def leaf_paths(tree: dict, output_key: str = "clusters") -> dict[int, list[str]]:
    """Reference ``annotate_leaves`` (``cluster.py:275-282``): each leaf's
    ``output_key`` is its ancestor chain NEAREST-FIRST (the reference
    stores the ancestor node dicts; here their deterministic labels).
    Returns {leaf index: [labels...]}."""
    out: dict[int, list[str]] = {}

    def walk(t: dict, path: tuple):
        if "children" in t:
            lab = t.get("label", "")
            for c in t["children"]:
                walk(c, (lab,) + path)
        else:
            out[t["index"]] = list(path)

    walk(tree, ())
    return out


def cluster_dendrogram(
    ds,
    emb_col: str,
    id_col: str,
    *,
    collapse: float | None = None,
    output_key: str = "clusters",
    max_driver_rows: int = 10_000,
    coarse: bool | str = "auto",
):
    """Full reference-parity cluster op: dendrogram + optional collapse +
    deterministic node annotation + per-leaf root path under
    ``output_key`` (a ``list<string>``, nearest ancestor first).

    Above ``max_driver_rows`` the exact driver dendrogram no longer
    fits; with ``coarse`` truthy (default ``"auto"``) the op degrades
    gracefully to ``cluster_dendrogram_coarse`` — distributed k-means
    cells + exact per-cell dendrograms under a centroid top tree —
    instead of raising (pass ``coarse=False`` to keep the hard error)."""
    from .util_ray import closure_broadcast, collect_small

    if coarse:
        # count BEFORE collecting: the whole point of the coarse path is
        # that an over-cap corpus never lands on the driver.  Materialize
        # the INPUT once (object store blocks, spillable — never the
        # driver): the coarse path's seed + Lloyd passes and the final
        # full-width assign all re-read it, and without cached blocks
        # each pass would re-execute the whole upstream pipeline (a
        # non-deterministic upstream could even hand the assign pass
        # different rows than the ones that built the tree).  The Lloyd
        # passes then read a cheap (id, emb) projection OF the cached
        # blocks, so payload columns ride only the one final assign.
        ds = ds.materialize()
        slim = ds.select_columns([id_col, emb_col])
        cnt = slim.count()
        if cnt > max_driver_rows:
            return cluster_dendrogram_coarse(
                ds, emb_col, id_col, collapse=collapse,
                output_key=output_key, max_driver_rows=max_driver_rows,
                _slim=slim, _n=cnt,
            )
        small = collect_small(slim)
    else:
        small = collect_small(ds.select_columns([id_col, emb_col]))
    if small.num_rows > max_driver_rows:
        raise ValueError(
            f"cluster_dendrogram: {small.num_rows} rows > max_driver_rows="
            f"{max_driver_rows}; sample or pre-bucket first"
        )
    if small.num_rows == 0:
        # empty upstream (e.g. a filter dropped every row) is a routine
        # pipeline state: return the (empty) input instead of crashing
        # in Arrow sort / dendrogram internals
        return ds
    small = small.sort_by([(id_col, "ascending")])
    ids = small[id_col].to_pylist()
    m = np.asarray(small[emb_col].to_pylist(), dtype=np.float64)
    tree = build_dendrogram(m)
    # the tree helpers recurse; a pathologically unbalanced dendrogram
    # (chain-shaped merges) can exceed Python's default 1000-frame limit
    # well inside max_driver_rows, so raise it for the traversals
    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 2 * small.num_rows + 1000))
    try:
        if collapse is not None:
            tree = collapse_tree(tree, collapse)
        annotate_tree(tree, m, ids)
        paths = leaf_paths(tree, output_key)
    finally:
        sys.setrecursionlimit(old_limit)
    by_id = {ids[i]: p for i, p in paths.items()}
    get_map = closure_broadcast(by_id)

    def attach(batch: pa.Table) -> pa.Table:
        mp = get_map()
        vals = [mp.get(i, []) for i in batch[id_col].to_pylist()]
        return batch.append_column(output_key, pa.array(vals, pa.list_(pa.string())))

    attach.__name__ = "attach_cluster_paths"
    return ds.map_batches(attach, batch_format="pyarrow")


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
    from .util_ray import closure_broadcast, collect_small

    small = collect_small(ds.select_columns([id_col, emb_col]))
    if small.num_rows > max_driver_rows:
        raise ValueError(
            f"cluster_embeddings: {small.num_rows} rows > max_driver_rows="
            f"{max_driver_rows}; sample or pre-bucket first"
        )
    if small.num_rows == 0:
        # empty upstream (e.g. a filter dropped every row) is a routine
        # pipeline state: return the (empty) input instead of crashing
        # in Arrow sort / dendrogram internals
        return ds
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
    get_maps = closure_broadcast((assign, ann))

    def fn(batch: pa.Table) -> pa.Table:
        a, an = get_maps()
        ls = [a[i] for i in batch[id_col].to_pylist()]
        batch = batch.append_column(output_col, pa.array(ls, pa.int64()))
        return batch.append_column(
            f"{output_col}_label", pa.array([an[l] for l in ls], pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def cluster_threshold(
    ds,
    emb_col: str,
    id_col: str,
    *,
    distance_threshold: float,
    output_col: str = "cluster_id",
    max_driver_rows: int = 10_000,
):
    """Single-linkage threshold cut: adds ``output_col`` = the minimum
    ``id_col`` of the row's connected component in the euclidean
    "distance <= threshold" graph.

    Equivalent to sklearn ``AgglomerativeClustering(linkage="single",
    distance_threshold=t)`` flat labels (relabeled to min member id) —
    and exactly expressible as a recursive-CTE components query over a
    pairwise ``list_distance`` join, which is this operator's DuckDB
    oracle."""
    from .dedup import _attach_labels_broadcast, connected_components
    from .util_ray import collect_small

    small = collect_small(ds.select_columns([id_col, emb_col]))
    if small.num_rows > max_driver_rows:
        raise ValueError(
            f"cluster_threshold: {small.num_rows} rows > max_driver_rows="
            f"{max_driver_rows}; sample or pre-bucket first"
        )
    if small.num_rows == 0:
        # empty upstream (e.g. a filter dropped every row) is a routine
        # pipeline state: return the (empty) input instead of crashing
        # in Arrow sort / dendrogram internals
        return ds
    small = small.sort_by([(id_col, "ascending")])
    ids = np.asarray(small[id_col].to_pylist())
    m = np.asarray(small[emb_col].to_pylist(), dtype=np.float64)
    # gram-trick pairwise distances: O(n^2) memory, not O(n^2 * dim)
    n2 = (m * m).sum(axis=1)
    d = np.sqrt(np.maximum(n2[:, None] + n2[None, :] - 2.0 * (m @ m.T), 0.0))
    xs, ys = np.where(np.triu(d <= distance_threshold, 1))
    edges = pa.table({"id_a": pa.array(ids[xs]), "id_b": pa.array(ids[ys])})
    cmap = connected_components(edges)
    return _attach_labels_broadcast(ds, id_col, cmap, output_col)


# ---------------------------------------------------------------------------
# Coarse (distributed) dendrogram above the driver cap
# ---------------------------------------------------------------------------

def _emb_tiebreak(values) -> list[str]:
    """md5-of-embedding-bytes used to break dup-id ties layout-
    independently (ids are not guaranteed unique; arrival order IS the
    layout).  Both seed sampling and the per-cell dendrogram sort with
    THIS hash — sharing one implementation keeps them byte-identical,
    which the hierarchy's layout-independence guarantee relies on."""
    import hashlib

    return [hashlib.md5(np.asarray(v, np.float64).tobytes()).hexdigest()
            for v in values]


def _emb_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, dim) float64 view of a list<float> column (one combine, one
    flatten — no per-row Python)."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    return flat.reshape(n, -1)


def kmeans_cells(
    ds,
    emb_col: str,
    id_col: str,
    *,
    num_cells: int,
    iters: int = 8,
    sample_rows: int = 4096,
    cell_col: str = "_cell",
    _slim=None,
    _n: int | None = None,
):
    """Distributed Lloyd k-means into ``num_cells`` coarse cells.

    Returns ``(centroids (k, dim) ndarray, ds + cell_col:int64)``.
    Seeding: the ``sample_rows`` rows with the SMALLEST deterministic
    id-hash come to the driver once (a hash-threshold filter pass — a
    ``limit()`` sample would depend on block order, making the whole
    hierarchy vary with upstream layout / CPU count) and greedy
    farthest-point picks ``k`` spread seeds (no RNG).  Each Lloyd
    iteration is ONE streaming pass: per-batch argmin assignment +
    per-cell partial (sum, count), collected (k x dim — tiny,
    independent of corpus size) and reduced on the driver.  The corpus
    itself is never materialized on the driver, so this is the scale
    path the dendrogram cap routes to."""
    from .util_ray import closure_broadcast, collect_small, hash_codes

    # materialize the input ONCE (see cluster_dendrogram's coarse
    # branch): seed + Lloyd passes read the (id, emb) projection of the
    # cached blocks; the final assign streams the full-width cache once
    if _slim is None:
        ds = ds.materialize()
        slim = ds.select_columns([id_col, emb_col])
    else:
        slim = _slim
    want = max(sample_rows, num_cells)
    n = slim.count() if _n is None else _n
    frac = 1.0 if n <= want else min(1.0, 4.0 * want / n)
    while True:
        thr = (np.uint64(0xFFFFFFFFFFFFFFFF) if frac >= 1.0
               else np.uint64(frac * 2.0**64))

        def pick_seeds(batch: pa.Table) -> pa.Table:
            h = hash_codes(batch, [id_col])
            mask = h <= thr
            t = batch.filter(pa.array(mask))
            # ids are not guaranteed unique (dedup.py documents
            # last-wins on dup ids); the shared embedding-bytes hash
            # breaks (h, id) ties layout-independently so the seed ORDER
            # never depends on which block a dup-id row arrived in
            eh = _emb_tiebreak(t[emb_col].to_pylist())
            return pa.table({
                "_h": pa.array(h[mask], pa.uint64()),
                "_sid": t[id_col],
                "_eh": pa.array(eh, pa.string()),
                "_semb": t[emb_col],
            })

        pick_seeds.__name__ = "kmeans_seed_sample"
        cand = collect_small(slim.map_batches(pick_seeds, batch_format="pyarrow"))
        if cand.num_rows >= min(want, n) or frac >= 1.0:
            break
        frac = min(1.0, frac * 8.0)
    cand = cand.sort_by([("_h", "ascending"), ("_sid", "ascending"),
                         ("_eh", "ascending")])
    S = _emb_matrix(cand["_semb"].slice(0, want))
    if len(S) == 0:
        raise ValueError("kmeans_cells: empty input")
    # a NaN/inf in the seed sample would poison farthest-point seeding
    # AND make the fixed-point scale below NaN (quantizing EVERY row to
    # INT64_MIN) — sanitize before any use
    S = np.nan_to_num(S, nan=0.0, posinf=0.0, neginf=0.0)
    k = min(num_cells, len(S))
    # greedy farthest-point seeding (k-means++ without the RNG)
    chosen = [0]
    d2min = ((S - S[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(d2min.argmax())
        chosen.append(nxt)
        d2min = np.minimum(d2min, ((S - S[nxt]) ** 2).sum(axis=1))
    C = S[chosen].copy()

    # Fixed-point Lloyd accumulation: float partial sums would depend on
    # BATCH BOUNDARIES (float addition isn't associative), so the same
    # corpus at a different block layout / CPU count drifts centroids by
    # ulps and flips cell-boundary rows — the hierarchy must be
    # layout-independent.  Rows quantize to int64 at a scale derived
    # from the (deterministic) seed sample; integer sums are associative
    # so the reduced centroids are bit-identical under any layout.
    # Headroom: per-row magnitude <= 2^34, so ~2^29 rows per cell per
    # batch-tree level before overflow — far beyond any real cell.
    M = float(max(1.0, np.abs(S).max() * 4.0))
    fxp = (2.0**34) / M

    def partials_fn(get_c):
        def partials(batch: pa.Table) -> pa.Table:
            Cc = get_c()
            X = _emb_matrix(batch[emb_col])
            if len(X) == 0:
                return pa.table({
                    "cell": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "sum": pa.array([], pa.list_(pa.int64())),
                })
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ Cc.T)
                + (Cc * Cc).sum(axis=1)[None, :]
            )
            a = d2.argmin(axis=1)
            # clip at 2^40 (64x the 2^34 seed-sample-derived scale, to
            # spare in-range outliers), NOT near int64 max: rows far
            # outside the seed range (corrupt values, inf) must saturate
            # small enough that summing them cannot wrap the int64
            # accumulator — 2^40 keeps ~2^23 such rows per cell safe,
            # where a 2^62 clip wrapped at the SECOND one
            # NaN passes straight through np.clip and casts to INT64_MIN,
            # corrupting (and with 2+ such rows, wrapping) the int64
            # accumulator — zero it out first; inf saturates via the clip
            Xq = np.rint(np.clip(np.nan_to_num(X * fxp, nan=0.0),
                                 -(2.0**40), 2.0**40)).astype(np.int64)
            sums = np.zeros((len(Cc), Xq.shape[1]), dtype=np.int64)
            np.add.at(sums, a, Xq)
            cnt = np.bincount(a, minlength=len(Cc))
            nz = np.flatnonzero(cnt)
            return pa.table({
                "cell": pa.array(nz, pa.int64()),
                "cnt": pa.array(cnt[nz], pa.int64()),
                "sum": pa.array(list(sums[nz]), pa.list_(pa.int64())),
            })

        partials.__name__ = "kmeans_assign_partials"
        return partials

    for _ in range(iters):
        get_c = closure_broadcast(C)
        part = collect_small(
            slim.map_batches(partials_fn(get_c), batch_format="pyarrow")
        )
        cells = part["cell"].to_numpy()
        cnts = part["cnt"].to_numpy()
        sums = np.asarray(part["sum"].to_pylist(), dtype=np.int64) \
            if part.num_rows else np.zeros((0, C.shape[1]), dtype=np.int64)
        tot_cnt = np.zeros(k, dtype=np.int64)
        np.add.at(tot_cnt, cells, cnts)
        tot_sum = np.zeros((k, C.shape[1]), dtype=np.int64)
        np.add.at(tot_sum, cells, sums)
        nz = tot_cnt > 0
        newC = C.copy()
        newC[nz] = (tot_sum[nz] / fxp) / tot_cnt[nz, None]
        if np.allclose(newC, C):
            C = newC
            break
        C = newC

    get_c = closure_broadcast(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cc = get_c()
        X = _emb_matrix(batch[emb_col])
        if len(X) == 0:
            return batch.append_column(cell_col, pa.array([], pa.int64()))
        d2 = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * (X @ Cc.T)
            + (Cc * Cc).sum(axis=1)[None, :]
        )
        return batch.append_column(
            cell_col, pa.array(d2.argmin(axis=1), pa.int64())
        )

    assign.__name__ = "kmeans_assign"
    return C, ds.map_batches(assign, batch_format="pyarrow")


def cluster_dendrogram_coarse(
    ds,
    emb_col: str,
    id_col: str,
    *,
    collapse: float | None = None,
    output_key: str = "clusters",
    max_driver_rows: int = 10_000,
    num_cells: int | None = None,
    kmeans_iters: int = 8,
    _slim=None,
    _n: int | None = None,
):
    """Dendrogram past the driver cap: distributed k-means into ~sqrt(n)
    coarse cells, an EXACT per-cell dendrogram inside each cell (one
    grouped task per cell through the take()-exchange), and a driver
    dendrogram over the k cell centroids as the top of the hierarchy.

    Every leaf's ``output_key`` path is its local ancestor chain
    (nearest-first) followed by its cell's ancestor chain in the
    centroid tree — a valid single tree (each cell subtree hangs off
    its centroid leaf), coarser than the exact full dendrogram near the
    cell boundaries (the documented degradation; within-cell structure
    is exact).  The corpus never lands on the driver: k-means reduces
    (k x dim) partials, the top tree sees only k <= max_driver_rows
    centroids, and paths attach inside the per-cell tasks."""
    import sys

    import pandas as pd

    from .grouped import grouped_map

    # materialize the input ONCE (see cluster_dendrogram's coarse
    # branch): seed + Lloyd passes + the final assign all re-read it;
    # callers passing _slim guarantee ds is already materialized
    if _slim is None:
        ds = ds.materialize()
        slim = ds.select_columns([id_col, emb_col])
    else:
        slim = _slim
    # each count() over the non-materialized projection re-runs it on
    # the full corpus — callers that already counted pass _n through
    n = slim.count() if _n is None else _n
    if n <= max_driver_rows:
        # under the cap after all: run the exact driver path over the
        # already-cached blocks (coarse=False — one projection pass;
        # re-entering the auto branch would re-materialize and re-count)
        return cluster_dendrogram(
            ds, emb_col, id_col, collapse=collapse, output_key=output_key,
            max_driver_rows=max_driver_rows, coarse=False,
        )
    if num_cells is None:
        # sqrt(n) cells, raised until the EXPECTED cell size fits the
        # driver cap with 2x headroom (skew guard: oversized cells are
        # further hash-split inside the task).  Past n = cap^2/2 the
        # cell count itself would exceed the driver cap; clamp it there
        # — cells grow past the cap instead, and per_cell's positional
        # split keeps each in-task dendrogram bounded (the hierarchy
        # just gets coarser, which is the documented degradation)
        num_cells = int(min(max_driver_rows, max(
            np.ceil(np.sqrt(n)), np.ceil(2.0 * n / max_driver_rows), 2
        )))
    if num_cells > max_driver_rows:
        raise ValueError(
            f"cluster_dendrogram_coarse: num_cells={num_cells} exceeds the "
            f"driver cap {max_driver_rows}; raise max_driver_rows"
        )

    centroids, assigned = kmeans_cells(
        ds, emb_col, id_col, num_cells=num_cells, iters=kmeans_iters,
        _slim=slim, _n=n,
    )
    # top-of-hierarchy tree over the cell centroids (driver, k rows)
    cell_ids = [f"cell{i}" for i in range(len(centroids))]
    top = build_dendrogram(centroids)
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 2 * len(centroids) + 1000))
    try:
        if collapse is not None:
            top = collapse_tree(top, collapse)
        annotate_tree(top, centroids, cell_ids)
        top_paths = leaf_paths(top, output_key)
    finally:
        sys.setrecursionlimit(old_limit)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        # sort by id: partition row order depends on upstream block
        # layout / CPU count, and both the leaf indices and the
        # positional skew-split below must be reproducible (the exact
        # path sorts the collected table by id for the same reason).
        # ids are not guaranteed unique, so break ties on the shared
        # embedding-bytes hash — a plain (even stable) sort would leave
        # dup-id rows in arrival order, which IS the layout
        g = g.assign(_tb=_emb_tiebreak(g[emb_col])) \
             .sort_values([id_col, "_tb"], ignore_index=True,
                          kind="mergesort").drop(columns=["_tb"])
        cell = int(g["_cell"].iloc[0])
        tpath = top_paths.get(cell, [])
        out_chunks = []
        # skew guard: a cell past the cap is hash-split positionally;
        # each split keeps the shared cell path
        for lo in range(0, len(g), max_driver_rows):
            part = g.iloc[lo:lo + max_driver_rows]
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in part[emb_col]]
            )
            ids = part[id_col].tolist()
            tree = build_dendrogram(m)
            lim = sys.getrecursionlimit()
            sys.setrecursionlimit(max(lim, 2 * len(part) + 1000))
            try:
                if collapse is not None:
                    tree = collapse_tree(tree, collapse)
                annotate_tree(tree, m, ids)
                paths = leaf_paths(tree, output_key)
            finally:
                sys.setrecursionlimit(lim)
            res = part.drop(columns=["_cell"]).copy()
            res[output_key] = [paths.get(i, []) + tpath for i in range(len(part))]
            out_chunks.append(res)
        return pd.concat(out_chunks, ignore_index=True)

    per_cell.__name__ = "cell_dendrogram"
    return grouped_map(assigned, "_cell", per_cell,
                       num_partitions=min(64, max(8, num_cells // 8)))
