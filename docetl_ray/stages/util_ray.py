"""Ray-side helpers shared by stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


from collections import OrderedDict

_BROADCAST_CACHE: "OrderedDict[str, object]" = OrderedDict()
# A zero-copy ``ray.get`` of a numpy-bearing object keeps its plasma
# object PINNED for as long as the Python view lives, so an UNBOUNDED
# per-worker cache turns repeated pipeline invocations into monotonic
# object-store pressure: every repeat's ``ray.put`` stays pinned in every
# worker that touched it, the store fills, and ALL later queries in the
# session degrade through spilling (measured: back-to-back minhash runs
# grew 6.6s -> 38s and slowed the following ANN query 3x).  A small LRU
# covers every concurrent broadcast one pipeline legitimately uses while
# unpinning finished pipelines' objects on eviction.
_BROADCAST_CACHE_MAX = 8


def broadcast_cached(ref):
    """Per-worker-process bounded LRU for ``ray.put`` broadcast objects:
    the first task on a worker pays one zero-copy ``ray.get``; later
    batches hit the dict.  Use from STATELESS ``map_batches`` functions
    instead of an actor pool when the only state is a broadcast object
    (actor pools pay seconds of process startup per invocation)."""
    import ray

    key = ref.hex()
    if key in _BROADCAST_CACHE:
        _BROADCAST_CACHE.move_to_end(key)
        return _BROADCAST_CACHE[key]
    val = ray.get(ref)
    _BROADCAST_CACHE[key] = val
    while len(_BROADCAST_CACHE) > _BROADCAST_CACHE_MAX:
        _BROADCAST_CACHE.popitem(last=False)
    return val


def arrow_refs(ds) -> list:
    """``ds.to_arrow_refs()`` without the hidden DOUBLE execution: on a
    non-materialized dataset Ray 2.49's ``to_arrow_refs`` runs the full
    plan and then re-executes it behind a ``limit(1)`` schema probe
    (observed on both arrow- and pandas-block pipelines).  Materializing
    first makes both reads hit the cached bundle — one execution, and
    the blocks were going to live in the object store either way."""
    return list(ds.materialize().to_arrow_refs())


_CLOSURE_BCAST_THRESHOLD = 4 * 1024 * 1024


def closure_broadcast(obj, *, threshold: int = _CLOSURE_BCAST_THRESHOLD):
    """Broadcast ``obj`` to stateless map tasks: returns a zero-arg getter
    to call inside the UDF.

    Small objects ride the serialized closure directly (cheapest — one
    copy in the task spec).  Large objects go through ONE ``ray.put``
    with a per-worker-process cache keyed by the ref (zero-copy local
    reads, no per-batch reshipping).  Either way, no actor pool — actor
    startup costs seconds per pipeline invocation, and capturing bare
    ObjectRefs in task closures measured ~10x worse than both paths."""
    import pickle

    try:
        size = len(pickle.dumps(obj, protocol=5))
    except Exception:
        size = threshold + 1
    if size <= threshold:
        return lambda: obj
    import ray

    ref = ray.put(obj)

    def get():
        return broadcast_cached(ref)

    return get


def md5_int_planes(num_planes: int, dim: int, *, tag: str, mod: int = 2001) -> np.ndarray:
    """SQL-replicable pseudo-random integer hyperplanes for sign-LSH.

    ``w[d, j] = (uint64(md5(f"{tag}:{j}:{d}")[:8]) % mod) - mod // 2`` —
    exactly ``(('0x' || substr(md5(tag || ':' || j || ':' || d), 1, 16))
    ::UBIGINT % mod) - mod // 2`` in DuckDB, so an oracle can recompute
    the planes (and therefore every bucket code) bit-for-bit.  Computed
    once on the driver (num_planes x dim md5 calls) and broadcast."""
    import hashlib

    w = np.empty((dim, num_planes), dtype=np.int64)
    half = mod // 2
    for j in range(num_planes):
        for d in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"{tag}:{j}:{d}".encode("utf-8")).digest()[:8], "big"
            )
            w[d, j] = (h % mod) - half
    return w


def quantized_lsh_codes(
    embs: np.ndarray, planes_int: np.ndarray, *, scale: int = 4096
) -> np.ndarray:
    """Sign-LSH bucket codes via EXACT integer arithmetic.

    Embeddings are quantized ``q = floor(v * scale + 0.5)`` (scale a
    power of two -> the float multiply is exact for float32-origin
    values; floor is exact), then ``code = bits(q @ planes_int > 0)``.
    All-integer dot products make the codes independent of summation
    order — a float dot product could flip a sign between numpy's
    pairwise/BLAS sum and a SQL engine's sequential sum.  Returns int64
    codes in [0, 2^num_planes)."""
    q = np.floor(embs * float(scale) + 0.5).astype(np.int64)
    dots = q @ planes_int  # exact: |q| <= scale * O(1), |w| <= mod/2, dims small
    bits = (dots > 0).astype(np.uint64)
    code = np.zeros(len(embs), dtype=np.uint64)
    for i in range(planes_int.shape[1]):
        code |= bits[:, i] << np.uint64(i)
    return code.astype(np.int64)


def hash_codes(batch: pa.Table, key_cols, *, seed: int = 0) -> "np.ndarray":
    """Vectorized deterministic per-row uint64 hash of ``key_cols``.

    No Python per-row loop: integer/float/bool columns hash via numpy
    mixing on the raw values; everything else via pandas'
    ``hash_pandas_object`` (C siphash, fixed key — stable across
    processes and runs).  Used for shuffle bucketing, so it only needs
    determinism + spread, not cryptographic strength.
    """
    import pandas as pd
    import pyarrow.compute as pc

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    with np.errstate(over="ignore"):
        h = np.full(batch.num_rows, np.uint64(seed) * _MIX + _MIX, dtype=np.uint64)
        for c in key_cols:
            col = batch[c]
            t = col.type
            if pa.types.is_integer(t) or pa.types.is_boolean(t):
                v = pc.cast(col, pa.int64()).combine_chunks()
                nulls = pc.is_null(v).to_numpy(zero_copy_only=False)
                arr = v.fill_null(0).to_numpy(zero_copy_only=False).astype(np.uint64)
                arr[nulls] = np.uint64(0xFFFFFFFFFFFFFFFF)
            elif pa.types.is_floating(t):
                # Cast to float64 first (float16/32 .view(uint64) raises) and
                # canonicalize -0.0 -> 0.0 (+0.0 == -0.0 but their bit
                # patterns differ, which would route equal keys to different
                # buckets while pandas merge matches them).
                raw = pc.cast(col, pa.float64()).combine_chunks()
                nulls = pc.is_null(raw).to_numpy(zero_copy_only=False)
                f = raw.fill_null(0.0).to_numpy(zero_copy_only=False) + 0.0
                arr = f.view(np.uint64).copy()
                arr[nulls] = np.uint64(0xFFFFFFFFFFFFFFFF)
            else:
                s = col.to_pandas()
                arr = pd.util.hash_pandas_object(s, index=False).to_numpy()
            # xorshift-multiply mix per column, then combine
            arr = arr ^ (arr >> np.uint64(33))
            arr = arr * _MIX
            h = (h ^ arr) * np.uint64(0xC2B2AE3D27D4EB4F)
        h ^= h >> np.uint64(29)
    return h


def bucket_codes(batch: pa.Table, key_cols, num_buckets: int) -> "np.ndarray":
    """int32 bucket ids ``hash(key) % num_buckets`` (vectorized)."""
    return (hash_codes(batch, key_cols) % np.uint64(num_buckets)).astype(np.int32)


def _split_by_part(nparts: int, part_col: str, schema, *blocks):
    """Map side of the task exchange: split blocks into nparts COMPACT
    per-partition tables (``take`` copies fresh buffers — a sliced Arrow
    table would pickle its FULL parent buffers, shipping payload blocks
    ~nparts times through a sort shuffle).

    ``schema``: wire schema used for empty outputs — Ray emits
    ZERO-COLUMN blocks for fully-filtered upstreams, which would
    otherwise strip the reduce fn's expected columns."""
    import pandas as pd

    tabs = [
        pa.Table.from_pandas(b, preserve_index=False) if isinstance(b, pd.DataFrame)
        else b
        for b in blocks
    ]
    tabs = [t for t in tabs if t.num_columns > 0]
    if not tabs:
        if schema is None:
            raise ValueError("all blocks empty and no wire schema provided")
        empty = schema.empty_table()
        return [empty] * nparts if nparts > 1 else empty
    block = pa.concat_tables(tabs, promote_options="permissive") if len(tabs) > 1 else tabs[0]
    empty = block.slice(0, 0).combine_chunks()
    if block.num_rows == 0:
        return [empty] * nparts if nparts > 1 else empty
    import pyarrow.compute as pc

    idx = pc.sort_indices(block, sort_keys=[(part_col, "ascending")])
    s = block.take(idx)
    parts = s[part_col].to_numpy(zero_copy_only=False)
    out = []
    lo = 0
    for pid in range(nparts):
        hi = int(np.searchsorted(parts, pid, side="right"))
        out.append(s.take(pa.array(np.arange(lo, hi))) if hi > lo else empty)
        lo = hi
    return out if nparts > 1 else out[0]


def _reduce_group(fn, part_col: str, *shards):
    tabs = [t for t in shards if t.num_rows > 0]
    group = (
        pa.concat_tables(tabs, promote_options="permissive") if tabs else shards[0]
    )
    if part_col in group.column_names:
        group = group.drop_columns([part_col])
    return fn(group)


def exchange_map_groups(ds, part_col: str, nparts: int, fn, *, schema=None):
    """Payload-safe keyed exchange: ``groupby(part).map_groups(fn)``
    expressed as a manual two-phase task exchange.

    Why not ``ds.groupby(...)``: Ray Data's sort-based shuffle slices
    map blocks per partition, and a sliced Arrow table serializes its
    FULL parent buffers — payload-heavy rows (text/binary columns) ship
    ~nparts times.  Here map tasks split each block bundle into compact
    per-partition tables (one copy), reduce tasks concat + run ``fn``
    per partition, and the results come back as a Dataset via
    ``from_arrow_refs`` (data never leaves the object store).

    ``fn`` must emit a consistent schema (including for empty input).
    ``part_col`` must be an int column in [0, nparts) and is dropped
    before ``fn`` sees the group.
    """
    import ray
    import ray.data as rd

    mds = ds.materialize()
    block_refs = list(mds.to_arrow_refs())
    if schema is None:
        # the dataset is materialized, so its schema is free — and the
        # split tasks need it whenever a bundle holds only empty blocks
        try:
            from .joins import _convert_ray_schema

            s = mds.schema()
            schema = _convert_ray_schema(s) if s is not None else None
        except Exception:
            schema = None
    if not block_refs:
        # no blocks at all (fully-empty upstream): nothing to exchange
        return rd.from_arrow(schema.empty_table() if schema is not None else pa.table({}))
    ncpus = int(ray.cluster_resources().get("CPU", 8))
    nbundles = max(1, min(len(block_refs), ncpus * 2))
    bundles = [block_refs[i::nbundles] for i in range(nbundles)]
    bundles = [b for b in bundles if b]
    split = ray.remote(num_returns=nparts, max_retries=3, retry_exceptions=True)(
        _split_by_part
    )
    split_rows = [split.remote(nparts, part_col, schema, *bundle) for bundle in bundles]
    if nparts == 1:
        split_rows = [[r] for r in split_rows]
    flat = [r for row in split_rows for r in row]
    ray.wait(flat, num_returns=len(flat), fetch_local=False)
    del block_refs, ds

    reduce = ray.remote(max_retries=3, retry_exceptions=True)(_reduce_group)
    out_refs = [
        reduce.remote(fn, part_col, *[row[pid] for row in split_rows])
        for pid in range(nparts)
    ]
    return rd.from_arrow_refs(out_refs)


def _combine_partials(keys: list, aggs: list, *tabs):
    import pandas as pd

    ts = []
    base = None  # first non-zero-column input, for empty-schema derivation
    for t in tabs:
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_columns > 0 and base is None:
            base = t
        if t.num_columns > 0 and t.num_rows > 0:
            ts.append(t)
    if not ts:
        # All inputs empty: normalize to an empty Arrow table carrying the
        # expected keys + output columns (renamed), so downstream tree
        # levels / mean-finishing code see a stable schema instead of a raw
        # zero-column table or pandas DataFrame.
        fields = []
        names = set(base.schema.names) if base is not None else set()
        for k in keys:
            ftype = base.schema.field(k).type if k in names else pa.large_string()
            fields.append(pa.field(k, ftype))
        for c, f, out in aggs:
            if f == "count":
                # a count output is int64 regardless of the source
                # column's type (a string-typed empty count column would
                # poison a later tree level that mixes it with real
                # int64 counts, or reach callers on a fully-empty input)
                fields.append(pa.field(out, pa.int64()))
                continue
            src = c if c in names else (out if out in names else None)
            ftype = base.schema.field(src).type if src is not None else pa.float64()
            fields.append(pa.field(out, ftype))
        return pa.schema(fields).empty_table()
    merged = pa.concat_tables(ts, promote_options="permissive")
    agg = merged.group_by(keys).aggregate([(c, f) for c, f, _ in aggs])
    cols = {k: agg[k] for k in keys}
    for c, f, out in aggs:
        cols[out] = agg[f"{c}_{f}"]
    return pa.table(cols)


def tree_aggregate(ds, keys: list[str], aggs: list[tuple[str, str, str]],
                   *, fanin: int = 64) -> pa.Table:
    """Grouped aggregate of a dataset of SMALL per-block partials WITHOUT
    a shuffle: tree-combine the block refs (Arrow ``group_by`` inside
    remote tasks, fan-in ``fanin`` per level), returning the final table
    to the driver.  ``aggs``: ``(col, arrow_fn, out_name)`` with fn ∈
    {sum, min, max}.  Use when per-block partials are bounded (histogram
    bins, minmax rows) — a ``groupby().aggregate()`` would pay a full
    sort-shuffle with seconds of fixed cost per invocation, and at 10^6
    blocks the tree is O(log_fanin) levels of tiny tasks instead."""
    import ray

    refs = arrow_refs(ds)
    if not refs:
        return pa.table({})
    combine = ray.remote(max_retries=3, retry_exceptions=True)(_combine_partials)
    first = True
    level_aggs = aggs
    while len(refs) > 1 or first:
        refs = [
            combine.remote(keys, level_aggs, *refs[i:i + fanin])
            for i in range(0, len(refs), fanin)
        ]
        first = False
        # level 1 renamed input_col -> out; later levels must aggregate the
        # RENAMED columns or Arrow raises a missing-field error once block
        # count exceeds fanin.  count folds into sum after the first level.
        level_aggs = [
            (out, "sum" if fn == "count" else fn, out) for _, fn, out in aggs
        ]
    return ray.get(refs[0])


def _block_nrows(t) -> int:
    return len(t) if not isinstance(t, pa.Table) else t.num_rows


def _block_with_index(t, col: str, offset: int):
    import pandas as pd

    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False)
    idx = pa.array(np.arange(offset, offset + t.num_rows, dtype=np.int64))
    return t.append_column(col, idx)


def zip_with_index(ds, col: str = "_idx", *, start: int = 0):
    """Assign each row its global position in dataset order as ``col`` —
    the two-pass block-offset scan: pass 1 reads per-block row counts in
    worker tasks (blocks never leave the object store), the driver holds
    only the O(num_blocks) prefix sums, pass 2 appends the index column
    per block.  The distributed alternative to pulling a sorted dataset
    to the driver to enumerate it."""
    import ray
    import ray.data as rd

    refs = arrow_refs(ds)
    if not refs:
        return ds
    nrows = ray.remote(_block_nrows)
    counts = ray.get([nrows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])) + start
    withidx = ray.remote(_block_with_index)
    return rd.from_arrow_refs(
        [withidx.remote(r, col, int(o)) for r, o in zip(refs, offsets)]
    )


def collect_small(ds) -> pa.Table:
    """Materialize a small result Dataset into one Arrow table (skips
    Ray's occasional zero-column empty blocks)."""
    import pandas as pd
    import ray

    blocks = ray.get(arrow_refs(ds))
    tables = []
    for t in blocks:
        if isinstance(t, pd.DataFrame):  # pandas-format blocks pass through
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_columns > 0:
            tables.append(t)
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")
