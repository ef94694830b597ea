"""Ray-side helpers shared by stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


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
                raw = col.combine_chunks()
                nulls = pc.is_null(raw).to_numpy(zero_copy_only=False)
                arr = raw.fill_null(0.0).to_numpy(zero_copy_only=False).view(np.uint64).copy()
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


def collect_small(ds) -> pa.Table:
    """Materialize a small result Dataset into one Arrow table (skips
    Ray's occasional zero-column empty blocks)."""
    import pandas as pd
    import ray

    blocks = ray.get(ds.to_arrow_refs())
    tables = []
    for t in blocks:
        if isinstance(t, pd.DataFrame):  # pandas-format blocks pass through
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_columns > 0:
            tables.append(t)
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")
