"""Ray-side helpers shared by stages."""

from __future__ import annotations

import pyarrow as pa


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
