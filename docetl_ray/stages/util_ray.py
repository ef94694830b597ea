"""Ray-side helpers shared by stages."""

from __future__ import annotations

import pyarrow as pa


def collect_small(ds) -> pa.Table:
    """Materialize a small result Dataset into one Arrow table (skips
    Ray's occasional zero-column empty blocks)."""
    import ray

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
    if not tables:
        return pa.table({"id_a": [], "id_b": []})
    return pa.concat_tables(tables, promote_options="permissive")
