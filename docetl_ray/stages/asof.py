"""As-of (temporal) join: match each left row to the LATEST right row
with the same key and ``right.on <= left.on``.

Ray Data has no temporal join; this is the classic CDC/stream enrichment
primitive ("state as of the event's timestamp").  Both sides are
co-partitioned by the ``by`` key through ONE bucketed exchange, then each
bucket runs pandas' C-level ``merge_asof`` — no per-row Python, no
per-key task overhead.  Semantics match DuckDB's
``l ASOF LEFT JOIN r ON l.by = r.by AND l.on >= r.on`` (inclusive), which
is what the oracle checks.

Determinism: multiple right rows sharing one ``(by, on)`` are collapsed
to a single deterministic winner (max over the remaining columns, i.e.
last after a full-column sort) BEFORE matching — DuckDB's ASOF picks an
unspecified row in that case, so oracle-checked pipelines should pre-
dedup the right side the same way.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .util_ray import bucket_codes, exchange_map_groups


def asof_join(
    left,
    right,
    *,
    on: str,
    by: str,
    how: str = "left",
    num_buckets: int = 32,
    salt: int = 1,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """As-of join two Datasets.  ``on``/``by`` must carry the same column
    names on both sides (rename upstream); every other right column must
    not collide with a left column (rename upstream — explicit beats
    implicit suffixing in a lake pipeline).  ``how``: "left" keeps
    unmatched left rows (right columns null), "inner" drops them.

    ``salt`` > 1 is the hot-key mitigation: without it every row of one
    ``by`` key lands in a single task (one host = millions of events in a
    web corpus).  Salting splits the LEFT side of every bucket into
    ``salt`` sub-tasks by a hash of ``on`` and REPLICATES the bucket's
    right side to each — every left row still sees ALL right rows of its
    key, so the backward match is unchanged; only the merge work fans
    out.  Cost: right side shuffled ``salt``x (cheap when the right side
    is bounded state, the CDC-enrichment norm).  Pick salt ~ hot-key
    share x num CPUs; stays exact for any value.
    """
    from .joins import _ds_arrow_schema, _ds_arrow_schema_lazy

    if how not in ("left", "inner"):
        raise ValueError(f"asof_join how={how!r} (want left|inner)")
    l_arrow = left_schema or _ds_arrow_schema_lazy(left)
    r_arrow = right_schema or _ds_arrow_schema_lazy(right)
    if l_arrow is None:
        left = left.materialize()
        l_arrow = _ds_arrow_schema(left)
    if r_arrow is None:
        right = right.materialize()
        r_arrow = _ds_arrow_schema(right)
    rvals = [n for n in r_arrow.names if n not in (on, by)]
    clash = [n for n in rvals if n in l_arrow.names]
    if clash:
        raise ValueError(f"right value columns collide with left: {clash}")
    out_schema = pa.schema(
        list(l_arrow) + [r_arrow.field(n) for n in rvals]
    )
    unified = pa.schema(list(out_schema) + [pa.field("__side", pa.string())])
    left_names = list(l_arrow.names)

    salt = max(1, int(salt))

    def tag(side, names):
        def fn(batch: pa.Table) -> pa.Table:
            import numpy as np
            import pyarrow.compute as pc

            b = bucket_codes(batch, [by], num_buckets)
            arrays = []
            for f in unified:
                if f.name == "__side":
                    arrays.append(pa.array([side] * batch.num_rows, pa.string()))
                elif f.name in names:
                    arrays.append(pc.cast(batch[f.name], f.type))
                else:
                    arrays.append(pa.nulls(batch.num_rows, f.type))
            out = pa.table(dict(zip(unified.names, arrays)))
            if salt == 1:
                return out.append_column("__bucket", pa.array(b, pa.int32()))
            base = np.asarray(b, dtype=np.int64) * salt
            if side == "l":
                # left rows split across salt sub-buckets by an on-hash
                s = np.asarray(bucket_codes(batch, [on], salt), dtype=np.int64)
                return out.append_column(
                    "__bucket", pa.array((base + s).astype(np.int32), pa.int32())
                )
            # right rows replicate into every sub-bucket of their key
            parts = [
                out.append_column(
                    "__bucket", pa.array((base + s).astype(np.int32), pa.int32())
                )
                for s in range(salt)
            ]
            return pa.concat_tables(parts)

        fn.__name__ = f"asof_tag_{side}"
        return fn

    lb = left.map_batches(tag("l", left_names), batch_format="pyarrow")
    rb = right.map_batches(tag("r", [by, on] + rvals), batch_format="pyarrow")

    def join_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lmask = pc.equal(group["__side"], "l")
        l = group.filter(lmask).select(left_names).to_pandas()
        r = group.filter(pc.invert(lmask)).select([by, on] + rvals).to_pandas()
        if len(r):
            # deterministic winner per (by, on): last after full sort
            r = r.sort_values([by, on] + rvals, kind="mergesort")
            r = r.drop_duplicates([by, on], keep="last")
        if len(l) == 0:
            return out_schema.empty_table()
        # SQL comparison semantics: null on-keys never match (a null
        # left key keeps the row unmatched under "left"); merge_asof
        # would instead raise on them
        lnull = l[l[on].isna()]
        l = l[l[on].notna()].sort_values(on, kind="mergesort")
        r = r[r[on].notna()].sort_values(on, kind="mergesort")
        r["__m"] = 1
        out = pd.merge_asof(l, r, on=on, by=by, direction="backward")
        if len(lnull):
            out = pd.concat([out, lnull], ignore_index=True)
        if how == "inner":
            out = out[out["__m"].notna()]
        out = out[out_schema.names]
        return pa.Table.from_pandas(
            out, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    join_bucket.__name__ = "asof_join_bucket"
    unioned = lb.union(rb)
    wire = pa.schema(list(unified) + [pa.field("__bucket", pa.int32())])
    return exchange_map_groups(
        unioned, "__bucket", num_buckets * salt, join_bucket, schema=wire
    )
