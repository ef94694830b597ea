"""Grouped / global aggregation stages: docetl ``reduce`` / ``code_reduce``
parity (SURVEY.md §2.1, §2.5), built scale-first.

``grouped_aggregate`` is the workhorse: it pre-aggregates *inside each
batch* with Arrow's hash kernels (``Table.group_by``) and only shuffles the
tiny per-batch partials — the combiner/partial-final decomposition the
reference expresses as fold (partial) + merge (final) prompts with
``associative: true`` (``/root/reference/docetl/operations/reduce.py:324-338,
466-629``).  A hot key contributes one partial row per batch, so Zipf skew
never concentrates raw rows on one reducer.

``code_reduce`` mirrors the reference's arbitrary-group UDF path
(``code_operations.py:76-163``): full groups via ``groupby().map_groups``
(a real shuffle — use only when the aggregate isn't decomposable), with
``pass_through`` extras taken from the first group row
(``reduce.py:349-357``) and the ``_counts_prereduce`` metadata column
(``reduce.py:343``).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

#: agg spec: (in_col, fn, out_name); fn ∈ sum,count,min,max,mean
_PARTIAL_FNS = {"sum", "count", "min", "max", "mean"}


def _partial_exprs(aggs):
    """Arrow group_by agg list for the partial pass (mean -> sum+count)."""
    cols = []
    for in_col, fn, out in aggs:
        if fn == "mean":
            cols.append((in_col, "sum", f"__{out}_sum"))
            cols.append((in_col, "count", f"__{out}_cnt"))
        elif fn == "count":
            cols.append((in_col, "count", f"__{out}_cnt"))
        else:
            cols.append((in_col, fn, f"__{out}_{fn}"))
    return cols


def grouped_aggregate(ds, keys: list[str], aggs: list[tuple[str, str, str]],
                      *, combine: str = "shuffle"):
    """Hash-grouped aggregate with per-batch partial combine.

    ``aggs``: list of ``(input_col, fn, output_name)`` with
    fn ∈ {sum,count,min,max,mean}.  Returns a Dataset with columns
    ``keys + [output_name...]``.

    ``combine="shuffle"`` (default) merges partials through Ray's
    ``groupby().aggregate()`` — right when the GROUP CARDINALITY itself
    is large (the result must stay distributed).  ``combine="tree"``
    merges them through a shuffle-free task tree
    (``util_ray.tree_aggregate``) — right when groups are few (keys ×
    aggregates fits one block: pricing flags, windows, hourly rollups),
    where the sort-shuffle's seconds of fixed cost dominate.
    """
    from ray.data.aggregate import Max, Min, Sum

    for _, fn, _ in aggs:
        if fn not in _PARTIAL_FNS:
            raise ValueError(f"non-decomposable agg {fn}; use code_reduce")

    partials = _partial_exprs(aggs)

    def partial(batch: pa.Table) -> pa.Table:
        uniq = sorted({(c, f) for c, f, _ in partials})
        agg = batch.group_by(keys).aggregate(uniq)
        # arrow names results "{col}_{fn}"; fan out to our partial names
        # (the same (col, fn) may feed several outputs, e.g. sum and mean)
        cols = {k: agg[k] for k in keys}
        for c, f, name in partials:
            cols[name] = agg[f"{c}_{f}"]
        return pa.table(cols)

    partial_ds = ds.map_batches(partial, batch_format="pyarrow")

    if combine == "tree":
        import ray.data as rd

        from .util_ray import tree_aggregate

        tree_aggs = []
        for _, fn, out in aggs:
            if fn == "mean":
                tree_aggs.append((f"__{out}_sum", "sum", f"__{out}_sum_f"))
                tree_aggs.append((f"__{out}_cnt", "sum", f"__{out}_cnt_f"))
            elif fn in ("sum", "count"):
                suffix = "sum" if fn == "sum" else "cnt"
                tree_aggs.append((f"__{out}_{suffix}", "sum", out))
            else:
                tree_aggs.append((f"__{out}_{fn}", fn, out))
        merged = tree_aggregate(partial_ds, keys, tree_aggs)
        import pyarrow.compute as pc

        for _, fn, out in aggs:
            if fn == "mean":
                mean = pc.divide(
                    pc.cast(merged[f"__{out}_sum_f"], pa.float64()),
                    pc.cast(merged[f"__{out}_cnt_f"], pa.float64()),
                )
                merged = merged.append_column(out, mean).drop_columns(
                    [f"__{out}_sum_f", f"__{out}_cnt_f"]
                )
        return rd.from_arrow(merged)

    final_aggs = []
    for _, fn, out in aggs:
        if fn == "mean":
            final_aggs.append(Sum(f"__{out}_sum", alias_name=f"__{out}_sum_f"))
            final_aggs.append(Sum(f"__{out}_cnt", alias_name=f"__{out}_cnt_f"))
        elif fn in ("sum", "count"):
            suffix = "sum" if fn == "sum" else "cnt"
            final_aggs.append(Sum(f"__{out}_{suffix}", alias_name=out))
        elif fn == "min":
            final_aggs.append(Min(f"__{out}_min", alias_name=out))
        elif fn == "max":
            final_aggs.append(Max(f"__{out}_max", alias_name=out))
    reduced = partial_ds.groupby(keys).aggregate(*final_aggs)

    mean_outs = [out for _, fn, out in aggs if fn == "mean"]
    if mean_outs:
        import pyarrow.compute as pc

        def finish(batch: pa.Table) -> pa.Table:
            for out in mean_outs:
                mean = pc.divide(
                    pc.cast(batch[f"__{out}_sum_f"], pa.float64()),
                    pc.cast(batch[f"__{out}_cnt_f"], pa.float64()),
                )
                batch = batch.append_column(out, mean)
            return batch.drop_columns(
                [c for out in mean_outs for c in (f"__{out}_sum_f", f"__{out}_cnt_f")]
            )

        reduced = reduced.map_batches(finish, batch_format="pyarrow")
    return reduced


def global_aggregate(ds, aggs: list[tuple[str, str, str]]) -> dict:
    """Global (``reduce_key: "_all"``) aggregate -> one dict on the driver.

    Decomposes the same way (per-batch partials, tiny final merge)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        row = {}
        for in_col, fn, out in aggs:
            if fn == "mean":
                row[f"__{out}_sum"] = [pc.sum(batch[in_col]).as_py() or 0]
                row[f"__{out}_cnt"] = [batch[in_col].length() - batch[in_col].null_count]
            elif fn == "count":
                row[f"__{out}_cnt"] = [batch[in_col].length() - batch[in_col].null_count]
            elif fn == "sum":
                row[f"__{out}_sum"] = [pc.sum(batch[in_col]).as_py() or 0]
            else:
                row[f"__{out}_{fn}"] = [getattr(pc, fn)(batch[in_col]).as_py()]
        return pa.table(row)

    parts = pa.concat_tables(
        [b for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )],
        promote_options="permissive",
    )
    out = {}
    for in_col, fn, name in aggs:
        if fn == "sum":
            out[name] = pc.sum(parts[f"__{name}_sum"]).as_py()
        elif fn == "count":
            out[name] = pc.sum(parts[f"__{name}_cnt"]).as_py()
        elif fn == "mean":
            s = pc.sum(parts[f"__{name}_sum"]).as_py()
            c = pc.sum(parts[f"__{name}_cnt"]).as_py()
            out[name] = (s / c) if c else None
        elif fn == "min":
            out[name] = pc.min(parts[f"__{name}_min"]).as_py()
        elif fn == "max":
            out[name] = pc.max(parts[f"__{name}_max"]).as_py()
    return out


def code_reduce(
    ds,
    keys: list[str],
    group_fn: Callable[[pa.Table], dict],
    *,
    pass_through: bool = False,
    counts_column: str | None = None,
    lineage_keys: list[str] | None = None,
    lineage_column: str | None = None,
):
    """Arbitrary per-group UDF reduce (full shuffle — non-decomposable path).

    ``group_fn(group_table) -> dict`` of output values; the group keys are
    echoed into the output row.  ``pass_through`` copies non-key extras
    from the first group row; ``counts_column`` emits the group size;
    ``lineage_keys`` emits ``lineage_column`` as the list of key-subdicts
    of every group member (reference ``{op}_lineage``, reduce.py:359-368).
    """

    import pandas as pd

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        row = {k: g[k].iloc[0] for k in keys}
        if pass_through:
            for c in g.columns:
                if c not in keys:
                    row.setdefault(c, g[c].iloc[0])
        if counts_column:
            row[counts_column] = len(g)
        if lineage_keys:
            row[lineage_column or "reduce_lineage"] = [
                dict(zip(lineage_keys, vals))
                for vals in g[lineage_keys].itertuples(index=False)
            ]
        row.update(group_fn(pa.Table.from_pandas(g, preserve_index=False)))
        return pd.DataFrame([row])

    from .grouped import grouped_map

    # bucketed grouped execution: high-cardinality reduce keys would pay
    # per-key task overhead under plain groupby().map_groups
    return grouped_map(ds, keys, fn)
