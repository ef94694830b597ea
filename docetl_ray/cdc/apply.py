"""The CDC apply layer: WAL events -> keyed shuffle -> LWW upsert ->
staged partition Parquet -> atomic manifest commit.

Pipeline shape (all Ray Data, streaming, zero-copy Arrow batches)::

    events (Dataset)
      | map_batches(partial_apply)      # extract text, drop html, per-batch
      |                                 # LWW winners per url, add part col
      | groupby("part").map_groups(...) # final LWW merge + base-state merge,
      |                                 # write staging parquet, emit lineage
      v
    lineage rows (tiny) -> driver -> LakeTable.commit(epoch, ...)  # atomic

Skew handling: the LWW merge is associative + idempotent, so the
``partial_apply`` stage combines events per url *within each batch before
the shuffle* — a hot url (Zipf head) contributes at most one row per input
batch to the exchange instead of its full event count.  This is the
pre-aggregation analogue of hot-key salting: the "salt" is the batch id,
and the per-partition final merge re-merges the salted partials
deterministically.  Partition count is configurable (``LakeTable.num_partitions``)
for partition splitting when states grow.

Ordering: LWW needs a per-key total order (warc_ts, lsn tiebreak); Ray
Data gives no cross-block order, so every merge sorts its rows by
(url, warc_ts, lsn) explicitly — arrival order is never relied upon.

Mirrors the reference's reduce fold/merge decomposition
(``/root/reference/docetl/operations/reduce.py:466-629``: partial folds,
associative merge) and resolve's per-partition mutable state
(``docetl/operations/resolve.py:441-477``), recast as deterministic
Arrow kernels with tombstone rows for delete propagation.
"""

from __future__ import annotations

import hashlib
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..html_text import extract_text_batch
from ..schemas import OP_DELETE, unify_tables
from .table import LakeTable

STATE_SORT_KEYS = [("url", "ascending")]
_LWW_KEYS = [("url", "ascending"), ("warc_ts", "ascending"), ("lsn", "ascending")]


def url_partition(
    urls: np.ndarray, num_partitions: int, *, version: str = "v2"
) -> np.ndarray:
    """Deterministic hash partition of url strings.

    ``version="v2"`` (default for new tables): vectorized fixed-key C
    siphash via ``pandas.util.hash_pandas_object`` — no per-row Python,
    process- and run-stable.  ``version="crc32"``: the round-1 per-row
    crc32 loop, kept because the partition function is BAKED INTO
    committed manifests (``manifest["partition_hash"]``) — tables created
    before v2 keep routing by crc32 until a ``resplit`` rewrites every
    partition and upgrades the manifest."""
    if version == "crc32":
        return np.fromiter(
            (zlib.crc32(u.encode("utf-8")) % num_partitions for u in urls),
            dtype=np.int32,
            count=len(urls),
        )
    import pandas as pd

    h = pd.util.hash_pandas_object(pd.Series(urls), index=False).to_numpy()
    return (h % np.uint64(num_partitions)).astype(np.int32)


def lww_last_per_url(t: pa.Table) -> pa.Table:
    """Keep the last writer per url: max (warc_ts, lsn).

    Exactly ``last_per_key(t, "url", ["warc_ts", "lsn"])`` — delegated so
    the run-boundary-mask algorithm lives in one place."""
    return last_per_key(t, "url", ["warc_ts", "lsn"])


def events_to_state(batch: pa.Table, *, extract: bool = True) -> pa.Table:
    """Convert raw WAL event rows to state-form rows.

    insert/update -> live row with text extracted from html (byte-stable,
    ``docetl_ray.html_text``); delete -> tombstone row (_deleted=true,
    null text/lang).  ``html`` is dropped immediately after extraction so
    the wide binary column never enters the shuffle (project early).
    """
    if extract and "html" in batch.column_names:
        batch = extract_text_batch(batch)
    deleted = pc.equal(batch["op"], OP_DELETE)
    if "text" in batch.column_names:
        text = pc.if_else(deleted, pa.scalar(None, pa.string()), batch["text"])
        batch = batch.set_column(
            batch.column_names.index("text"), "text", text
        )
    drop = [c for c in ("html", "op") if c in batch.column_names]
    batch = batch.drop_columns(drop)
    return batch.append_column("_deleted", deleted)


def _lww_with_ranges(t: pa.Table) -> pa.Table:
    """LWW winners per url plus exact per-url applied-LSN range columns
    ``_lsn_lo`` / ``_lsn_hi`` (for partition lineage)."""
    n = t.num_rows
    idx = pc.sort_indices(t, sort_keys=_LWW_KEYS)
    t = t.take(idx)
    u = t["url"].to_numpy(zero_copy_only=False)
    last = np.empty(n, dtype=bool)
    last[:-1] = u[1:] != u[:-1]
    last[-1] = True
    starts = np.flatnonzero(np.concatenate(([True], last[:-1])))
    lsn = t["lsn"].to_numpy(zero_copy_only=False)
    lo = np.minimum.reduceat(lsn, starts)
    hi = np.maximum.reduceat(lsn, starts)
    w = t.filter(pa.array(last))
    return w.append_column("_lsn_lo", pa.array(lo, type=pa.int64())).append_column(
        "_lsn_hi", pa.array(hi, type=pa.int64())
    )


def partial_apply(
    batch: pa.Table, *, num_partitions: int, extract: bool = True,
    part_version: str = "v2",
) -> pa.Table:
    """Per-batch combiner: state-form + per-url LWW winner + part column."""
    state = events_to_state(batch, extract=extract)
    if state.num_rows == 0:
        return state.append_column("_lsn_lo", pa.array([], pa.int64())) \
                    .append_column("_lsn_hi", pa.array([], pa.int64())) \
                    .append_column("part", pa.array([], pa.int32()))
    winners = _lww_with_ranges(state)
    part = url_partition(
        winners["url"].to_numpy(zero_copy_only=False), num_partitions,
        version=part_version,
    )
    return winners.append_column("part", pa.array(part, type=pa.int32()))


def last_per_key(t: pa.Table, key_col: str, order_cols: list[str]) -> pa.Table:
    """Generic LWW combine: last row per key by ascending ``order_cols``."""
    n = t.num_rows
    if n <= 1:
        return t
    keys = [(key_col, "ascending")] + [(c, "ascending") for c in order_cols]
    t = t.take(pc.sort_indices(t, sort_keys=keys))
    u = t[key_col].to_numpy(zero_copy_only=False)
    mask = np.empty(n, dtype=bool)
    mask[:-1] = u[1:] != u[:-1]
    mask[-1] = True
    return t.filter(pa.array(mask))


def lww_latest(ds, key_col: str, order_cols):
    """Distributed last-writer-wins: latest row per key ordered by
    ``order_cols`` (ascending; ties -> later element wins).

    Same partial/final decomposition as the CDC apply: per-batch combine
    first (hot keys collapse before the shuffle), then one grouped final
    merge.  SQL oracle: ``QUALIFY row_number() OVER (PARTITION BY key
    ORDER BY o1 DESC, o2 DESC) = 1``.
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    from ..stages.util_ray import bucket_codes

    num_buckets = 32

    def partial(batch: pa.Table) -> pa.Table:
        # strip schema metadata so every batch carries the IDENTICAL
        # schema object (pandas-origin metadata made Ray's schema dedup
        # warn "Failed to hash the schemas" per batch)
        w = last_per_key(batch.replace_schema_metadata(None), key_col, order_cols)
        b = bucket_codes(w, key_col, num_buckets)
        return w.append_column("_kbucket", pa.array(b, pa.int32()))

    def final(group: pa.Table) -> pa.Table:
        # whole-bucket LWW in one vectorized sort+filter — NOT per distinct
        # key: groupby(key).map_groups pays ~ms of task/pandas overhead per
        # key, which dominates on high-cardinality keys
        if "_kbucket" in group.column_names:  # exchange drops it already
            group = group.drop_columns(["_kbucket"])
        return last_per_key(
            group.replace_schema_metadata(None), key_col, order_cols
        )

    final.__name__ = "lww_final"
    pre = ds.map_batches(partial, batch_format="pyarrow")
    # the take()-based task exchange, not ds.groupby: Ray's sort shuffle
    # slices map blocks and sliced Arrow tables pickle their FULL parent
    # buffers, so payload rows would ship ~num_buckets times (the same
    # reason the CDC apply and asof_join use it)
    from ..stages.util_ray import exchange_map_groups

    return exchange_map_groups(pre, "_kbucket", num_buckets, final)


def _atomic_write_parquet(t: pa.Table, path: str):
    """Write-temp + rename so a task killed mid-write never leaves a
    truncated file behind (Ray retries the task; the rename is atomic and
    the rewrite is deterministic, so retries are safe)."""
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def _state_checksum(t: pa.Table) -> str:
    """Order-independent logical checksum of a partition state.

    uint64 sum of vectorized per-row hashes over (url, lsn, warc_ts_us,
    deleted, text-null-flag, text) — deterministic (fixed-key C siphash
    via ``hash_pandas_object``), chunking- and file-format-independent,
    no per-row Python.  Rides the write path of EVERY epoch, so it must
    stay O(columns) vectorized work, not O(rows) interpreter work.
    """
    if t.num_rows == 0:
        return "0"
    import pandas as pd

    df = pd.DataFrame(
        {
            "url": t["url"].to_pandas(),
            "lsn": t["lsn"].to_pandas(),
            "ts": t["warc_ts"].cast(pa.int64()).to_pandas(),
            "dead": t["_deleted"].cast(pa.int8()).to_pandas(),
            "tnull": pc.is_null(t["text"]).cast(pa.int8()).to_pandas(),
            "text": t["text"].to_pandas().fillna(""),
        }
    )
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    with np.errstate(over="ignore"):
        total = int(h.sum(dtype=np.uint64))
    return hashlib.md5(f"{t.num_rows}:{total}".encode()).hexdigest()


_LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("pid", pa.int32()),
        pa.field("path", pa.string()),
        pa.field("rows", pa.int64()),
        pa.field("live_rows", pa.int64()),
        pa.field("lsn_min", pa.int64()),
        pa.field("lsn_max", pa.int64()),
        pa.field("checksum", pa.string()),
        pa.field("append", pa.bool_()),
    ]
)


class _ApplyPartition:
    """Per-partition final merge: staged write + lineage row.

    Used via ``groupby("part").map_groups``; the current-manifest
    partition->file map is broadcast once via ``ray.put`` and read
    zero-copy in each task (no per-batch reshipping).
    """

    __name__ = "apply_partition"

    def __init__(self, manifest_ref, table_root: str, epoch: int, mode: str = "merge"):
        self._ref = manifest_ref
        self.root = table_root
        self.epoch = epoch
        self.mode = mode
        self._map = None

    def __call__(self, group: pa.Table) -> pa.Table:
        import ray

        if self._map is None:
            self._map = ray.get(self._ref) if not isinstance(self._ref, dict) else self._ref
        pid = int(group["part"][0].as_py())
        lsn_min = pc.min(group["_lsn_lo"]).as_py()
        lsn_max = pc.max(group["_lsn_hi"]).as_py()
        winners = lww_last_per_url(
            group.drop_columns(["part", "_lsn_lo", "_lsn_hi"])
        )

        if self.mode == "delta":
            # LSM path: write only this epoch's winners; base untouched.
            merged = winners.sort_by(STATE_SORT_KEYS)
            append = True
        else:
            base_paths = self._map.get(pid) or []
            if base_paths:
                bases = [pq.read_table(p) for p in base_paths]
                merged = lww_last_per_url(unify_tables(bases + [winners]))
            else:
                merged = winners
            merged = merged.sort_by(STATE_SORT_KEYS)
            append = False

        staging_dir = os.path.join(self.root, "epochs", f"epoch-{self.epoch:07d}")
        os.makedirs(staging_dir, exist_ok=True)
        fname = f"part-{pid:05d}.parquet"
        out = os.path.join(staging_dir, fname)
        _atomic_write_parquet(merged, out)

        live = int(pc.sum(pc.cast(pc.invert(merged["_deleted"]), pa.int64())).as_py() or 0)
        rel = os.path.join("epochs", f"epoch-{self.epoch:07d}", fname)
        return pa.Table.from_pylist(
            [
                {
                    "pid": pid,
                    "path": rel,
                    "rows": merged.num_rows,
                    "live_rows": live,
                    "lsn_min": lsn_min,
                    "lsn_max": lsn_max,
                    "checksum": _state_checksum(merged),
                    "append": append,
                }
            ],
            schema=_LINEAGE_SCHEMA,
        )


def _split_block(nparts: int, *blocks):
    """Map side of the manual hash exchange: split a bundle of blocks into
    nparts COMPACT per-partition tables.

    Compactness matters: a sliced Arrow table pickles its FULL parent
    buffers (measured: a 100-row slice of a 10 MB block serializes as
    10 MB), which makes slice-based shuffles ship each block ~nparts
    times — the reason Ray Data's sort shuffle degraded superlinearly on
    payload-heavy rows here.  ``take`` materializes fresh buffers, so
    each row is copied exactly once.
    """
    import pandas as pd

    blocks = [
        pa.Table.from_pandas(b, preserve_index=False) if isinstance(b, pd.DataFrame) else b
        for b in blocks
    ]
    # Ray emits ZERO-COLUMN blocks for fully-filtered upstreams; mixing
    # one into the unify would strip the bundle's schema (same defense
    # as util_ray._split_by_part)
    nonzero = [b for b in blocks if b.num_columns > 0]
    if nonzero:
        blocks = nonzero
    block = unify_tables(blocks) if len(blocks) > 1 else blocks[0]
    n = block.num_rows
    empty = block.slice(0, 0).combine_chunks()
    if n == 0:
        return [empty] * nparts if nparts > 1 else empty
    idx = pc.sort_indices(block, sort_keys=[("part", "ascending")])
    s = block.take(idx)
    parts = s["part"].to_numpy(zero_copy_only=False)
    out = []
    lo = 0
    for pid in range(nparts):
        hi = int(np.searchsorted(parts, pid, side="right"))
        if hi > lo:
            out.append(s.take(pa.array(np.arange(lo, hi))))
        else:
            out.append(empty)
        lo = hi
    return out if nparts > 1 else out[0]


def _reduce_partition(apply_obj, *shards):
    """Reduce side: concat this partition's shards and run the merge."""
    tables = [t for t in shards if t.num_rows > 0]
    if not tables:
        return None
    group = unify_tables(tables)
    return apply_obj(group).to_pylist()[0]


def _exchange_and_apply(partial_ds, nparts: int, apply_obj) -> list[dict]:
    """Manual two-phase hash exchange (map: split by part; reduce: merge).

    Used instead of ``groupby().map_groups`` for the apply because Ray
    Data's sort-based shuffle ships payload-heavy blocks superlinearly
    (see ``_split_block``).  Data crosses the object store exactly once;
    map inputs are released before the reduce phase starts (bounded peak
    memory ~2x the combined winners)."""
    import ray

    ncpus = int(ray.cluster_resources().get("CPU", 8))
    # tasks are deterministic + idempotent (atomic file writes), so
    # retrying application exceptions is safe; covers transient fs/oom
    # hiccups in addition to Ray's default worker-crash retries
    split = ray.remote(num_returns=nparts, max_retries=3, retry_exceptions=True)(
        _split_block
    )
    # STREAM the map stage: launch a split task per accumulated chunk of
    # map output as blocks arrive, so split overlaps map execution
    # instead of waiting behind a full to_arrow_refs materialization
    # (measured: map 34s + split 37s sequential at 10M events).  The
    # chunk target starts small (parallelism for small epochs) and
    # doubles every 2*ncpus launches so driver-side ref count stays
    # ~O(nparts * ncpus * log(epoch_bytes)) — 33k flat refs at 256
    # blocks x 128 parts was a fixed ~seconds of coordination.
    split_rows: list = []
    acc: list = []
    acc_bytes = 0
    target = 32 << 20

    def flush():
        nonlocal acc, acc_bytes, target
        if not acc:
            return
        r = split.remote(nparts, *acc)
        split_rows.append(r if nparts > 1 else [r])
        acc, acc_bytes = [], 0
        if len(split_rows) % (ncpus * 2) == 0:
            target *= 2

    # accumulate PER BLOCK, not per bundle: a materialized upstream can
    # deliver the whole dataset as one ref bundle, and packing it into a
    # single split task overflows Arrow's int32 string offsets (>2 GiB
    # concat) besides serializing the split phase
    for bundle in partial_ds.iter_internal_ref_bundles():
        metas = getattr(bundle, "metadata", None) or [None] * len(bundle.block_refs)
        for block_ref, meta in zip(bundle.block_refs, metas):
            acc.append(block_ref)
            sz = getattr(meta, "size_bytes", None) if meta is not None else None
            acc_bytes += sz if sz else (8 << 20)  # unknown -> assume 8 MB
            if acc_bytes >= target:
                flush()
    flush()
    # wait for the split phase, then drop map inputs before reducing
    # (bounds peak object-store footprint to ~2x the combined winners)
    flat = [r for row in split_rows for r in row]
    ray.wait(flat, num_returns=len(flat), fetch_local=False)
    del partial_ds

    reduce = ray.remote(max_retries=3, retry_exceptions=True)(_reduce_partition)
    lineage_refs = [
        reduce.remote(apply_obj, *[row[pid] for row in split_rows])
        for pid in range(nparts)
    ]
    return [r for r in ray.get(lineage_refs) if r is not None]


AUTO_COMPACT_LEVELS = 4


def apply_events(
    table: LakeTable, events, epoch: int, *, extract: bool = True,
    mode: str = "merge", compact_after: int | None | str = "auto",
    exchange: str = "tasks",
) -> dict:
    """Apply one WAL segment (a Dataset of event rows) as one epoch.

    ``mode="merge"`` (copy-on-write): each partition's full state is
    rewritten per epoch — O(state) per epoch, single file per partition.
    ``mode="delta"`` (LSM / RocksDB-like): only the epoch's winners are
    written and stacked as a new level — O(epoch) per epoch; reads merge
    levels by LWW and ``compact()`` folds levels back to one file.
    ``compact_after``: in delta mode, auto-compact partitions whose level
    count exceeds this (``"auto"`` = ``AUTO_COMPACT_LEVELS``; ``None``/0
    disables), so read-side level-merge cost stays bounded without
    manual ``compact()`` calls — the 50M-event table read 99 s with 4
    stacked levels vs 5.6 s after one compact.

    Exactly-once: if ``epoch`` is already committed this is a no-op; a
    crash before commit leaves the previous manifest state; re-applying
    duplicate events is idempotent under LWW.  Returns the new manifest.
    """
    import ray

    if compact_after == "auto":
        compact_after = AUTO_COMPACT_LEVELS

    if epoch in table.committed_epochs():
        return table.manifest()

    nparts = table.num_partitions
    part_map = table.partition_map()
    ref = ray.put(part_map)

    import time

    t0 = time.perf_counter()
    partial_ds = events.map_batches(
        partial_apply,
        batch_format="pyarrow",
        fn_kwargs={
            "num_partitions": nparts,
            "extract": extract,
            # the routing hash is pinned per table in the manifest;
            # pre-v2 tables keep crc32 until a resplit upgrades them
            "part_version": table.partition_hash,
        },
    )
    applier = _ApplyPartition(ref, table.root, epoch, mode)
    if exchange == "tasks":
        lineage = _exchange_and_apply(partial_ds, nparts, applier)
    else:
        # Dataset-native fallback: coalesce map blocks + bound the reduce
        # side (Ray's sort shuffle cost grows with blocks x partitions)
        lineage = (
            partial_ds.repartition(nparts)
            .groupby("part", num_partitions=nparts)
            .map_groups(applier, batch_format="pyarrow")
            .take_all()
        )
    metrics = {
        "wall_sec": round(time.perf_counter() - t0, 3),
        "mode": mode,
        "partitions_touched": len(lineage),
        "rows_written": int(sum(r["rows"] for r in lineage)),
        "live_rows_written": int(sum(r["live_rows"] for r in lineage)),
    }
    m = table.commit(epoch, lineage, metrics=metrics)
    if mode == "delta" and compact_after:
        over = [
            pid for pid, paths in table.partition_map().items()
            if len(paths) > compact_after
        ]
        if over:
            # tiered: each trigger folds only the delta levels (~O(recent
            # epochs) write cost), going full only when the folded middle
            # run has grown to rival the base
            m = compact(table, tag=f"auto-epoch-{epoch}", pids=over,
                        policy="tiered")
    return m


class _ResplitPartition:
    """Reduce side of a table repartition: merge a new partition's rows,
    write its file, emit a lineage row (same contract as
    ``_ApplyPartition`` so ``_exchange_and_apply`` can drive it)."""

    __name__ = "resplit_partition"

    def __init__(self, table_root: str, tag: str):
        self.root = table_root
        self.tag = tag

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = int(group["part"][0].as_py())
        merged = lww_last_per_url(group.drop_columns(["part"])).sort_by(
            STATE_SORT_KEYS
        )
        out_dir = os.path.join(self.root, "resplits", self.tag)
        os.makedirs(out_dir, exist_ok=True)
        fname = f"part-{pid:05d}.parquet"
        _atomic_write_parquet(merged, os.path.join(out_dir, fname))
        live = int(pc.sum(pc.cast(pc.invert(merged["_deleted"]), pa.int64())).as_py() or 0)
        return pa.Table.from_pylist(
            [
                {
                    "pid": pid,
                    "path": os.path.join("resplits", self.tag, fname),
                    "rows": merged.num_rows,
                    "live_rows": live,
                    "lsn_min": pc.min(merged["lsn"]).as_py(),
                    "lsn_max": pc.max(merged["lsn"]).as_py(),
                    "checksum": _state_checksum(merged),
                    "append": False,
                }
            ],
            schema=_LINEAGE_SCHEMA,
        )


def resplit(table: LakeTable, new_num_partitions: int, *, tag: str) -> dict:
    """Repartition the table to ``new_num_partitions`` — the explicit
    partition-splitting lever for when per-partition states outgrow a
    worker (or merging when they shrink).

    One exchange: current state (tombstones INCLUDED — delete suppression
    must survive the move) re-routes by ``crc32(url) % M`` through the
    same compact two-phase task exchange as the apply path, each new
    partition writes one file under ``resplits/<tag>/``, and
    ``commit_resplit`` swaps the whole partition map + partition count in
    one atomic manifest write.  Subsequent ``apply_events`` calls pick up
    the new count from the manifest (``LakeTable.manifest`` syncs
    ``num_partitions``).  Idempotent per ``tag``; a crash before commit
    leaves the old layout live."""
    if tag in table.manifest().get("resplits", []):
        return table.manifest()

    ds = read_state(table, include_tombstones=True)

    def add_part(batch: pa.Table) -> pa.Table:
        # resplit rewrites every partition, so it always routes with the
        # current (v2) hash and upgrades manifest["partition_hash"]
        part = url_partition(
            batch["url"].to_numpy(zero_copy_only=False), new_num_partitions,
            version="v2",
        )
        return batch.append_column("part", pa.array(part, pa.int32()))

    partial = ds.map_batches(add_part, batch_format="pyarrow")
    writer = _ResplitPartition(table.root, tag)
    recs = _exchange_and_apply(partial, new_num_partitions, writer)
    return table.commit_resplit(tag, new_num_partitions, recs)


def compact(
    table: LakeTable, *, tag: str, pids: list[int] | None = None,
    drop_tombstones_below_lsn: int | None = None, policy: str = "full",
) -> dict:
    """Fold a partition's delta levels (LSM compaction).

    ``policy="full"`` folds every level into one file.  ``"tiered"``
    bounds write amplification: the partition's LARGEST file (the base
    run) is left untouched and only the smaller delta levels fold into
    one middle run — unless the deltas together already rival the base
    (>= half its size), in which case the fold goes full.  A partial
    LWW fold is safe because last-writer-wins is associative and
    commutative per key ((warc_ts, lsn) max): the subset's winner stays
    the partition's candidate and subset losers can never win globally.
    Without this, an auto-compacting table rewrites its ENTIRE state
    every K epochs — O(state) write cost per trigger, unbounded as
    state grows; tiered keeps each trigger ~O(recent deltas).

    Tombstones are RETAINED by default: a delete must keep suppressing
    older out-of-order events until the WAL guarantees none older can
    still arrive.  ``drop_tombstones_below_lsn`` is that guarantee made
    explicit — a retention watermark: tombstones with ``lsn <`` it are
    garbage-collected (the caller asserts the WAL will never replay an
    event with a smaller lsn for those keys).  GC is only sound when
    EVERY level folds (a GC'd tombstone would resurrect an older live
    row in an untouched level), so a watermark forces full folds.
    Idempotent per ``tag``; distributed one task per partition."""
    import ray.data as rd

    # committed-tag re-runs must return BEFORE any file IO: merge_one
    # writes into compactions/<tag>/, and after the first commit those
    # paths are live manifest levels — a re-run that re-merged (now with
    # freshly stacked deltas) would overwrite a live file while
    # commit_compaction's replay guard discards the new records, leaving
    # the manifest checksum pointing at content that no longer exists.
    if tag in table.manifest(refresh=True).get("compactions", []):
        return table.manifest()

    if drop_tombstones_below_lsn is not None:
        policy = "full"
    pmap = table.partition_map()
    # plain compaction only folds stacked levels (len > 1); a GC
    # watermark must ALSO rewrite single-level partitions — their
    # tombstones below the watermark would otherwise be retained
    # forever with no signal (the docstring promises the watermark
    # forces full folds everywhere it applies)
    min_levels = 1 if drop_tombstones_below_lsn is not None else 2
    todo = [
        {"pid": pid, "paths": paths}
        for pid, paths in sorted(pmap.items())
        if (pids is None or pid in pids) and len(paths) >= min_levels
    ]
    if not todo:
        return table.manifest()

    root = table.root
    cdir = os.path.join("compactions", tag)

    def merge_one(batch: pa.Table) -> pa.Table:
        out_rows = []
        for row in batch.to_pylist():
            pid = int(row["pid"])
            paths = list(row["paths"])
            kept: list[str] = []
            if policy == "tiered":
                sizes = [os.path.getsize(p) for p in paths]
                # partial fold ONLY when the OLDEST level (the base run,
                # paths[0]) dominates: keeping any newer level would
                # break the manifest's oldest->newest path order and the
                # newest-level checksum contract (table.py:28-35).  A
                # bulk delta that outgrew the base escalates to a full
                # fold instead — one exact rewrite, after which it IS
                # the base.  Deltas strictly below half the base ->
                # partial fold; >= half -> full fold (2x keeps the
                # comparison integer-exact, no floor drift at odd sizes)
                if 2 * (sum(sizes) - sizes[0]) < sizes[0]:
                    kept = [paths[0]]
                    paths = paths[1:]
            tables = [pq.read_table(p) for p in paths]
            merged = lww_last_per_url(unify_tables(tables)).sort_by(STATE_SORT_KEYS)
            if drop_tombstones_below_lsn is not None:
                gc_mask = pc.and_(
                    merged["_deleted"],
                    pc.less(merged["lsn"], drop_tombstones_below_lsn),
                )
                merged = merged.filter(pc.invert(gc_mask))
            os.makedirs(os.path.join(root, cdir), exist_ok=True)
            fname = f"part-{pid:05d}.parquet"
            _atomic_write_parquet(merged, os.path.join(root, cdir, fname))
            live = int(pc.sum(pc.cast(pc.invert(merged["_deleted"]), pa.int64())).as_py() or 0)
            # kept-base contribution from the parquet footer only (no
            # column scan — tiered exists to keep each trigger O(recent
            # deltas)): physical rows bound live rows, and a base row
            # superseded in the middle run counts in both anyway, so
            # live_rows is a documented UPPER BOUND on logical live rows
            # after a tiered fold (exact needs the O(state) full fold).
            kept_rows = sum(pq.read_metadata(p).num_rows for p in kept)
            live += kept_rows
            out_rows.append(
                {
                    "pid": pid,
                    "path": os.path.join(cdir, fname),
                    "rows": merged.num_rows + kept_rows,
                    "live_rows": live,
                    # newest-level checksum — same contract delta-mode
                    # commits already use for multi-level partitions
                    # (table.py commit()): deterministic per fold
                    # schedule, detects middle-run corruption.
                    "checksum": _state_checksum(merged),
                    "kept_paths": [os.path.relpath(p, root) for p in kept],
                }
            )
        return pa.Table.from_pylist(out_rows)

    recs = (
        rd.from_items(todo)
        .map_batches(merge_one, batch_size=1, batch_format="pyarrow")
        .take_all()
    )
    return table.commit_compaction(tag, recs)


def read_state(table: LakeTable, *, include_tombstones: bool = False):
    """Current committed table state as a Ray Dataset.

    Merge-mode partitions (one file) stream straight from parquet; delta
    partitions merge their level files by LWW inside the read task (one
    task per partition — merge-on-read), so readers always see exactly
    the last-writer row per url regardless of how many epochs are
    stacked."""
    import ray.data as rd

    pmap = table.partition_map()
    if not pmap:
        return rd.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "warc_ts": pa.array([], pa.timestamp("us")),
                    "lsn": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "_deleted": pa.array([], pa.bool_()),
                }
            )
        )
    multi = {pid: paths for pid, paths in pmap.items() if len(paths) > 1}
    single = [paths[0] for pid, paths in pmap.items() if len(paths) == 1]

    parts = []
    if single:
        parts.append(rd.read_parquet(single))
    if multi:

        def merge_read(batch: pa.Table) -> pa.Table:
            tables = []
            for row in batch.to_pylist():
                merged = lww_last_per_url(
                    unify_tables([pq.read_table(p) for p in row["paths"]])
                )
                tables.append(merged)
            return unify_tables(tables)

        parts.append(
            rd.from_items([{"pid": pid, "paths": paths} for pid, paths in sorted(multi.items())])
            .map_batches(merge_read, batch_size=1, batch_format="pyarrow")
        )
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    if not include_tombstones:
        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(t["_deleted"])), batch_format="pyarrow"
        )
    return ds
