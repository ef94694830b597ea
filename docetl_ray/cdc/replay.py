"""Single-threaded pure-Python replay oracle (FIXTURES.md F5).

Applies a WAL event stream to an in-memory dict with exactly the engine's
LWW semantics — last writer per url by (warc_ts, lsn), deletes become
tombstones — and returns the golden final state as an Arrow table sorted
by url.  The distributed engine's committed state must match this
byte-for-byte after canonical ordering (BASELINE.json:6).
"""

from __future__ import annotations

import pyarrow as pa

from ..html_text import extract_text_bytes
from ..schemas import OP_DELETE


def replay_oracle(
    events: pa.Table, *, extract: bool = True, include_tombstones: bool = False
) -> pa.Table:
    """Replay events (any order) and return final state sorted by url."""
    extra_cols = [
        c for c in events.column_names
        if c not in ("lsn", "op", "url", "warc_ts", "html", "lang")
    ]
    state: dict[str, dict] = {}
    rows = events.to_pylist()
    rows.sort(key=lambda r: (r["warc_ts"], r["lsn"]))
    for r in rows:
        url = r["url"]
        prev = state.get(url)
        key = (r["warc_ts"], r["lsn"])
        if prev is not None and (prev["warc_ts"], prev["lsn"]) >= key:
            continue
        deleted = r["op"] == OP_DELETE
        rec = {
            "url": url,
            "warc_ts": r["warc_ts"],
            "lsn": r["lsn"],
            "text": None if deleted else (extract_text_bytes(r["html"]) if extract else r.get("text")),
            "lang": None if deleted else r["lang"],
            "_deleted": deleted,
        }
        for c in extra_cols:
            rec[c] = r.get(c)
        state[url] = rec
    out = [v for v in state.values() if include_tombstones or not v["_deleted"]]
    out.sort(key=lambda r: r["url"])
    fields = [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lsn", pa.int64()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("_deleted", pa.bool_()),
    ]
    schema = pa.schema(fields + [events.schema.field(c) for c in extra_cols])
    return pa.Table.from_pylist(out, schema=schema)
