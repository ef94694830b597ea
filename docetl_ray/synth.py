"""Deterministic synthetic pages + WAL generator (FIXTURES.md F1/F2/F3).

Everything is a pure function of the absolute row index — no wall clock,
no ``uuid4``, no salted ``hash()`` — so generation is identical regardless
of chunking, process, or parallelism.  Large volumes are generated
distributed via ``ray.data.range(n).map_batches(...)``.

The ``text`` column of pages is the golden output of
``docetl_ray.html_text.extract_text_bytes`` over ``html`` (byte-identity
oracle, BASELINE.json:15).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .html_text import extract_text_bytes
from .schemas import OP_DELETE, OP_INSERT, OP_UPDATE

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_SYL = ["ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
        "po", "qua", "ri", "so", "tu", "ve", "wi", "xo", "yu", "zen"]
#: fixed 1000-word vocabulary, deterministic
WORDS = np.array(
    ["".join((_SYL[(i // 100) % 20], _SYL[(i // 10) % 20], _SYL[i % 20])) for i in range(1000)],
    dtype=object,
)

LANGS = ["en", "de", "fr", "es", "zh"]

_MIX = np.uint64(2654435761)
_MASK32 = np.uint64(0xFFFFFFFF)


def _h32(x: np.ndarray, salt: int = 0) -> np.ndarray:
    """Vectorized deterministic 32-bit mix of int64 indices."""
    v = x.astype(np.uint64) + np.uint64(salt) * np.uint64(0x9E3779B9)
    v = (v * _MIX) & _MASK32
    v ^= v >> np.uint64(16)
    v = (v * np.uint64(0x85EBCA6B)) & _MASK32
    v ^= v >> np.uint64(13)
    return v


def body_text(i: int) -> str:
    """Seeded token sequence for row i: 50 + (i % 200) vocabulary words."""
    n = 50 + (i % 200)
    j = np.arange(n, dtype=np.int64)
    idx = ((i * 1_000_003 + j * 7_919) % 1000).astype(np.int64)
    return " ".join(WORDS[idx])


def _html_for(i: int) -> bytes:
    return (
        b"<html><head><title>T%d</title></head><body><p>" % i
        + body_text(i).encode("utf-8")
        + b"</p></body></html>"
    )


def _url_for(idx: np.ndarray) -> np.ndarray:
    """F1 url rule: 97 sites, ~0.1%% hot key for skew testing."""
    out = np.empty(len(idx), dtype=object)
    hot = idx % 1000 == 0
    for k, i in enumerate(idx):
        if hot[k]:
            out[k] = "https://hot.example/"
        else:
            out[k] = f"https://site{i % 97}.example/path/{i}"
    return out


def pages_table(start: int, n: int) -> pa.Table:
    """Generate pages[start : start+n) as an Arrow table (F1)."""
    return pages_for_indices(np.arange(start, start + n, dtype=np.int64))


def pages_for_indices(idx: np.ndarray) -> pa.Table:
    """Pages rows for an arbitrary array of absolute indices (F1)."""
    html = [_html_for(int(i)) for i in idx]
    text = [extract_text_bytes(h) for h in html]
    return pa.table(
        {
            "url": pa.array(_url_for(idx), type=pa.string()),
            "warc_ts": pa.array(BASE_TS_US + idx * 13_000_000, type=pa.timestamp("us")),
            "html": pa.array(html, type=pa.binary()),
            "text": pa.array(text, type=pa.string()),
            "lang": pa.array([LANGS[int(i) % 5] for i in idx], type=pa.string()),
        }
    )


def events_table(start: int, n: int, *, v2: bool = False) -> pa.Table:
    """Generate WAL events[start : start+n) as an Arrow table (F2/F3).

    op mix: insert 60% / update 30% / delete 10% (by index hash).
    updates/deletes target *earlier* page indices, skewed toward low
    indices (hot urls); ~5% of events carry an out-of-order timestamp.
    ``v2`` adds ``fetch_status:int32`` and ``content_length:int64``.
    """
    return events_for_indices(np.arange(start, start + n, dtype=np.int64), v2=v2)


def events_for_indices(lsn: np.ndarray, *, v2: bool = False) -> pa.Table:
    """WAL events for an arbitrary array of LSNs (pure function of lsn)."""
    h = _h32(lsn, 1)
    opsel = h % np.uint64(10)
    ops = np.where(opsel < 6, OP_INSERT, np.where(opsel < 9, OP_UPDATE, OP_DELETE))

    # page index each event refers to: inserts address their own index;
    # updates/deletes address an earlier index with cubic bias toward 0.
    u = (_h32(lsn, 2).astype(np.float64) / 2**32) ** 3
    prior = np.maximum(lsn, 1)
    target = np.where(opsel < 6, lsn, (u * prior).astype(np.int64))

    # ~5% out-of-order timestamps (earlier than already-applied events)
    ooo = _h32(lsn, 3) % np.uint64(20) == 0
    ts = BASE_TS_US + lsn * 1_000_000
    ts = np.where(ooo & (lsn > 5000), ts - 5_000_500_000, ts)

    is_del = ops == OP_DELETE
    html: list[bytes | None] = [
        None if is_del[k] else _html_for(int(t)) + b"<p>v" + str(int(l)).encode() + b"</p>"
        for k, (t, l) in enumerate(zip(target, lsn))
    ]
    lang = [None if is_del[k] else LANGS[int(t) % 5] for k, t in enumerate(target)]

    cols = {
        "lsn": pa.array(lsn, type=pa.int64()),
        "op": pa.array(ops, type=pa.string()),
        "url": pa.array(_url_for(target), type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": pa.array(html, type=pa.binary()),
        "lang": pa.array(lang, type=pa.string()),
    }
    if v2:
        cols["fetch_status"] = pa.array(
            np.where(is_del, 0, 200).astype(np.int32), type=pa.int32()
        )
        cols["content_length"] = pa.array(
            [0 if b is None else len(b) for b in html], type=pa.int64()
        )
    return pa.table(cols)


def events_dataset(n: int, *, v2: bool = False, parallelism: int = -1):
    """Distributed deterministic WAL as a ``ray.data.Dataset`` of n events."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return events_for_indices(batch["id"].to_numpy(), v2=v2)

    ds = rd.range(n, override_num_blocks=parallelism) if parallelism > 0 else rd.range(n)
    return ds.map_batches(gen, batch_format="pyarrow")


def pages_dataset(n: int, *, parallelism: int = -1):
    """Distributed deterministic pages table as a ``ray.data.Dataset``."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return pages_for_indices(batch["id"].to_numpy())

    ds = rd.range(n, override_num_blocks=parallelism) if parallelism > 0 else rd.range(n)
    return ds.map_batches(gen, batch_format="pyarrow")


def _distinct_text(i: int) -> str:
    """GENUINELY distinct text per index (``body_text`` repeats with
    period 1000 — fine for the CDC fixtures where urls cycle anyway, but
    a dedup benchmark over it would be ~1000 distinct docs pretending to
    be a corpus).  Tokens are full-range hash hexes, NOT the 1000-word
    vocabulary: with a tiny vocab two random docs share ~0.16 char-5-gram
    Jaccard, which at 16x4 banding is a ~1% band-collision rate per pair
    — quadratic candidate blowup at 10^6 docs.  Hash tokens push random
    cross-doc Jaccard to ~0 while true near-dup pairs stay ~0.99."""
    n = 60 + int(_h32(np.array([i]), 11)[0] % 140)
    j = np.arange(n, dtype=np.int64)
    toks = _h32(i * np.int64(1_000_003) + j, 13)
    return f"doc{i} " + " ".join(format(int(t), "08x") for t in toks)


def docs_for_indices(idx: np.ndarray) -> pa.Table:
    """Near-dup document corpus rows ``(doc_id, text)``: every index with
    ``i % 10 == 1`` is a light suffix mutation of doc ``i-1`` (char-5-gram
    Jaccard ≈ 0.9+, a true near-duplicate pair), the rest distinct.
    Pure function of the absolute index — chunking-invariant."""
    texts = []
    for i in idx:
        i = int(i)
        base = i - 1 if i % 10 == 1 else i
        t = _distinct_text(base)
        if base != i:
            t = t + " dupmark" + str(i % 7)
        texts.append(t)
    return pa.table(
        {"doc_id": pa.array(idx, pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


def docs_dataset(n: int, *, parallelism: int = -1):
    """Distributed deterministic near-dup corpus (scale benchmarking)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return docs_for_indices(batch["id"].to_numpy())

    ds = rd.range(n, override_num_blocks=parallelism) if parallelism > 0 else rd.range(n)
    return ds.map_batches(gen, batch_format="pyarrow")


def vectors_for_indices(idx: np.ndarray, dim: int = 64) -> pa.Table:
    """Deterministic pseudo-random unit-scale vectors ``(vec_id,
    embedding list<float64>)`` — pure function of (index, dim)."""
    idx = np.asarray(idx, dtype=np.int64)
    j = np.arange(dim, dtype=np.int64)
    flat_idx = (idx[:, None] * np.int64(1_000_003) + j[None, :]).reshape(-1)
    v = _h32(flat_idx).astype(np.float64) / 2**32 - 0.5
    flat = pa.array(v, pa.float64())
    col = pa.FixedSizeListArray.from_arrays(flat, dim).cast(pa.list_(pa.float64()))
    return pa.table({"vec_id": pa.array(idx, pa.int64()), "embedding": col})


def vectors_dataset(n: int, *, dim: int = 64, parallelism: int = -1):
    """Distributed deterministic embedding corpus (scale benchmarking)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return vectors_for_indices(batch["id"].to_numpy(), dim)

    ds = rd.range(n, override_num_blocks=parallelism) if parallelism > 0 else rd.range(n)
    return ds.map_batches(gen, batch_format="pyarrow")
