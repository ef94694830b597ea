"""Flagship pipeline: WAL tail -> extract -> keyed LWW upsert ->
exactly-once partitioned Parquet lake table.

``wal_from_documents`` derives a deterministic CDC event stream from the
driver's ``documents.parquet`` (pure function of doc_id — no RNG), in the
BASELINE.json input shape (url, warc_ts, html, text, lang + op, lsn), so
the flagship runs end-to-end on the provided testdata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cdc import LakeTable, apply_events, read_state

BASE_TS_US = 1_704_067_200_000_000


def wal_from_documents(sf_dir: str, *, copies: int = 2, lsn_base: int = 0):
    """Events dataset derived from documents: each doc contributes
    ``copies`` events (insert then update/delete) keyed by a synthetic
    url; op/timestamps are content-deterministic.  ``lsn_base`` offsets
    the LSN range so segments from different calls never collide (a WAL's
    LSNs are globally unique; two different events must never share
    (url, warc_ts, lsn) or LWW is ill-defined)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def to_events(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        lsn, op, url, ts, html, lang = [], [], [], [], [], []
        for i, t, lg in zip(ids, texts, langs):
            i = int(i)
            for c in range(copies):
                ev_lsn = lsn_base + i * copies + c
                is_del = c > 0 and (i * 2654435761 + c) % 10 == 0
                lsn.append(ev_lsn)
                op.append("delete" if is_del else ("insert" if c == 0 else "update"))
                url.append(f"https://docs.example/{i % 997}/{i}")
                ts.append(BASE_TS_US + ev_lsn * 1_000_000)
                body = None if is_del else (
                    b"<html><body><p>" + (t or "").encode("utf-8")
                    + b"</p><p>v" + str(c).encode() + b"</p></body></html>"
                )
                html.append(body)
                lang.append(None if is_del else lg)
        return pa.table(
            {
                "lsn": pa.array(lsn, pa.int64()),
                "op": pa.array(op, pa.string()),
                "url": pa.array(url, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(html, pa.binary()),
                "lang": pa.array(lang, pa.string()),
            }
        )

    return ds.map_batches(to_events, batch_format="pyarrow")


def cdc_flagship(sf_dir: str, out_root: str, *, num_partitions: int = 16):
    """Run the flagship CDC apply over the derived WAL; returns the live
    table state as a Dataset (url, warc_ts, lsn, text, lang)."""
    table = LakeTable(out_root, num_partitions=num_partitions)
    apply_events(table, wal_from_documents(sf_dir), epoch=0)
    return read_state(table).drop_columns(["_deleted"])
