"""Span-extraction stage: docetl ``extract`` parity, deterministic path
(SURVEY.md §2.1; reference ``/root/reference/docetl/operations/extract.py``).

The reference's regex strategy has the LLM *propose* regexes which are
then applied with ``re.findall`` (``extract.py:259-383``); here the
caller provides the patterns and the application step is identical:
matches are deduplicated (order-preserving), then joined with a
separator or kept as a list — mirroring ``extract.py:450-469``, and the
result lands under ``{doc_key}{suffix}`` (``extract.py:50-54``).
"""

from __future__ import annotations

import re

import pyarrow as pa


def extract_regex(
    ds,
    doc_cols,
    patterns: list[str],
    *,
    suffix: str = "_extracted",
    format_extraction: bool = True,
    sep: str = "\n",
    sort_matches: bool = False,
):
    """Apply regex patterns to each of ``doc_cols``; write results to
    ``{col}{suffix}`` (joined string if ``format_extraction`` else
    ``list<string>``)."""
    doc_cols = [doc_cols] if isinstance(doc_cols, str) else list(doc_cols)
    compiled = [re.compile(p) for p in patterns]

    def fn(batch: pa.Table) -> pa.Table:
        for col in doc_cols:
            texts = batch[col].to_pylist()
            out = []
            for t in texts:
                t = t or ""
                found: list[str] = []
                seen = set()
                for rx in compiled:
                    for m in rx.findall(t):
                        s = m if isinstance(m, str) else m[0]
                        if s not in seen:  # dedup, order-preserving
                            seen.add(s)
                            found.append(s)
                if sort_matches:
                    found = sorted(found)
                out.append(sep.join(found) if format_extraction else found)
            typ = pa.string() if format_extraction else pa.list_(pa.string())
            batch = batch.append_column(f"{col}{suffix}", pa.array(out, typ))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")
