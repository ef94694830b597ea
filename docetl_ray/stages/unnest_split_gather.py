"""Row-explosion and chunk-context stages: docetl ``unnest`` / ``split`` /
``gather`` parity (SURVEY.md §2.1; reference
``/root/reference/docetl/operations/unnest.py:125-184``,
``operations/split.py:76-118``, ``operations/gather.py:113-260``).

``unnest`` is Arrow-native (``list_flatten`` + ``list_parent_indices`` —
no Python row loop).  ``split`` emits the reference's metadata columns
``{split_key}_chunk`` / ``{name}_id`` / ``{name}_chunk_num`` but with a
*deterministic* document id (md5 of content) instead of uuid4
(``split.py:86-93``) so runs are reproducible.  ``gather`` regroups by
doc id (one keyed shuffle), orders chunks, and renders peripheral
context with the reference's skipped-content markers
(``gather.py:107-109`` ``{content_key}_rendered``).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\S+")


def unnest(ds, key: str, *, keep_empty: bool = False):
    """Explode a list column into one row per element, or expand a struct
    column's fields into top-level columns (reference unnest semantics:
    key preservation invariant, ``unnest.py:186-191``)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[key]
        typ = col.type
        if pa.types.is_struct(typ):
            out = batch
            for f in typ:
                fld = pc.struct_field(col, f.name)
                name = f.name
                if name in out.column_names:
                    out = out.set_column(out.column_names.index(name), name, fld)
                else:
                    out = out.append_column(name, fld)
            return out
        if not (pa.types.is_list(typ) or pa.types.is_large_list(typ)):
            raise TypeError(f"unnest key {key!r} must be list or struct, got {typ}")
        combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        parents = pc.list_parent_indices(combined)
        flat = pc.list_flatten(combined)
        others = batch.drop_columns([key]).take(parents)
        out = others.append_column(key, flat)
        if keep_empty:
            lengths = pc.list_value_length(combined)
            empty_mask = pc.fill_null(pc.equal(lengths, 0), True)
            empties = batch.filter(empty_mask).drop_columns([key])
            empties = empties.append_column(
                key, pa.nulls(empties.num_rows, typ.value_type)
            )
            out = pa.concat_tables([out, empties], promote_options="permissive")
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def _doc_id(content: str) -> str:
    return hashlib.md5(content.encode("utf-8")).hexdigest()


def split(
    ds,
    split_key: str,
    *,
    name: str = "split",
    method: str = "token_count",
    token_count: int = 100,
    delimiter: str = "\n\n",
    num_splits_to_group: int = 1,
):
    """Chunk a text column; one output row per chunk.

    method="token_count": whitespace tokens, ``token_count`` per chunk
    (reference uses tiktoken, ``split.py:76-94``; we pin a whitespace
    tokenizer — deterministic, no model download).
    method="delimiter": split on ``delimiter``, group
    ``num_splits_to_group`` pieces per chunk (``split.py:96-118``).

    Emits ``{split_key}_chunk``, ``{name}_id`` (md5 of the document
    content — deterministic), ``{name}_chunk_num`` (1-based).
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[split_key].to_pylist()
        parent_idx: list[int] = []
        chunks: list[str] = []
        ids: list[str] = []
        nums: list[int] = []
        for i, text in enumerate(texts):
            text = text or ""
            if method == "token_count":
                toks = _TOKEN_RE.findall(text)
                pieces = [
                    " ".join(toks[j : j + token_count])
                    for j in range(0, len(toks), token_count)
                ] or [""]
            else:
                parts = text.split(delimiter)
                pieces = [
                    delimiter.join(parts[j : j + num_splits_to_group])
                    for j in range(0, len(parts), num_splits_to_group)
                ]
            did = _doc_id(text)
            for cn, piece in enumerate(pieces, start=1):
                parent_idx.append(i)
                chunks.append(piece)
                ids.append(did)
                nums.append(cn)
        out = batch.take(pa.array(parent_idx, pa.int64()))
        out = out.append_column(f"{split_key}_chunk", pa.array(chunks, pa.string()))
        out = out.append_column(f"{name}_id", pa.array(ids, pa.string()))
        return out.append_column(f"{name}_chunk_num", pa.array(nums, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def gather(
    ds,
    content_key: str,
    doc_id_key: str,
    order_key: str,
    *,
    previous_count: int = 1,
    next_count: int = 1,
    doc_header_key: str | None = None,
):
    """Reassemble chunk context: group by doc id, order by chunk number,
    render each chunk with surrounding peripheral chunks and skip markers
    (reference rendering ``gather.py:113-260``; output column
    ``{content_key}_rendered``).  One keyed shuffle on the doc id."""

    def render_group(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(order_key, kind="mergesort").reset_index(drop=True)
        n = len(group)
        rendered = []
        for i in range(n):
            parts = []
            if doc_header_key and pd.notna(group.at[i, doc_header_key]):
                parts.append(str(group.at[i, doc_header_key]))
            lo = max(0, i - previous_count)
            if lo > 0:
                skipped = sum(len(str(group.at[j, content_key])) for j in range(0, lo))
                parts.append(f"[... {skipped} characters skipped ...]")
            for j in range(lo, i):
                parts.append(f"--- Previous Chunk {int(group.at[j, order_key])} ---")
                parts.append(str(group.at[j, content_key]))
            parts.append("--- Begin Main Chunk ---")
            parts.append(str(group.at[i, content_key]))
            parts.append("--- End Main Chunk ---")
            hi = min(n, i + 1 + next_count)
            for j in range(i + 1, hi):
                parts.append(f"--- Next Chunk {int(group.at[j, order_key])} ---")
                parts.append(str(group.at[j, content_key]))
            if hi < n:
                skipped = sum(len(str(group.at[j, content_key])) for j in range(hi, n))
                parts.append(f"[... {skipped} characters skipped ...]")
            rendered.append("\n".join(parts))
        group[f"{content_key}_rendered"] = rendered
        return group

    from .grouped import grouped_map

    return grouped_map(ds, doc_id_key, render_group)
