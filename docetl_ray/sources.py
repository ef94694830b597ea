"""Sources and parsing tools: the reference's dataset loaders and
document parsers (SURVEY.md §2.2; reference ``docetl/dataset.py:156-239``,
``docetl/parsing_tools.py``) recast as Ray Data readers + ``flat_map``
parse stages.

Text-native formats are first-class.  OOXML office formats (xlsx/docx/
pptx) are parsed for real with the stdlib (zip+XML, ``docetl_ray/
ooxml.py``).  Audio/OCR/vision parsers (whisper, paddleocr, azure-DI)
need models or network access absent from this environment, so those
are registered stubs that raise ``NotImplementedError`` at call time
with the real signature in place (same plumbing contract as the
multimodal stages).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

import pyarrow as pa

# -- readers (docetl Dataset type=file; json/csv + parquet/text extra) -----


def _metadata_free_schema(path: str, columns):
    """Pruned, metadata-stripped parquet schema — or None to let Ray
    infer.  Pandas-written parquet carries schema metadata that makes
    ``pa.Schema`` unhashable, defeating Ray's schema-dedup fast path in
    every union/concat downstream (measured 4x wall on a shuffle-heavy
    pipeline) and flooding a warning per block.  Only returns a schema
    when the file actually carries metadata, so heterogeneous-schema
    directories keep Ray's own inference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    paths = [path]
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".parquet", ".pq"))
        )
        if not paths:
            return None
    try:
        schema = pq.read_schema(paths[0])
    except Exception:
        return None
    if not schema.metadata:
        return None
    schema = schema.remove_metadata()
    # a directory may hold heterogeneous-but-unifiable schemas (e.g.
    # pandas writers with differing null-typed columns); forcing file 0's
    # schema on every file would miscast or fail the read, so only force
    # it when the files' metadata-stripped schemas agree — otherwise
    # fall back to Ray's own inference/unification.  The check is a
    # sequential driver-side footer read per file, so it is bounded: up
    # to 32 files are verified exhaustively; larger directories (which
    # only reach here when pandas-written — machine-written dirs carry
    # no metadata and returned above — and where skipping the strip
    # costs the measured 4x schema-dedup wall) verify a head+tail
    # sample of 32 (schema evolution shows up at the ends; a divergent
    # UNSAMPLED file fails the forced read loudly, it does not miscast
    # silently, because Arrow raises on incompatible column sets)
    check = (paths[1:] if len(paths) <= 32
             else paths[1:17] + paths[-16:])
    for other in check:
        try:
            if pq.read_schema(other).remove_metadata() != schema:
                return None
        except Exception:
            return None
    if columns is not None:
        try:
            schema = pa.schema([schema.field(c) for c in columns])
        except KeyError:
            return None
    return schema


def read_dataset(path: str, *, columns=None):
    """Format-dispatched reader (json / csv / parquet / txt / jsonl)."""
    import ray.data as rd

    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        return rd.read_json(path)
    if ext in (".jsonl", ".ndjson"):
        return rd.read_json(path)
    if ext == ".csv":
        return rd.read_csv(path)
    if ext in (".txt", ".md"):
        return rd.read_text(path)
    schema = _metadata_free_schema(path, columns)
    return rd.read_parquet(path, schema=schema, columns=columns)


# -- parsing tools (docetl.parser plugin group) ----------------------------

def txt_to_string(path: str) -> list[str]:
    """parsing_tools.txt_to_string (:156-168): whole file as one doc."""
    with open(path, encoding="utf-8") as f:
        return [f.read()]


def json_to_string(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    return [json.dumps(d) for d in data] if isinstance(data, list) else [json.dumps(data)]


def _stub(name: str, needs: str):
    def fn(path: str) -> list[str]:
        raise NotImplementedError(
            f"{name} requires {needs}, not present in this environment; "
            "plug the real parser here (same signature: path -> list[str])"
        )

    fn.__name__ = name
    return fn


# OOXML office formats are zip+XML: parsed with the stdlib (docetl_ray/
# ooxml.py), no codec library needed — real implementations, not stubs.
from .ooxml import docx_to_string, pptx_to_string, xlsx_to_string  # noqa: E402

whisper_speech_to_text = _stub("whisper_speech_to_text", "openai-whisper")
paddleocr_pdf_to_string = _stub("paddleocr_pdf_to_string", "paddleocr")
azure_di_read = _stub("azure_di_read", "azure-ai-documentintelligence")

PARSERS: dict[str, Callable[[str], list[str]]] = {
    "txt_to_string": txt_to_string,
    "json_to_string": json_to_string,
    "xlsx_to_string": xlsx_to_string,
    "docx_to_string": docx_to_string,
    "pptx_to_string": pptx_to_string,
    "whisper_speech_to_text": whisper_speech_to_text,
    "paddleocr_pdf_to_string": paddleocr_pdf_to_string,
    "azure_di_read": azure_di_read,
}


def register_parser(name: str, fn: Callable[[str], list[str]]):
    """Plugin hook (reference entry-point group ``docetl.parser``,
    parsing_tools.py:482-491)."""
    PARSERS[name] = fn


def get_parser(name: str) -> Callable[[str], list[str]]:
    """Resolve a parser: explicit registrations / built-ins first, then
    ``importlib.metadata`` entry points in the ``docetl_ray.parser``
    group (installed plugin packages) — the reference's discovery order
    for its ``docetl.parser`` group."""
    if name in PARSERS:
        return PARSERS[name]
    import importlib.metadata

    try:
        for ep in importlib.metadata.entry_points(group="docetl_ray.parser"):
            if ep.name == name:
                fn = ep.load()
                PARSERS[name] = fn  # cache
                return fn
    except Exception:
        pass
    raise KeyError(f"unknown parser {name!r} (registered: {sorted(PARSERS)})")


def parse_files(ds, *, path_col: str, parser: str, output_col: str = "content"):
    """Fan-out parse stage: one input row per file path -> one output row
    per parsed document (reference parsing fan-out, dataset.py:241-315).
    Other columns are copied onto every fan-out row."""
    fn = get_parser(parser)

    def fan_out(batch: pa.Table) -> pa.Table:
        idx, docs = [], []
        for i, p in enumerate(batch[path_col].to_pylist()):
            for doc in fn(p):
                idx.append(i)
                docs.append(doc)
        out = batch.take(pa.array(idx, pa.int64()))
        return out.append_column(output_col, pa.array(docs, pa.string()))

    return ds.map_batches(fan_out, batch_format="pyarrow")
