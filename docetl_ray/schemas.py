"""Arrow schemas for the CDC lake table and the schema-DSL converter.

The reference declares per-operation output schemas in a small string DSL
(``/root/reference/docetl/operations/utils/validation.py:110-144``):
scalars ``str|int|float|bool``, ``enum[a, b]``, ``list[T]``, nested
``{field: type}``.  Here the same DSL maps onto explicit ``pyarrow`` types
so every stage has a fixed Arrow schema instead of dynamic dict rows.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# CDC lake-table schemas (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

#: Base lake table of Common-Crawl-style web pages.
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

#: WAL change events over the pages table.  ``op`` is insert/update/delete;
#: ``lsn`` is a strictly increasing log sequence number (WAL order).
EVENTS_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("lang", pa.string()),
    ]
)

#: Schema-evolution variant (FIXTURES.md F3): adds ``fetch_status`` and a
#: widened ``content_length`` (int32 in early segments -> int64 later).
EVENTS_V2_EXTRA_FIELDS = [
    pa.field("fetch_status", pa.int32()),
    pa.field("content_length", pa.int64()),
]

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"

# ---------------------------------------------------------------------------
# Schema DSL -> pyarrow (parity with reference convert_val)
# ---------------------------------------------------------------------------

_SCALARS = {
    "str": pa.string(),
    "text": pa.string(),
    "string": pa.string(),
    "varchar": pa.string(),
    "int": pa.int64(),
    "integer": pa.int64(),
    "float": pa.float64(),
    "decimal": pa.float64(),
    "number": pa.float64(),
    "bool": pa.bool_(),
    "boolean": pa.bool_(),
}


def dsl_to_arrow(value) -> pa.DataType:
    """Convert one schema-DSL value to a ``pyarrow.DataType``.

    Mirrors ``convert_val`` in the reference
    (``docetl/operations/utils/validation.py:110-144``) but targets Arrow:
    ``enum[...]`` -> dictionary<int32, string>, ``list[T]`` -> list<T>,
    ``{f: t, ...}`` (given as a dict) -> struct.
    """
    if isinstance(value, dict):
        return pa.struct({k: dsl_to_arrow(v) for k, v in value.items()})
    v = str(value).strip()
    low = v.lower()
    if low in _SCALARS:
        return _SCALARS[low]
    if low.startswith("enum[") and v.endswith("]"):
        return pa.dictionary(pa.int32(), pa.string())
    if low.startswith("list[") and v.endswith("]"):
        inner = v[5:-1]
        return pa.list_(dsl_to_arrow(inner))
    if v.startswith("{") and v.endswith("}"):
        fields = {}
        for part in _split_top_level(v[1:-1]):
            name, _, typ = part.partition(":")
            fields[name.strip()] = dsl_to_arrow(typ.strip())
        return pa.struct(fields)
    raise ValueError(f"unsupported schema DSL type: {value!r}")


def dsl_schema(spec: dict) -> pa.Schema:
    """Convert a ``{column: dsl_type}`` dict to a ``pyarrow.Schema``."""
    return pa.schema([pa.field(k, dsl_to_arrow(v)) for k, v in spec.items()])


def enum_values(value: str) -> list[str]:
    """Extract the allowed values of an ``enum[a, b, c]`` DSL string."""
    inner = value.strip()[5:-1]
    return [s.strip() for s in inner.split(",") if s.strip()]


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside [] or {}."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "[{":
            depth += 1
        elif ch in "]}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p for p in (p.strip() for p in parts) if p]


def unify_tables(tables: list[pa.Table]) -> pa.Table:
    """Concatenate tables with schema evolution: missing columns -> nulls,
    narrow ints -> wide (Arrow permissive promotion)."""
    tables = [t for t in tables if t is not None and t.num_rows >= 0]
    if len(tables) == 1:
        return tables[0]
    return pa.concat_tables(tables, promote_options="permissive")
