"""URL operators for web-corpus tables: canonicalization and per-host
aggregation — the CDC key-hygiene stages (the lake's primary key is
``url``, so two spellings of one page must collapse BEFORE the keyed
LWW apply, or they fork into two rows).

All transforms are vectorized Arrow kernels (``pc.extract_regex`` with
named groups + ``pc.if_else`` reassembly); no per-row Python.  The rule
set mirrors RFC 3986 §6.2.2-6.2.3 syntax-based normalization (the
public, deterministic subset):

- scheme and host lowercased
- default port dropped (``:80`` for http, ``:443`` for https)
- fragment dropped
- empty path -> ``/``

Non-URL strings (no ``scheme://``) pass through unchanged.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.\-]*)://"
    r"(?P<host>[^/?#]*)"
    r"(?P<rest>[^#]*)"
    r"(?P<frag>(?:#.*)?)$"
)


def normalize_urls(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized canonicalization of a string array of URLs."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    parts = pc.extract_regex(arr, _URL_RE)
    matched = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    rest = pc.struct_field(parts, "rest")
    # default ports: strip :80 when scheme http, :443 when https
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, r":80$", ""),
        host,
    )
    host = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(host, r":443$", ""),
        host,
    )
    rest = pc.if_else(pc.equal(rest, ""), "/", rest)
    rebuilt = pc.binary_join_element_wise(
        scheme, "://", host, rest, ""
    )
    return pc.if_else(matched, rebuilt, arr)


def url_normalize(ds, url_col: str, *, out_col: str | None = None):
    """Dataset stage: canonicalize ``url_col`` (in place by default)."""
    target = out_col or url_col

    def fn(batch: pa.Table) -> pa.Table:
        norm = normalize_urls(batch[url_col])
        if target in batch.column_names:
            return batch.set_column(
                batch.column_names.index(target), target, norm
            )
        return batch.append_column(target, norm)

    return ds.map_batches(fn, batch_format="pyarrow")


def add_host(ds, url_col: str, *, out_col: str = "host"):
    """Extract the (lowercased, port-stripped) host component."""

    def fn(batch: pa.Table) -> pa.Table:
        parts = pc.extract_regex(batch[url_col], _URL_RE)
        host = pc.utf8_lower(pc.struct_field(parts, "host"))
        host = pc.replace_substring_regex(host, r":\d+$", "")
        host = pc.if_else(pc.is_valid(parts), host, pa.scalar(None, pa.string()))
        return batch.append_column(out_col, host)

    return ds.map_batches(fn, batch_format="pyarrow")


def host_stats(ds, url_col: str):
    """Per-host page statistics: normalize -> extract host -> exact
    distinct-URL counts.

    Scale shape: the first ``grouped_aggregate`` dedupes (host, url)
    pairs with a per-batch partial combine (the shuffle moves one row
    per distinct pair per block, not one per page); the second rolls
    the tiny per-pair table up to one row per host.  Both exchanges are
    pre-combined, so a hot host costs O(distinct urls), never O(pages).

    Output: ``host, n_pages, n_urls`` (pages = total rows for the host,
    urls = distinct normalized urls).
    """
    from .reduces import grouped_aggregate

    normed = url_normalize(ds, url_col)
    with_host = add_host(normed, url_col)
    pairs = with_host.select_columns(["host", url_col])
    per_url = grouped_aggregate(
        pairs, ["host", url_col], [(url_col, "count", "n_pages")]
    )
    return grouped_aggregate(
        per_url,
        ["host"],
        [("n_pages", "sum", "n_pages"), (url_col, "count", "n_urls")],
    )
