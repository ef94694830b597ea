"""Text-analysis stages over document tables: language ID, quality
scoring, token counting, document fingerprinting (the large-scale
training-data-pipeline operator set; deterministic, model-free).

All stages are single-pass ``map_batches`` over Arrow batches; regexes are
compiled at module import (once per worker process).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[a-zA-Z]+")
_PUNCT_RE = re.compile(r"[.!?,;:]")
_CJK_RE = re.compile(r"[一-鿿]")

#: tiny fixed marker-word profiles for the 5 langs of the synthetic corpus
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "with", "for", "was", "this"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "du", "dans", "pour", "que", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "en", "por", "para", "que", "con"},
}


def token_count(ds, text_col: str, *, out_col: str = "n_tokens"):
    """Whitespace token count — vectorized ``pc.count_substring_regex``
    (RE2, no per-row Python; matches ``re.findall(r"\\S+")`` counts).
    Oracle SQL:
    ``length(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))``."""

    def fn(batch: pa.Table) -> pa.Table:
        counts = pc.fill_null(
            pc.count_substring_regex(batch[text_col], r"\S+"), 0
        )
        return batch.append_column(out_col, pc.cast(counts, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


#: GPT-2-style pre-tokenizer pattern (contractions, letter runs, digit
#: runs, punctuation runs) — the deterministic "BPE-ish" token counter
_BPE_RE = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d|[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")


def bpe_token_count(ds, text_col: str, *, out_col: str = "n_bpe_tokens"):
    """BPE-ish token count via the GPT-2 pre-tokenizer regex (counts the
    pre-merge word pieces; a real BPE would then merge within each piece,
    so this upper-bounds and tracks true BPE counts).  Oracle SQL:
    ``len(regexp_extract_all(text, '<pattern>'))``."""

    def fn(batch: pa.Table) -> pa.Table:
        counts = pc.fill_null(
            pc.count_substring_regex(batch[text_col], _BPE_RE.pattern), 0
        )
        return batch.append_column(out_col, pc.cast(counts, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score(ds, text_col: str):
    """Heuristic quality features + score (reference delegates quality
    judgments to LLM prompts; here pinned deterministic features):
    ``n_chars``, ``n_tokens``, ``punct_ratio``, ``stopword_ratio``,
    ``mean_token_len``, and ``quality`` in [0, 1]."""

    stop_set = pa.array(sorted(_LANG_MARKERS["en"]))

    def fn(batch: pa.Table) -> pa.Table:
        # fully vectorized: RE2 match counts for chars/tokens/punct, and
        # split->flatten->is_in with a parent-index scatter-add for the
        # stopword counts — no per-row Python.  Identical arithmetic to
        # the per-row formulation (sum of \S+ token lengths == non-ws
        # char count, since \S+ tokens partition the non-ws chars).
        col = pc.fill_null(batch[text_col], "")
        n = batch.num_rows
        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = (
            pc.count_substring_regex(col, r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_punct = pc.count_substring_regex(col, r"[.!?,;:]").to_numpy(
            zero_copy_only=False
        )
        n_ws = pc.count_substring_regex(col, r"\s").to_numpy(zero_copy_only=False)
        punct = n_punct / np.maximum(1, n_chars)
        mtl = np.where(n_tok > 0, (n_chars - n_ws) / np.maximum(1, n_tok), 0.0)
        toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+").combine_chunks()
        flat = pc.list_flatten(toks)
        hit = pc.cast(pc.is_in(flat, value_set=stop_set), pa.int8()).to_numpy(
            zero_copy_only=False
        )
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n_stop = np.zeros(n, np.int64)
        np.add.at(n_stop, parents, hit)
        stopr = n_stop / np.maximum(1, n_tok)
        # pinned score: length band + punctuation sanity + vocabulary shape
        len_ok = np.clip(n_tok / 50.0, 0, 1) * np.clip((5000 - n_tok) / 5000.0, 0, 1)
        punct_ok = 1.0 - np.clip(np.abs(punct - 0.02) * 20, 0, 1)
        shape_ok = 1.0 - np.clip(np.abs(mtl - 5.0) / 5.0, 0, 1)
        q = 0.5 * len_ok + 0.25 * punct_ok + 0.25 * shape_ok
        out = batch
        for name, arr, typ in [
            ("n_chars", n_chars, pa.int64()),
            ("n_tokens", n_tok, pa.int64()),
            ("punct_ratio", punct, pa.float64()),
            ("stopword_ratio", stopr, pa.float64()),
            ("mean_token_len", mtl, pa.float64()),
            ("quality", q, pa.float64()),
        ]:
            out = out.append_column(name, pa.array(arr, typ))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def lang_id(ds, text_col: str, *, out_col: str = "lang_pred"):
    """n-gram/marker-word language heuristic over {en,de,fr,es,zh}.

    CJK characters force ``zh``; otherwise the language whose marker-word
    profile overlaps the first 2000 words most wins (ties ->
    lexicographic, so the result is deterministic).  Vectorized:
    lower + split, flatten, ``is_in`` per language profile, parent-index
    scatter-add — the word cap is applied by ranking NON-EMPTY tokens
    within each row (split emits empty strings at boundaries, which must
    not consume cap slots)."""
    langs = sorted(_LANG_MARKERS)
    marker_sets = {lang: pa.array(sorted(_LANG_MARKERS[lang])) for lang in langs}

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        col = pc.fill_null(batch[text_col], "")
        toks = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z]+").combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:] if n > 1 else np.empty(0, np.int64))
        nonempty = (
            pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        )
        # rank among non-empty words within each row, then cap at 2000
        cum = np.cumsum(nonempty)
        row_base = np.where(offs > 0, cum[offs - 1], 0) if len(cum) else offs
        rank = (cum - 1) - row_base[parents] if len(cum) else np.empty(0, np.int64)
        in_cap = nonempty & (rank < 2000)
        scores = np.zeros((n, len(langs)), dtype=np.int64)
        for li, lang in enumerate(langs):
            hit = pc.is_in(flat, value_set=marker_sets[lang]).to_numpy(
                zero_copy_only=False
            )
            np.add.at(scores[:, li], parents, (hit & in_cap).astype(np.int64))
        best = np.argmax(scores, axis=1)  # first max == lexicographic winner
        preds = np.asarray(langs, dtype=object)[best]
        cjk = pc.match_substring_regex(col, "[一-鿿]").to_numpy(zero_copy_only=False)
        preds[cjk] = "zh"
        return batch.append_column(out_col, pa.array(preds, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


_FNV_PRIME = np.uint64(1099511628211)


def fingerprint(
    ds, text_col: str, *, out_col: str = "fingerprint", k: int = 5, window: int = 4,
    sql_parity: bool = False,
):
    """Winnowing document fingerprint: hash every char ``k``-gram, take the
    min in each sliding ``window`` of gram hashes, digest the selected-hash
    set.  Robust to small edits; deterministic.

    Default (fast) mode: vectorized polynomial rolling hash over the UTF-8
    bytes (numpy sliding windows — no per-gram Python) + an FNV fold of
    the sorted selected hashes.  ``sql_parity=True`` switches the gram
    hash to ``substr(md5(gram), 1, 16)`` (compared lexicographically —
    equivalent to numeric order on the uint64 prefix) and the digest to
    ``md5(string_agg(h, ',' ORDER BY h))``, both exactly expressible in
    DuckDB for the correctness oracle; same winnowing structure, slower
    constant factor."""
    import hashlib

    def fp_fast(t: str) -> str:
        b = (t or "").encode("utf-8")
        if len(b) < k:
            return f"{zlib.crc32(b):016x}"
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            w = _FNV_PRIME ** np.arange(k, dtype=np.uint64)  # wraps mod 2^64
            grams = (np.lib.stride_tricks.sliding_window_view(arr, k) * w).sum(
                axis=1, dtype=np.uint64
            )
        if len(grams) <= window:
            sel = {int(grams.min())}
        else:
            sw = np.lib.stride_tricks.sliding_window_view(grams, window)
            sel = set(sw.min(axis=1).tolist())
        acc = np.uint64(1469598103934665603)
        for h in sorted(sel):
            acc = np.uint64((int(acc) ^ h) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        return f"{int(acc):016x}"

    def fp_sql(t: str) -> str:
        t = t or ""
        if len(t) < k:
            grams = [hashlib.md5(t.encode("utf-8")).hexdigest()[:16]]
        else:
            grams = [
                hashlib.md5(t[i : i + k].encode("utf-8")).hexdigest()[:16]
                for i in range(len(t) - k + 1)
            ]
        if len(grams) <= window:
            sel = {min(grams)}
        else:
            sel = {min(grams[i : i + window]) for i in range(len(grams) - window + 1)}
        return hashlib.md5(",".join(sorted(sel)).encode("utf-8")).hexdigest()

    fp = fp_sql if sql_parity else fp_fast

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, pa.array([fp(t) for t in batch[text_col].to_pylist()], pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


#: the 8 Gopher stopwords (Rae et al. 2021, §A1.1 quality heuristics)
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(ds, text_col: str):
    """Gopher-style document quality rules (public heuristics from the
    Gopher paper, §A1.1 — the standard pre-training corpus filter set):
    word-count band, mean-word-length band, symbol-to-word ratio,
    bullet-/ellipsis-line fractions, alphabetic-word fraction, and a
    >=2-distinct-stopwords requirement.  Emits every metric plus the
    combined ``gopher_pass`` flag so callers can re-threshold without
    recomputing.

    Fully vectorized: every metric is an RE2 match count
    (``pc.count_substring_regex``) or literal count — no per-row Python.
    All divisions are double / double in fixed operand order, so a SQL
    engine replays them bit-for-bit.
    """

    def fn(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch[text_col], "")
        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_ws = pc.count_substring_regex(col, r"\s").to_numpy(zero_copy_only=False)
        n_words = (
            pc.count_substring_regex(col, r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        mwl = np.where(n_words > 0, (n_chars - n_ws) / np.maximum(1, n_words), 0.0)
        n_sym = (
            pc.count_substring(col, "#").to_numpy(zero_copy_only=False)
            + pc.count_substring(col, "...").to_numpy(zero_copy_only=False)
        )
        symr = n_sym / np.maximum(1, n_words)
        n_lines = (
            pc.count_substring(col, "\n").to_numpy(zero_copy_only=False).astype(np.int64)
            + 1
        )
        n_bullet = pc.count_substring_regex(col, r"(?m)^\s*[-*•]").to_numpy(
            zero_copy_only=False
        )
        n_ellip = pc.count_substring_regex(col, r"(?m)(\.\.\.|…)$").to_numpy(
            zero_copy_only=False
        )
        bulletf = n_bullet / n_lines
        ellipf = n_ellip / n_lines
        n_alpha = pc.count_substring_regex(col, r"\S*[A-Za-z]\S*").to_numpy(
            zero_copy_only=False
        )
        alphaf = n_alpha / np.maximum(1, n_words)
        n_stop = np.zeros(batch.num_rows, np.int64)
        for w in _GOPHER_STOPS:
            hit = pc.match_substring_regex(col, rf"(?i)\b{w}\b").to_numpy(
                zero_copy_only=False
            )
            n_stop += hit.astype(np.int64)
        passed = (
            (n_words >= 50)
            & (n_words <= 100_000)
            & (mwl >= 3.0)
            & (mwl <= 10.0)
            & (symr < 0.1)
            & (bulletf < 0.9)
            & (ellipf < 0.3)
            & (alphaf > 0.8)
            & (n_stop >= 2)
        )
        out = batch
        for name, arr, typ in [
            ("n_words", n_words, pa.int64()),
            ("mean_word_len", mwl, pa.float64()),
            ("symbol_word_ratio", symr, pa.float64()),
            ("bullet_line_frac", bulletf, pa.float64()),
            ("ellipsis_line_frac", ellipf, pa.float64()),
            ("alpha_word_frac", alphaf, pa.float64()),
            ("n_stop_hits", n_stop, pa.int64()),
            ("gopher_pass", passed, pa.bool_()),
        ]:
            out = out.append_column(name, pa.array(arr, typ))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_stats(ds, text_col: str):
    """Line-level repetition metrics (the Gopher/CCNet repetition family):
    over each document's NON-EMPTY lines,

    - ``dup_line_frac``      = (n_lines - n_distinct_lines) / n_lines
    - ``dup_line_char_frac`` = chars in lines occurring >1 time (all
      occurrences) / total line chars

    Both 0.0 for documents with no non-empty lines.  Line splitting,
    length and grouping run in Arrow/pandas C kernels (split_pattern ->
    list_flatten + parent indices -> hash-table groupby); no per-row
    Python loop.
    """
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch[text_col], "")
        n = batch.num_rows
        lines = pc.split_pattern(col, "\n").combine_chunks()
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        dup_frac = np.zeros(n, np.float64)
        dup_char_frac = np.zeros(n, np.float64)
        if keep.any():
            df = pd.DataFrame(
                {
                    "p": parents[keep],
                    "l": flat.to_numpy(zero_copy_only=False)[keep],
                }
            )
            df["c"] = df["l"].str.len().astype(np.int64)
            g = df.groupby(["p", "l"], sort=False).agg(
                cnt=("c", "size"), c=("c", "first")
            )
            per = g.groupby(level=0).agg(
                n_lines=("cnt", "sum"), n_distinct=("cnt", "size")
            )
            g["all_chars"] = g["cnt"] * g["c"]
            g["dup_chars"] = np.where(g["cnt"] > 1, g["all_chars"], 0)
            sums = g.groupby(level=0)[["all_chars", "dup_chars"]].sum()
            idx = per.index.to_numpy()
            nl = per["n_lines"].to_numpy(np.float64)
            nd = per["n_distinct"].to_numpy(np.float64)
            dup_frac[idx] = (nl - nd) / nl
            tot = sums["all_chars"].to_numpy(np.float64)
            dupc = sums["dup_chars"].to_numpy(np.float64)
            # every non-empty line has >=1 char, so tot >= 1 here
            dup_char_frac[idx] = dupc / tot
        out = batch.append_column("dup_line_frac", pa.array(dup_frac, pa.float64()))
        return out.append_column(
            "dup_line_char_frac", pa.array(dup_char_frac, pa.float64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- paragraph-level dedup (CCNet-style boilerplate removal) ----------

def _hot_value_set(ref):
    """Per-worker cache: the broadcast hot-paragraph set, materialized
    once per process as an Arrow array usable with ``pc.is_in`` (shared
    bounded LRU; see util_ray.broadcast_cached)."""
    from .util_ray import broadcast_cached

    return broadcast_cached(ref)


def paragraph_counts(ds, text_col: str, *, sep: str = "\n"):
    """Corpus-wide paragraph document-frequency: one row per distinct
    non-empty paragraph with ``n_docs`` = number of documents containing
    it.

    Scale shape: each batch pre-combines to distinct (doc, paragraph)
    and emits one partial count per distinct paragraph per batch, so
    the shuffle moves one row per distinct paragraph per block — hot
    boilerplate collapses BEFORE the exchange.  (A document is one row,
    so its paragraphs never straddle batches and the per-batch distinct
    is exact.)
    """
    from .reduces import grouped_aggregate

    def para_partial(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch[text_col], "")
        lists = pc.split_pattern(col, sep).combine_chunks()
        t = pa.table(
            {"_p": pc.list_parent_indices(lists), "para": pc.list_flatten(lists)}
        )
        t = t.filter(pc.not_equal(t["para"], ""))
        distinct = t.group_by(["_p", "para"]).aggregate([])
        g = distinct.group_by(["para"]).aggregate([("_p", "count")])
        return pa.table(
            {"para": g["para"], "_n": pc.cast(g["_p_count"], pa.int64())}
        )

    counts = ds.map_batches(para_partial, batch_format="pyarrow")
    return grouped_aggregate(counts, ["para"], [("_n", "sum", "n_docs")])


def paragraph_dedup(
    ds,
    text_col: str,
    *,
    min_count: int = 2,
    sep: str = "\n",
    out_col: str | None = None,
    how: str = "broadcast",
):
    """Drop every paragraph that appears in >= ``min_count`` distinct
    documents (the CCNet/CC-Net boilerplate-removal semantics: repeated
    nav bars, footers, cookie banners vanish corpus-wide; unique prose
    survives).  Empty paragraphs are formatting, not content — they are
    never counted and never dropped.  ``text_col`` is replaced in place
    unless ``out_col`` is given.

    ``how="broadcast"``: the hot set (paragraphs with doc-frequency >=
    min_count — small by construction for real boilerplate) ships once
    via ``ray.put`` and each batch filters with one vectorized
    ``pc.is_in``.  At 100 TB the hot set for min_count=2 can still blow
    up on a near-duplicate-heavy corpus — raise ``min_count``, or run
    exact/minhash doc dedup first (boilerplate frequency is what this
    op targets; document-level duplication belongs to those ops).

    Reassembly is fully vectorized: kept paragraphs re-listed via
    offsets from ``np.bincount`` and joined with ``pc.binary_join`` —
    no per-document Python.
    """
    import ray

    target = out_col or text_col
    hot = paragraph_counts(ds, text_col, sep=sep)
    hot = hot.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], min_count)).select(
            ["para"]
        ),
        batch_format="pyarrow",
    )
    if how != "broadcast":
        raise ValueError(f"unknown how={how!r} (broadcast only; see docstring)")
    from ..util import collect

    hot_arr = collect(hot)["para"].combine_chunks()
    hot_ref = ray.put(hot_arr)

    def drop_hot(batch: pa.Table) -> pa.Table:
        hot_vals = _hot_value_set(hot_ref)
        col = pc.fill_null(batch[text_col], "")
        lists = pc.split_pattern(col, sep).combine_chunks()
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = (
            pc.invert(pc.is_in(flat, value_set=hot_vals))
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        kept_flat = flat.filter(pa.array(keep))
        kept_parents = parents[keep]
        n = batch.num_rows
        counts = np.bincount(kept_parents, minlength=n)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept_flat)
        joined = pc.binary_join(la, sep)
        if target in batch.column_names:
            return batch.set_column(
                batch.column_names.index(target), target, joined
            )
        return batch.append_column(target, joined)

    return ds.map_batches(drop_hot, batch_format="pyarrow")


#: PII patterns (RE2 — the same engine behind pyarrow.compute AND DuckDB's
#: regexp_* functions, so the scrub is exactly SQL-replicable).  Applied
#: in order; replacement placeholders are single tokens.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\-\s]{7,}\d", "<PHONE>"),
]


def pii_scrub(ds, text_col: str, *, out_col: str | None = None,
              patterns=None):
    """Redact PII-shaped spans (emails, IPv4s, international-format phone
    numbers) — one vectorized ``pc.replace_substring_regex`` pass per
    pattern, plus a per-category match count (counted on the ORIGINAL
    text, before any replacement).  Training-data pipelines run this on
    every document; a per-row Python ``re.sub`` would dominate the stage.

    Oracle SQL: chained ``regexp_replace(text, pat, repl, 'g')`` +
    ``len(regexp_extract_all(text, pat))`` — RE2 on both sides.
    Reference analogue: DocETL delegates scalar text work to prompts or
    ``code_map`` UDFs (``/root/reference/docetl/operations/
    code_operations.py:46-73``); this is the built-in vectorized recast.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    target = out_col or text_col

    def fn(batch: pa.Table) -> pa.Table:
        orig = batch[text_col]
        cleaned = orig
        counts = {}
        for name, pat, repl in pats:
            counts[f"n_{name}"] = pc.cast(
                pc.fill_null(pc.count_substring_regex(orig, pat), 0), pa.int64()
            )
            cleaned = pc.replace_substring_regex(cleaned, pat, repl)
        if target in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index(target), target, cleaned
            )
        else:
            batch = batch.append_column(target, cleaned)
        for cname, arr in counts.items():
            batch = batch.append_column(cname, arr)
        return batch

    fn.__name__ = "pii_scrub"
    return ds.map_batches(fn, batch_format="pyarrow")
