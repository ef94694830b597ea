"""Span-extraction stage: docetl ``extract`` parity
(SURVEY.md §2.1; reference ``/root/reference/docetl/operations/extract.py``).

Two strategies, mirroring the reference:

- regex (``extract.py:259-383``): the reference has the LLM *propose*
  regexes which are then applied with ``re.findall``; here the caller
  provides the patterns and the application step is identical: matches
  are deduplicated (order-preserving), then joined with a separator or
  kept as a list — mirroring ``extract.py:450-469``, and the result
  lands under ``{doc_key}{suffix}`` (``extract.py:50-54``).
- line_number (``extract.py:66-257``, the reference default): the text
  is reformatted into numbered 80-char lines; the model returns
  ``line_ranges`` (start_line/end_line); ranges are validated (invalid
  ranges skipped under ``skip_on_error``, else clamped), the numbered
  prefix is stripped, each range's lines are joined with ``""`` and
  ranges joined with a blank line.  The LLM call goes through the same
  pluggable client as ``stages/llm.py`` (offline-deterministic here).
"""

from __future__ import annotations

import re

import pyarrow as pa


def reformat_text_with_line_numbers(text: str, line_width: int = 80) -> str:
    """Greedy word-wrap to ``line_width`` + ``%4d: `` line-number prefixes
    (byte-compatible with ``extract.py:66-117``, including the
    long-word-split branch)."""
    if not text:
        return ""
    words = text.split()
    lines: list[str] = []
    current: list[str] = []
    cur_len = 0
    for word in words:
        if cur_len + len(word) + (1 if current else 0) > line_width:
            if current:
                lines.append(" ".join(current))
                current = []
                cur_len = 0
            if len(word) > line_width:
                for i in range(0, len(word), line_width):
                    lines.append(word[i : i + line_width])
            else:
                current.append(word)
                cur_len = len(word)
        else:
            cur_len += (1 + len(word)) if current else len(word)
            current.append(word)
    if current:
        lines.append(" ".join(current))
    return "\n".join(f"{i + 1:4d}: {line}" for i, line in enumerate(lines))


_LINE_NUMBER_PROMPT = """\
You are extracting specific content from text documents. Extract information \
according to these instructions: {instructions}

The text is formatted with line numbers as follows:
{formatted_text}

Return ONLY line ranges as JSON objects with 'start_line' and 'end_line'."""


def extract_line_number(
    ds,
    doc_cols,
    prompt: str,
    *,
    suffix: str = "_extracted",
    format_extraction: bool = True,
    skip_on_error: bool = True,
    client_factory=None,
    concurrency=(1, 8),
    batch_size: int = 256,
):
    """Line-number extraction strategy (reference default,
    ``extract.py:25,120-257``): per row, render the instruction prompt,
    number-format the text, ask the client for ``line_ranges``, and cut
    the ranges back out of the formatted text."""
    from .llm import FakeDeterministicClient, render_prompt

    doc_cols = [doc_cols] if isinstance(doc_cols, str) else list(doc_cols)
    schema = {"line_ranges": "list[str]"}  # client contract: list of range dicts

    class Stage:
        __name__ = "extract_line_number"

        def __init__(self):
            self.client = (client_factory or FakeDeterministicClient)()

        def _one(self, item: dict, text: str):
            formatted = reformat_text_with_line_numbers(text or "")
            instructions = render_prompt(prompt, {"input": item})
            rendered = _LINE_NUMBER_PROMPT.format(
                instructions=instructions, formatted_text=formatted
            )
            out = self.client.complete(rendered, schema)
            lines = formatted.split("\n") if formatted else []
            extracted = []
            for rng in out.get("line_ranges", []):
                if not isinstance(rng, dict):
                    continue
                start = rng.get("start_line", 0)
                end = rng.get("end_line", 0)
                if start < 1 or end < start or end > len(lines):
                    if skip_on_error:
                        continue  # extract.py:222-227
                    start = max(1, min(start, len(lines)))
                    end = max(start, min(end, len(lines)))
                content = []
                for i in range(start - 1, end):
                    line = lines[i]
                    if ": " in line:
                        line = line.split(": ", 1)[1]
                    content.append(line)
                extracted.append("".join(content))  # extract.py:246
            if format_extraction:
                return "\n\n".join(extracted)  # extract.py:467
            return extracted

        def __call__(self, batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            for col in doc_cols:
                vals = [self._one(r, r.get(col)) for r in rows]
                typ = pa.string() if format_extraction else pa.list_(pa.string())
                batch = batch.append_column(f"{col}{suffix}", pa.array(vals, typ))
            return batch

    return ds.map_batches(
        Stage, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


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
