"""Sample-driven pipeline rewrite optimizer — the ``docetl build``
surface (reference ``/root/reference/docetl/optimizer.py``,
``cli.py:18-198``) recast as deterministic, measurement-driven rewrites
over the same config vocabulary the runner executes.

The reference optimizer asks LLM agents to generate candidate rewrites
and judge them on samples (``optimizers/map_optimizer/``,
``optimizers/reduce_optimizer.py``, ``optimizers/join_optimizer.py``).
This recast keeps the same decision STRUCTURE — sample the op's input,
measure, rewrite when the measurement says the single-call plan breaks
— but computes every structural decision from sampled-data statistics,
so optimized plans are reproducible offline:

- **map chunking** (reference ``map_optimizer/plan_generators.py:48-366``
  chunk-size plans): when the p90 sampled document length exceeds ~75%
  of the model token budget, rewrite ``map`` into
  ``split -> gather -> map-per-chunk -> reduce(combine)``.  The chunk
  size comes from the same two-ladder candidate set the reference
  builds (``config_generators.py:412-455``); the recast picks the
  largest rung that fits instead of running an LLM-judged tournament
  over all rungs (the candidate ladder is recorded in the decision
  note for a real-client judge to re-rank).
- **reduce fold batching** (``reduce_optimizer.py:1271-1375``): estimate
  per-item prompt tokens from the sample, compute the max batch that
  fits the context window, and configure ``fold_prompt`` /
  ``fold_batch_size`` when the largest sampled group overflows a
  single call.  The fold prompt is a deterministic template transform
  of the reduce prompt (the reference synthesizes one with an agent,
  ``reduce_optimizer.py:1481-1645``); huge groups additionally get
  ``value_sampling`` (``_determine_value_sampling``,
  ``reduce_optimizer.py:769-954``).
- **synthesized resolve before reduce** (``join_optimizer.py:377-440``
  ``should_optimize`` + the optimizer's "empty resolve" insertion,
  ``optimizer.py:300-420``): sample distinct reduce-key values, measure
  pairwise n-gram similarity, and insert ``add_uuid -> resolve`` ahead
  of the reduce when near-duplicate keys exceed a fraction threshold,
  re-keying the reduce onto the canonical column.
- **resolve blocking threshold** (``join_optimizer.py:1200-1262``
  ``_find_optimal_threshold``): label sampled pairs (through the
  pluggable client when a ``comparison_prompt`` is configured, else
  with the op's own match metric), sweep 100 thresholds, keep the
  LARGEST with recall >= ``target_recall`` (0.95 like the reference),
  and record the sample selectivity.  (The reference importance-weights
  its pair sample, ``join_optimizer.py:1230-1242``; the recast compares
  ALL sample pairs, so plain mean is the unbiased estimate.)
- **equijoin strategy** (``join_optimizer.py:549-763``): the Ray-native
  physical decision — broadcast the right side when its estimated bytes
  fit the broadcast budget, else hash-shuffle both sides.

Where a judgment genuinely needs a model, the call routes through the
same pluggable client the prompt operators use (``stages/llm.py``) —
deterministic offline, a real API client when swapped in.  Every
rewritten op carries an ``_optimizer`` record of the measurements that
drove the decision.
"""

from __future__ import annotations

import copy
import json
import re
import statistics
from typing import Any

#: per-op-type sample sizes (reference ``optimizer.py:37-46``
#: SAMPLE_SIZE_MAP; reduce is groups-of-rows so it samples deeper)
SAMPLE_SIZE_MAP = {
    "reduce": 40, "map": 5, "resolve": 100, "equijoin": 100,
    "filter": 5, "split": 10, "gather": 10, "unnest": 10,
}

_TOKEN_RE = re.compile(r"\S+")
#: jinja refs like ``input.text`` / ``inputs[0].title`` -> field names
_PROMPT_VAR_RE = re.compile(r"inputs?(?:\[[^\]]*\])?\.([A-Za-z_]\w*)")


def _ntokens(s: str) -> int:
    """Whitespace token count — the same tokenizer ``split`` pins
    (``stages/unnest_split_gather.py:101``), so chunk-size decisions and
    the split op that executes them agree."""
    return len(_TOKEN_RE.findall(s or ""))


def _tok_str(v) -> str:
    """Render a sampled value for token counting: NULL counts zero
    tokens (the oracle's ``coalesce(text, '')``), everything else counts
    its rendered text — ``str(r.get(k) or "")`` would also swallow falsy
    0/False, which the engine's prompt renders as ``'0'``/``'False'``."""
    return "" if v is None else str(v)


def _prompt_fields(template: str) -> list[str]:
    """Field names a prompt template references (reference
    ``extract_jinja_variables``, ``reduce_optimizer.py:1306-1309``)."""
    seen: list[str] = []
    for m in _PROMPT_VAR_RE.finditer(template or ""):
        if m.group(1) not in seen:
            seen.append(m.group(1))
    return seen


def _row_tokens(row: dict, fields: list[str]) -> int:
    picked = {k: row[k] for k in fields if k in row}
    if not picked:  # no recognizable refs -> whole row, stay conservative
        picked = {k: v for k, v in row.items() if isinstance(v, str)}
    return _ntokens(json.dumps(picked, default=str))


def _chunk_ladder(doc_token_counts: list[int], token_limit: int,
                  num_chunks: int = 8) -> list[int]:
    """The reference's two-ladder chunk-size candidate set
    (``config_generators.py:412-455``): half the rungs interpolate up to
    ``min(0.75 * token_limit, avg_doc_len)``, half up to the average doc
    length capped at that word limit; merged, deduped, sorted."""
    avg_doc = sum(doc_token_counts) / max(1, len(doc_token_counts))
    word_limit = min(int(token_limit * 0.75), int(avg_doc))
    half = max(2, num_chunks // 2)

    def ladder(top: float, cap: int | None) -> list[int]:
        lo = max(20, int(0.15 * top))
        out = []
        for i in range(half):
            v = int(lo + i * (top - lo) / (half - 1))
            out.append(min(v, cap) if cap is not None else v)
        return out

    return sorted(set(ladder(word_limit, None) + ladder(avg_doc, word_limit)))


def _pair_similarity(a: str, b: str) -> float:
    """Case-folded char-3-gram Jaccard — the optimizer's duplicate
    metric (the executing resolve op applies its own match metric)."""
    from .stages.dedup import jaccard_ngram

    return jaccard_ngram((a or "").lower(), (b or "").lower(), k=3)


def _cosine(a, b) -> float:
    num = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(y * y for y in b) ** 0.5
    if na == 0 or nb == 0:
        return 0.0
    return num / (na * nb)


def find_optimal_threshold(
    labels: list[bool], sims: list[float], *, target_recall: float = 0.95,
) -> tuple[float, float]:
    """Reference ``_find_optimal_threshold``
    (``join_optimizer.py:1200-1262``): sweep 100 thresholds over [0, 1],
    keep the LARGEST whose recall over the labeled pairs is >=
    ``target_recall`` (fall back to the max-recall threshold when none
    qualifies).  Returns ``(threshold, selectivity)``; selectivity is
    the plain positive fraction — the recast labels ALL sampled pairs,
    so no importance reweighting is needed."""
    if not labels:
        return 0.0, 0.0
    n_pos = sum(labels)
    best, best_recall, best_recall_thr = None, -1.0, 0.0
    for i in range(100):
        thr = i / 99.0
        tp = sum(1 for lab, s in zip(labels, sims) if lab and s >= thr)
        recall = tp / n_pos if n_pos else 1.0
        if recall > best_recall:
            best_recall, best_recall_thr = recall, thr
        if recall >= target_recall:
            best = thr  # keep climbing: LARGEST valid threshold
    if best is None:
        best = best_recall_thr
    # floor, not round: rounding UP past the chosen grid point would
    # exclude pairs sitting exactly at it (e.g. token Jaccard 2/3 vs
    # grid 66/99) when the executing op compares with >=
    best = int(best * 10000) / 10000
    return best, (n_pos / len(labels))


_RAW_RE = re.compile(r"\{%\s*raw\s*%\}.*?\{%\s*endraw\s*%\}", re.DOTALL)


def _sub_field_refs(prompt: str, field: str, repl: str,
                    var: str | None = None) -> str:
    """Rewrite ``.{field}`` references to ``.{repl}`` OUTSIDE
    ``{% raw %}`` regions only — raw blocks are quoted task text (e.g.
    doc_chunking's combine prompt embeds the original map prompt there)
    and must stay byte-identical.  The ``\\b`` word boundary keeps a
    reference to ``input.text_summary`` intact when ``field`` is
    ``text``; a plain substring replace would corrupt it.

    With ``var`` the rewrite is anchored to that variable only
    (``var="input"`` rewrites ``input.text`` but leaves a loop var's
    ``c.text`` and a nested ``input.meta.text`` alone — only the
    top-level column is renamed by a split/gather plan).  Without it,
    ``.{field}`` after ANY variable rewrites — the reduce-prompt case,
    where rows are reached through an arbitrary loop variable
    (``{% for item in inputs %}{{ item.text }}``)."""
    if var is not None:
        pat = re.compile(r"\b%s(\s*\.\s*)%s\b" % (re.escape(var),
                                                  re.escape(field)))
        sub = lambda s: pat.sub(lambda m: var + m.group(1) + repl, s)  # noqa: E731
    else:
        pat = re.compile(r"\.(\s*)%s\b" % re.escape(field))
        sub = lambda s: pat.sub(lambda m: "." + m.group(1) + repl, s)  # noqa: E731
    out, pos = [], 0
    for m in _RAW_RE.finditer(prompt):
        out.append(sub(prompt[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(sub(prompt[pos:]))
    return "".join(out)


def build_chunk_plan(op: dict, split_key: str, chunk_tokens: int,
                     note: dict | None = None) -> list[dict]:
    """Expand a prompt map into the reference's chunked plan shape —
    ``split -> gather -> map-per-chunk -> reduce(combine)``
    (``map_optimizer/operation_creators.py``); shared by the v1
    optimizer's budget-gated rewrite and the MOAR ``doc_chunking``
    directive's per-rung candidates."""
    prompt = op["prompt"]
    name = op.get("name", "map")
    split_name = f"{name}_split"
    content = f"{split_key}_chunk"
    doc_id = f"{split_name}_id"
    order = f"{split_name}_chunk_num"
    rendered = f"{content}_rendered"
    sub_prompt = _sub_field_refs(prompt, split_key, rendered, var="input")
    schema = op["output"]["schema"]
    # render ONLY the submap's output fields per chunk: a chunk row still
    # carries the full original document (split keeps every input column),
    # so "{{ item }}" would re-embed the whole doc once per chunk and blow
    # the very token budget this rewrite enforces
    item_fields = " ".join("{{ item.%s }}" % k for k in schema)
    combine_prompt = (
        "The original task, applied per chunk of a long document, "
        "was:\n\"{% raw %}" + prompt + "{% endraw %}\"\n\n"
        "Combine the per-chunk outputs below into one output for the "
        "whole document, following the original instruction:\n"
        "{% for item in inputs %}" + item_fields + "\n{% endfor %}"
    )
    split_op = {"name": split_name, "type": "split", "split_key": split_key,
                "method": "token_count",
                "method_kwargs": {"num_tokens": chunk_tokens}}
    if note is not None:
        split_op["_optimizer"] = note
    return [
        split_op,
        {"name": f"{name}_gather", "type": "gather",
         "content_key": content, "doc_id_key": doc_id,
         "order_key": order,
         "peripheral_chunks": {"previous": 1, "next": 1}},
        # the submap drops the chunk-internal columns once the prompt has
        # rendered them (the gathered context column is chunk-sized —
        # passing it through the combine would bloat every output row)
        dict(op, name=f"{name}_submap", prompt=sub_prompt,
             optimize=False,
             drop_keys=sorted(set(op.get("drop_keys") or [])
                              | {content, order, rendered})),
        # pass_through: the original map PRESERVES its input columns, so
        # the rewrite must too — downstream ops (e.g. a reduce grouping
        # on another column) break if the combine strips them.  The
        # combine also inherits the op's pinned model: a newly-created
        # prompt op without one would silently run on the ENGINE default
        # while a simulator/search uses its own default-model state
        {"name": f"{name}_combine", "type": "reduce",
         "reduce_key": doc_id, "prompt": combine_prompt,
         "pass_through": True,
         **({"model": op["model"]} if op.get("model") else {}),
         "output": {"schema": schema}},
    ]


class Optimizer:
    """Rewrite the operations marked ``optimize: true`` in a runner
    config (reference ``Optimizer``, ``optimizer.py:48-745``), returning
    a new config.  Deterministic: same config + same data -> same plan.
    """

    def __init__(
        self,
        config: dict,
        *,
        client_factory=None,
        token_limit: int = 8192,
        target_recall: float = 0.95,
        sample_limit: int = 100,
        broadcast_limit_bytes: int = 100 * 1024 * 1024,
        duplicate_key_sim: float = 0.7,
        duplicate_key_frac: float = 0.05,
    ):
        self.config = config
        self.client_factory = client_factory
        self.token_limit = token_limit
        self.target_recall = target_recall
        self.sample_limit = sample_limit
        self.broadcast_limit = broadcast_limit_bytes
        self.dup_sim = duplicate_key_sim
        self.dup_frac = duplicate_key_frac
        self._ds_rows: dict[str, list[dict]] = {}

    # -- sampling ----------------------------------------------------------

    def _dataset_rows(self, name: str) -> list[dict]:
        """First-``sample_limit`` rows of a dataset or a prior step's
        sampled output (the reference caches sampled intermediates the
        same way, ``containers.py:451-465``)."""
        if name not in self._ds_rows:
            from .runner import _load_dataset

            cfg = self.config.get("datasets", {}).get(name)
            if cfg is None:
                raise ValueError(f"unknown dataset {name!r} during optimize")
            self._ds_rows[name] = (
                _load_dataset(cfg).limit(self.sample_limit).take_all()
            )
        return self._ds_rows[name]

    def _advance_sample(self, rows: list[dict], op: dict) -> list[dict]:
        """Run one (possibly already-rewritten) op over the sample rows so
        downstream ops see representative input."""
        import ray.data as rd

        from .runner import _apply_op

        if not rows:
            return rows
        ds = rd.from_items(rows)
        if op["type"] in ("equijoin", "asof_join"):
            right = rd.from_items(self._dataset_rows(op["right"]))
            if op["type"] == "asof_join":
                from .stages.asof import asof_join

                out = asof_join(ds, right, on=op["on"], by=op["by"],
                                how=op.get("how", "left"))
            else:
                from .stages.joins import broadcast_join

                out = broadcast_join(ds, right, on=op["on"],
                                     right_on=op.get("right_on"),
                                     how=op.get("how", "inner"))
        else:
            out = _apply_op(ds, op)
        return out.limit(self.sample_limit).take_all()

    # -- per-op rewrites ---------------------------------------------------

    def _optimize_map(self, op: dict, rows: list[dict]) -> list[dict]:
        """Chunking directive: map over long docs -> split/gather/
        submap/combine (reference ``map_optimizer/plan_generators.py:
        48-366`` + ``operation_creators.py``)."""
        prompt = op.get("prompt")
        if not prompt or not rows:
            return [op]
        fields = [f for f in _prompt_fields(prompt) if f in rows[0]]
        if not fields:
            return [op]
        # the split key is the referenced field carrying the most tokens
        split_key = max(
            fields,
            key=lambda f: sum(_ntokens(_tok_str(r.get(f))) for r in rows),
        )
        counts = sorted(_ntokens(_tok_str(r.get(split_key))) for r in rows)
        p90 = counts[min(len(counts) - 1, int(0.9 * (len(counts) - 1)))]
        budget = int(self.token_limit * 0.75)
        if p90 <= budget:
            return [dict(op, _optimizer={
                "decision": "unchanged", "p90_doc_tokens": p90,
                "token_budget": budget,
            })]
        ladder = _chunk_ladder(counts, self.token_limit)
        chunk = max((c for c in ladder if c <= budget), default=ladder[0])
        note = {
            "decision": "chunked", "p90_doc_tokens": p90,
            "token_budget": budget, "chunk_tokens": chunk,
            "candidate_chunk_sizes": ladder, "split_key": split_key,
        }
        return build_chunk_plan(op, split_key, chunk, note=note)

    def _optimize_reduce(self, op: dict, rows: list[dict]) -> list[dict]:
        prompt = op.get("prompt")
        if not prompt or not rows:
            return [op]
        key = op.get("reduce_key", "_all")
        keys = [key] if isinstance(key, str) else list(key)
        note: dict[str, Any] = {}
        chain: list[dict] = []
        op = dict(op)

        # 1. duplicate-key analysis -> synthesized resolve
        #    (join_optimizer.py:377-440; optimizer.py "empty resolve")
        if (len(keys) == 1 and keys[0] != "_all"
                and isinstance(rows[0].get(keys[0]), str)):
            k = keys[0]
            distinct = sorted({r[k] for r in rows if r.get(k) is not None})
            cap = SAMPLE_SIZE_MAP["resolve"]
            distinct = distinct[:cap]
            pairs = [
                (a, b)
                for i, a in enumerate(distinct)
                for b in distinct[i + 1:]
            ]
            if pairs:
                sims = [_pair_similarity(a, b) for a, b in pairs]
                dup_frac = sum(s >= self.dup_sim for s in sims) / len(pairs)
                note["duplicate_key_fraction"] = round(dup_frac, 4)
                if dup_frac >= self.dup_frac:
                    # tune the resolve threshold in the metric the op
                    # EXECUTES (token Jaccard, resolve.py:91), labeling
                    # pairs with the duplicate metric — the reference's
                    # label-then-sweep (_find_optimal_threshold)
                    from .stages.resolve import token_jaccard

                    labels = [s >= self.dup_sim for s in sims]
                    exec_sims = [token_jaccard(a, b) for a, b in pairs]
                    match_thr, _ = find_optimal_threshold(
                        labels, exec_sims, target_recall=self.target_recall
                    )
                    name = op.get("name", "reduce")
                    canon = f"{k}_canonical"
                    block = f"{k}_block"
                    # synthesized blocking rule: normalized key prefix —
                    # the deterministic recast of the reference's
                    # LLM-generated blocking predicates
                    # (join_optimizer.py:1262-1379); near-duplicate keys
                    # must share a block or the resolve never compares
                    # them
                    block_code = (
                        "def transform(doc):\n"
                        f"    k = str(doc.get({k!r}) or '').lower()\n"
                        "    k = ''.join(ch for ch in k if ch.isalnum())\n"
                        f"    return {{{block!r}: k[:4]}}\n"
                    )
                    chain += [
                        {"name": f"{name}_key_id", "type": "add_uuid",
                         "key_cols": [k], "id_key": f"{name}_key_id"},
                        {"name": f"{name}_key_block", "type": "code_map",
                         "code": block_code},
                        {"name": f"{name}_resolve", "type": "resolve",
                         "blocking_key": block, "comparison_key": k,
                         "id_key": f"{name}_key_id",
                         "threshold": match_thr, "output_key": canon,
                         "_optimizer": {
                             "decision": "synthesized_resolve",
                             "duplicate_key_fraction": round(dup_frac, 4),
                             "match_threshold": match_thr,
                         }},
                    ]
                    op["reduce_key"] = canon
                    keys = [canon]
                    # the sample doesn't have the canonical column yet;
                    # group stats below fall back to the raw key
                    group_key = k
                else:
                    group_key = k
            else:
                group_key = k
        else:
            group_key = keys[0] if keys and keys[0] != "_all" else None

        # 2. fold batching (reduce_optimizer.py:1271-1375)
        fields = _prompt_fields(prompt)
        prompt_tokens = _ntokens(prompt)
        item_tokens = [_row_tokens(r, fields) for r in rows]
        avg_in = max(1, int(statistics.mean(item_tokens)))
        avg_out = avg_in  # sample-output estimate stand-in
        max_batch = max(
            1, (self.token_limit - prompt_tokens - avg_out) // avg_in
        )
        if group_key is None:
            groups = {None: rows}
        else:
            groups: dict[Any, list[dict]] = {}
            for r in rows:
                groups.setdefault(r.get(group_key), []).append(r)
        largest = max(len(g) for g in groups.values())
        note.update(
            avg_item_tokens=avg_in, max_batch_size=int(max_batch),
            largest_sampled_group=largest,
        )
        if largest > max_batch and not op.get("fold_prompt"):
            # reference evaluates batch-size rungs 0.1..0.9 of max with a
            # judge (reduce_optimizer.py:1325-1337); recast pins the 0.75
            # rung and records the ladder
            op["fold_batch_size"] = max(1, int(max_batch * 0.75))
            op["fold_prompt"] = (
                "Below is the current accumulated output of this reduce "
                "operation:\n{{ output }}\n\nFold the following new batch "
                "of inputs into it, following the original instruction.\n"
                + prompt
            )
            note["decision"] = "fold_batching"
            note["batch_size_candidates"] = sorted(
                {max(1, int(max_batch * f)) for f in
                 (0.1, 0.2, 0.4, 0.6, 0.75, 0.9)}
            )
        # 3. value sampling for pathological groups
        #    (reduce_optimizer.py:769-954)
        largest_tokens = max(
            sum(_row_tokens(r, fields) for r in g) for g in groups.values()
        )
        if largest_tokens > 20 * self.token_limit and not op.get("value_sampling"):
            op["value_sampling"] = {
                "enabled": True, "method": "random",
                "sample_size": int(max_batch) * 10,
            }
            note["value_sampling"] = "enabled"
        # every rewrite path carries an explicit decision (the map path
        # sets chunked/unchanged); a resolve-only or sampling-only
        # rewrite must be distinguishable without parsing the chain —
        # "unchanged" is reserved for a genuinely untouched op
        note.setdefault(
            "decision",
            "synthesized_resolve" if chain
            else ("value_sampling" if "value_sampling" in note
                  else "unchanged"),
        )
        op["_optimizer"] = note
        return chain + [op]

    def _label_pairs(self, op: dict, pairs, texts_a, texts_b) -> list[bool]:
        """Label sampled pairs: through the pluggable client when the op
        has a comparison_prompt (join_optimizer.py:1127-1161), else with
        the op's own match metric."""
        cmp_prompt = op.get("comparison_prompt")
        if cmp_prompt and self.client_factory is not None:
            from .stages.llm import render_prompt

            client = self.client_factory()
            out = []
            for a, b in pairs:
                res = client.complete(
                    render_prompt(cmp_prompt, {"input1": a, "input2": b}),
                    {"is_match": "bool"},
                )
                out.append(bool(res.get("is_match")))
            return out
        thr = op.get("threshold", 0.5)
        return [
            _pair_similarity(ta, tb) >= thr
            for ta, tb in zip(texts_a, texts_b)
        ]

    def _optimize_resolve(self, op: dict, rows: list[dict]) -> list[dict]:
        """Pick the embedding blocking threshold from labeled sample
        pairs (join_optimizer.py:440-548 optimize_resolve)."""
        emb = op.get("embedding_key")
        text = op.get("comparison_key") or op.get("blocking_key")
        if not rows or text not in rows[0]:
            return [op]
        sample = rows[: SAMPLE_SIZE_MAP["resolve"]]
        pairs = [
            (sample[i], sample[j])
            for i in range(len(sample))
            for j in range(i + 1, len(sample))
        ]
        if not pairs:
            return [op]
        texts_a = [str(a.get(text, "")) for a, _ in pairs]
        texts_b = [str(b.get(text, "")) for _, b in pairs]
        # sweep the threshold in the metric the op EXECUTES: cosine for
        # embedding blocking (resolve_embedding_blocked), token Jaccard
        # for resolve_fuzzy (resolve.py token_jaccard) — labeling may use
        # a different metric (char-3-gram / LLM), but a threshold tuned
        # in char-3-gram space and executed in token space silently
        # breaks the target_recall guarantee
        have_emb = bool(emb) and emb in sample[0]
        if have_emb:
            sims = [_cosine(a[emb], b[emb]) for a, b in pairs]
        else:
            from .stages.resolve import token_jaccard

            sims = [
                token_jaccard(ta, tb)
                for ta, tb in zip(texts_a, texts_b)
            ]
        labels = self._label_pairs(op, pairs, texts_a, texts_b)
        thr, selectivity = find_optimal_threshold(
            labels, sims, target_recall=self.target_recall
        )
        out = dict(op)
        if have_emb:
            out["blocking_threshold"] = thr
        elif "threshold" not in out:
            out["threshold"] = thr
        out["_optimizer"] = {
            "decision": "blocking_threshold", "threshold": thr,
            "sample_pairs": len(pairs),
            "selectivity_estimate": round(selectivity, 4),
            "target_recall": self.target_recall,
        }
        return [out]

    def _optimize_equijoin(self, op: dict) -> list[dict]:
        """Broadcast vs hash-shuffle from the sampled right-side size —
        the Ray-native physical choice standing in for the reference's
        blocking-rule search (join_optimizer.py:549-763)."""
        if op.get("comparison_prompt"):
            return [op]  # LLM equijoin keeps its blocking config
        from .runner import _load_dataset

        cfg = self.config.get("datasets", {}).get(op["right"])
        if cfg is None:
            return [op]
        ds = _load_dataset(cfg)
        n = ds.count()
        sample = ds.limit(min(self.sample_limit, 100)).take_all()
        if not sample:
            return [op]
        avg_bytes = statistics.mean(
            len(json.dumps(r, default=str)) for r in sample
        )
        est = int(avg_bytes * n)
        strategy = "broadcast" if est <= self.broadcast_limit else "hash"
        return [dict(op, strategy=strategy, _optimizer={
            "decision": "join_strategy", "strategy": strategy,
            "right_rows": int(n), "est_right_bytes": est,
            "broadcast_limit_bytes": self.broadcast_limit,
        })]

    # -- driver ------------------------------------------------------------

    def optimize(self) -> dict:
        """Return a rewritten copy of the config: every op marked
        ``optimize: true`` is analyzed on a sample and replaced by its
        rewrite chain; steps are updated to run the new chains in place.
        """
        cfg = copy.deepcopy(self.config)
        ops_by_name = {o["name"]: o for o in cfg.get("operations", [])}
        new_ops: list[dict] = []
        emitted: set[str] = set()
        consumed: set[str] = set()  # originals replaced by a rewrite

        last_rows: list[dict] = []
        for step in cfg.get("pipeline", {}).get("steps", []):
            # runner semantics: a step without an explicit "input"
            # consumes the PREVIOUS step's output (runner.py run()), so
            # its sample is the previous step's advanced sample — not []
            rows = (
                list(self._dataset_rows(step["input"]))
                if step.get("input") else list(last_rows)
            )
            new_chain: list[str] = []
            for op_name in step.get("operations", []):
                op = ops_by_name[op_name]
                if op.get("optimize"):
                    t = op["type"]
                    if t in ("map", "llm_map") and "code" not in op:
                        rewritten = self._optimize_map(op, rows)
                    elif t in ("reduce", "llm_reduce") and "code" not in op:
                        rewritten = self._optimize_reduce(op, rows)
                    elif t == "resolve":
                        rewritten = self._optimize_resolve(op, rows)
                    elif t == "equijoin":
                        rewritten = self._optimize_equijoin(op)
                    else:
                        rewritten = [op]
                else:
                    rewritten = [op]
                consumed.add(op_name)
                for new_op in rewritten:
                    if new_op["name"] not in emitted:
                        emitted.add(new_op["name"])
                        new_ops.append(new_op)
                    new_chain.append(new_op["name"])
                    rows = self._advance_sample(rows, new_op)
            step["operations"] = new_chain
            self._ds_rows[step["name"]] = rows
            last_rows = rows
        # ops not referenced by any step (kept verbatim)
        for o in cfg.get("operations", []):
            if o["name"] not in emitted and o["name"] not in consumed:
                new_ops.append(o)
        cfg["operations"] = new_ops
        return cfg


def optimize_config(config: dict, **kwargs) -> dict:
    """One-shot convenience: ``optimize_config(cfg)`` -> rewritten cfg
    (the reference's ``runner.optimize()`` surface,
    ``runner.py:686-751``)."""
    return Optimizer(config, **kwargs).optimize()
