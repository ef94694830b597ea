"""Sample-driven rewrite optimizer (docetl_ray/optimizer.py — the
``docetl build`` recast): chunking, fold batching, synthesized resolve,
blocking-threshold selection, join strategy, CLI build."""

import yaml

from docetl_ray.optimizer import (
    Optimizer,
    _chunk_ladder,
    find_optimal_threshold,
    optimize_config,
)
from docetl_ray.runner import PipelineRunner


def _long_doc(i: int, n_tokens: int = 1200) -> str:
    return " ".join(f"w{i}t{j}" for j in range(n_tokens))


def _map_config(docs, optimize=True):
    return {
        "datasets": {"docs": {"type": "memory", "data": docs}},
        "operations": [
            {"name": "summarize", "type": "map", "optimize": optimize,
             "prompt": "Summarize: {{ input.text }}",
             "output": {"schema": {"summary": "str"}}},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "docs", "operations": ["summarize"]},
        ]},
    }


def test_map_chunking_rewrite_triggers_on_long_docs(ray_session):
    docs = [{"doc_id": i, "text": _long_doc(i)} for i in range(4)]
    cfg = optimize_config(_map_config(docs), token_limit=400, sample_limit=10)
    names = [o["name"] for o in cfg["operations"]]
    assert names == ["summarize_split", "summarize_gather",
                     "summarize_submap", "summarize_combine"]
    assert cfg["pipeline"]["steps"][0]["operations"] == names
    split = cfg["operations"][0]
    assert split["method_kwargs"]["num_tokens"] <= 300  # 0.75 * limit
    sub = cfg["operations"][2]
    assert "text_chunk_rendered" in sub["prompt"]
    # the rewritten plan must RUN and produce one row per document
    out = PipelineRunner(cfg).run()
    rows = out.take_all()
    assert len(rows) == 4
    assert all("summary" in r for r in rows)


def test_chunking_rewrite_collapses_byte_identical_docs(ray_session):
    # Split ids are content hashes (deterministic, oracle-recomputable),
    # so byte-identical documents share an id and the combine reduce
    # merges them — documented recast divergence from the reference's
    # per-document uuid4 (unnest_split_gather.py split()).
    docs = [{"doc_id": i, "text": _long_doc(0)} for i in range(4)]
    cfg = optimize_config(_map_config(docs), token_limit=400, sample_limit=10)
    assert len(cfg["operations"]) == 4
    rows = PipelineRunner(cfg).run().take_all()
    assert len(rows) == 1


def test_map_short_docs_left_unchanged(ray_session):
    docs = [{"doc_id": i, "text": f"short doc {i}"} for i in range(4)]
    cfg = optimize_config(_map_config(docs), token_limit=400, sample_limit=10)
    names = [o["name"] for o in cfg["operations"]]
    assert names == ["summarize"]
    assert cfg["operations"][0]["_optimizer"]["decision"] == "unchanged"


def test_reduce_fold_batching_configured_for_large_groups(ray_session):
    rows = [{"grp": "g", "text": " ".join(f"t{i}w{j}" for j in range(40))}
            for i in range(60)]
    cfg = {
        "datasets": {"d": {"type": "memory", "data": rows}},
        "operations": [
            {"name": "agg", "type": "reduce", "optimize": True,
             "reduce_key": "grp",
             "prompt": "Combine: {% for item in inputs %}"
                       "{{ item.text }}{% endfor %}",
             "output": {"schema": {"combined": "str"}}},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "d", "operations": ["agg"]},
        ]},
    }
    out_cfg = optimize_config(cfg, token_limit=600, sample_limit=100)
    agg = [o for o in out_cfg["operations"] if o["name"] == "agg"][0]
    assert agg.get("fold_batch_size", 0) >= 1
    assert "fold_prompt" in agg and "{{ output }}" in agg["fold_prompt"]
    note = agg["_optimizer"]
    assert note["largest_sampled_group"] > note["max_batch_size"]
    result = PipelineRunner(out_cfg).run().take_all()
    assert len(result) == 1 and "combined" in result[0]


def test_duplicate_reduce_keys_insert_synthesized_resolve(ray_session):
    variants = ["Acme Corporation", "acme corporation", "Acme Corporation.",
                "ACME corporation", "acme Corporation Inc"]
    rows = [{"company": variants[i % len(variants)], "v": i}
            for i in range(25)]
    cfg = {
        "datasets": {"d": {"type": "memory", "data": rows}},
        "operations": [
            {"name": "roll", "type": "reduce", "optimize": True,
             "reduce_key": "company",
             "prompt": "Summarize: {% for item in inputs %}"
                       "{{ item.v }}{% endfor %}",
             "output": {"schema": {"note": "str"}}},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "d", "operations": ["roll"]},
        ]},
    }
    out_cfg = optimize_config(cfg, sample_limit=100)
    names = [o["name"] for o in out_cfg["operations"]]
    assert names == ["roll_key_id", "roll_key_block", "roll_resolve", "roll"]
    roll = out_cfg["operations"][-1]
    assert roll["reduce_key"] == "company_canonical"
    # near-duplicate key variants must collapse: 5 variants -> 1 group
    result = PipelineRunner(out_cfg).run().take_all()
    assert len(result) == 1


def test_clean_reduce_keys_do_not_insert_resolve(ray_session):
    rows = [{"company": f"zq{i}xv{i * 7}", "v": i} for i in range(20)]
    cfg = {
        "datasets": {"d": {"type": "memory", "data": rows}},
        "operations": [
            {"name": "roll", "type": "reduce", "optimize": True,
             "reduce_key": "company",
             "prompt": "N: {% for item in inputs %}{{ item.v }}{% endfor %}",
             "output": {"schema": {"note": "str"}}},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "d", "operations": ["roll"]},
        ]},
    }
    out_cfg = optimize_config(cfg, sample_limit=100)
    assert [o["name"] for o in out_cfg["operations"]] == ["roll"]


def test_find_optimal_threshold_semantics():
    # positives at >= 0.8, negatives at <= 0.3: the largest threshold
    # with recall >= 0.95 sits at the top of the gap
    labels = [True] * 10 + [False] * 30
    sims = [0.8 + 0.01 * i for i in range(10)] + [0.01 * i for i in range(30)]
    thr, sel = find_optimal_threshold(labels, sims, target_recall=0.95)
    assert 0.75 <= thr <= 0.8
    assert abs(sel - 0.25) < 1e-9
    # one straggler positive at 0.4 forces the threshold down to keep
    # 10/10 recall (9/10 = 0.9 < 0.95)
    labels2 = [True] * 10 + [False] * 30
    sims2 = [0.4] + [0.8] * 9 + [0.01 * i for i in range(30)]
    thr2, _ = find_optimal_threshold(labels2, sims2, target_recall=0.95)
    assert thr2 <= 0.4


def test_chunk_ladder_matches_reference_shape():
    ladder = _chunk_ladder([1000] * 5, token_limit=400)
    assert ladder == sorted(set(ladder))
    assert min(ladder) >= 20
    assert max(ladder) <= 300  # word_limit = 0.75 * 400


def test_resolve_blocking_threshold_from_labeled_pairs(ray_session):
    # two tight clusters in embedding space whose texts match within
    # clusters: optimal blocking threshold separates them
    rows = []
    for i in range(12):
        c = i % 2
        base = [1.0, 0.0] if c == 0 else [0.0, 1.0]
        emb = [base[0] + 0.01 * i, base[1] + 0.01 * i]
        name = f"Acme Corporation unit {i}" if c == 0 \
            else f"Zenith Widget Works {i}"
        rows.append({"rid": i, "name": name, "emb": emb})
    cfg = {
        "datasets": {"d": {"type": "memory", "data": rows}},
        "operations": [
            {"name": "res", "type": "resolve", "optimize": True,
             "blocking_key": "name", "comparison_key": "name",
             "id_key": "rid", "embedding_key": "emb",
             "threshold": 0.6},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "d", "operations": ["res"]},
        ]},
    }
    out_cfg = optimize_config(cfg, sample_limit=100)
    res = out_cfg["operations"][0]
    thr = res["blocking_threshold"]
    assert 0.0 < thr < 1.0
    note = res["_optimizer"]
    assert note["decision"] == "blocking_threshold"
    assert note["sample_pairs"] == 66
    # within-cluster cosine ~1, cross ~0; recall target keeps the
    # threshold above the cross-cluster band
    assert thr > 0.5


def test_equijoin_strategy_by_right_size(ray_session):
    left = [{"k": i, "lv": i} for i in range(10)]
    right = [{"k": i, "rv": i * 2} for i in range(10)]
    cfg = {
        "datasets": {"l": {"type": "memory", "data": left},
                     "r": {"type": "memory", "data": right}},
        "operations": [
            {"name": "j", "type": "equijoin", "optimize": True,
             "right": "r", "on": "k"},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "l", "operations": ["j"]},
        ]},
    }
    small = optimize_config(cfg, sample_limit=100)
    assert small["operations"][0]["strategy"] == "broadcast"
    big = Optimizer(cfg, broadcast_limit_bytes=1).optimize()
    assert big["operations"][0]["strategy"] == "hash"
    out = PipelineRunner(small).run().take_all()
    assert len(out) == 10 and all("rv" in r for r in out)


def test_cli_build_writes_optimized_yaml(tmp_path, ray_session):
    from docetl_ray.cli import cmd_build

    docs = [{"doc_id": i, "text": _long_doc(i)} for i in range(3)]
    path = tmp_path / "pipe.yaml"
    path.write_text(yaml.safe_dump(_map_config(docs)))

    class A:
        pipeline = str(path)
        output = None
        sample_limit = 10
        token_limit = 400

    assert cmd_build(A()) == 0
    out_path = tmp_path / "pipe_opt.yaml"
    assert out_path.exists()
    opt = yaml.safe_load(out_path.read_text())
    assert [o["name"] for o in opt["operations"]] == [
        "summarize_split", "summarize_gather", "summarize_submap",
        "summarize_combine"]
    assert all("_optimizer" not in o for o in opt["operations"])
    rows = PipelineRunner(opt).run().take_all()
    assert len(rows) == 3


def test_pipeline_api_optimize(ray_session):
    from docetl_ray.api import Pipeline

    docs = [{"doc_id": i, "text": _long_doc(i)} for i in range(3)]
    p = Pipeline.from_dict(_map_config(docs))
    p2 = p.optimize(token_limit=400, sample_limit=10)
    assert [o.name for o in p2.operations] == [
        "summarize_split", "summarize_gather", "summarize_submap",
        "summarize_combine"]
    rows = p2.run().take_all()
    assert len(rows) == 3


def test_sub_field_refs_var_anchor_and_any_prefix():
    """build_chunk_plan rewrites only the INPUT variable's split-key
    reference: loop variables (``c.text``), nested objects
    (``input.meta.text``), and suffixed names (``input.text_summary``)
    must survive untouched.  Without ``var`` (the reduce-prompt caller,
    where rows ride an arbitrary loop variable) any prefix rewrites."""
    from docetl_ray.optimizer import _sub_field_refs, build_chunk_plan

    p = ("Summarize {{ input.text }}. "
         "{% for c in input.comments %}{{ c.text }}{% endfor %} "
         "{{ input.meta.text }} {{ input.text_summary }} "
         "{% raw %}{{ input.text }}{% endraw %}")
    got = _sub_field_refs(p, "text", "text_chunk_rendered", var="input")
    assert "{{ input.text_chunk_rendered }}." in got
    assert "{{ c.text }}" in got
    assert "{{ input.meta.text }}" in got
    assert "{{ input.text_summary }}" in got
    assert "{% raw %}{{ input.text }}{% endraw %}" in got

    any_pref = _sub_field_refs("{{ item.text }} {{ doc.text }}",
                               "text", "text_notes")
    assert any_pref == "{{ item.text_notes }} {{ doc.text_notes }}"

    op = {"name": "m", "type": "map", "prompt": p,
          "output": {"schema": {"summary": "str"}}}
    sub = build_chunk_plan(op, "text", 100)[2]
    assert "{{ c.text }}" in sub["prompt"]
    assert "{{ input.meta.text }}" in sub["prompt"]


def test_tok_str_null_vs_falsy():
    """NULL counts zero tokens; falsy non-null values (0, False) count
    their rendered text — what the engine's prompt actually emits."""
    from docetl_ray.optimizer import _ntokens, _tok_str

    assert _ntokens(_tok_str(None)) == 0
    assert _ntokens(_tok_str(0)) == 1
    assert _ntokens(_tok_str(False)) == 1
    assert _ntokens(_tok_str("a b")) == 2


def test_implicit_input_step_still_optimized(ray_session):
    """A step without an explicit 'input' consumes the previous step's
    output (runner semantics) — the optimizer must sample it the same
    way instead of silently disabling every rewrite with an empty
    sample."""
    docs = [{"doc_id": i, "text": _long_doc(i)} for i in range(4)]
    cfg = _map_config(docs)
    op = cfg["operations"][0]
    cfg["operations"] = [
        {"name": "noop", "type": "code_map",
         "code": "def transform(doc):\n    return {}\n"},
        op,
    ]
    cfg["pipeline"]["steps"] = [
        {"name": "s1", "input": "docs", "operations": ["noop"]},
        {"name": "s2", "operations": [op["name"]]},  # implicit input
    ]
    out_cfg = optimize_config(cfg, token_limit=400, sample_limit=10)
    names = [o["name"] for o in out_cfg["operations"]]
    assert "summarize_split" in names, names  # rewrite DID trigger
    rows = PipelineRunner(out_cfg).run().take_all()
    assert len(rows) == 4 and all("summary" in r for r in rows)


def test_chunk_plan_combine_preserves_columns_and_budget(ray_session):
    """The combine reduce passes the original columns through and its
    prompt renders only the submap's OUTPUT fields — never the whole
    chunk row (which still carries the full original document)."""
    from docetl_ray.optimizer import build_chunk_plan

    op = {"name": "m", "type": "map", "prompt": "Do:\n{{ input.text }}",
          "model": "det-mini", "output": {"schema": {"summary": "str"}}}
    plan = build_chunk_plan(op, "text", 100)
    combine = plan[3]
    assert combine["pass_through"] is True
    assert combine["model"] == "det-mini"  # inherits the pinned model
    assert "{{ item.summary }}" in combine["prompt"]
    assert "{{ item }}" not in combine["prompt"]
    # the submap drops the chunk-internal columns after rendering
    assert set(plan[2]["drop_keys"]) == {
        "text_chunk", "m_split_chunk_num", "text_chunk_rendered"}
    # end-to-end: downstream columns survive the rewritten plan
    docs = [{"doc_id": i, "lang": ["en", "fr"][i % 2],
             "text": _long_doc(i)} for i in range(4)]
    rows = PipelineRunner({
        "datasets": {"docs": {"type": "memory", "data": docs}},
        "operations": plan,
        "pipeline": {"steps": [
            {"name": "s1", "input": "docs",
             "operations": [o["name"] for o in plan]},
        ]},
    }).run().take_all()
    assert len(rows) == 4
    assert {r["lang"] for r in rows} == {"en", "fr"}
    assert all("text_chunk_rendered" not in r for r in rows)


def test_resolve_threshold_swept_in_execution_metric(ray_session):
    """Without a usable embedding column the resolve threshold must be
    tuned in TOKEN-Jaccard space (what resolve_fuzzy executes), and a
    declared-but-missing embedding_key must NOT write a char-gram-tuned
    value into the cosine blocking_threshold."""
    rows = []
    for i in range(10):
        c = i % 2
        name = f"Acme Corporation unit {i}" if c == 0 \
            else f"Zenith Widget Works {i}"
        rows.append({"rid": i, "name": name})
    cfg = {
        "datasets": {"d": {"type": "memory", "data": rows}},
        "operations": [
            {"name": "res", "type": "resolve", "optimize": True,
             "blocking_key": "name", "comparison_key": "name",
             "id_key": "rid", "embedding_key": "emb_missing"},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "d", "operations": ["res"]},
        ]},
    }
    out_cfg = optimize_config(cfg, sample_limit=100)
    res = out_cfg["operations"][0]
    assert "blocking_threshold" not in res  # no cosine value from text sims
    thr = res["threshold"]
    from docetl_ray.stages.resolve import token_jaccard

    # the swept threshold must be attainable in token-Jaccard space:
    # some within-cluster pair reaches it, no cross-cluster pair does
    within = token_jaccard("Acme Corporation unit 0",
                           "Acme Corporation unit 2")
    cross = token_jaccard("Acme Corporation unit 0",
                          "Zenith Widget Works 1")
    assert cross < thr <= within
