"""CLI entry points — the ``ray job submit`` surface.

On a real cluster::

    ray job submit --working-dir . -- \
        python -m docetl_ray.cli apply --wal s3://bucket/wal/epoch-42 \
            --table s3://bucket/lake/pages --epoch 42 --mode delta

    python -m docetl_ray.cli run pipeline.yaml          # DSL pipeline
    python -m docetl_ray.cli compact --table ... --tag nightly-7

In this sandbox it runs with ``RAY_ADDRESS=local``.  These entry points
own the Ray session (init/shutdown); library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _compact_after(v: str):
    """argparse type for --compact-after: int, "auto", or "none"."""
    if v == "auto":
        return v
    if v in ("none", "None"):
        return None
    return int(v)


def cmd_apply(args) -> int:
    _init_ray()
    import ray
    import ray.data as rd

    from .cdc import LakeTable, apply_events

    table = LakeTable(args.table, num_partitions=args.num_partitions)
    events = rd.read_parquet(args.wal)
    m = apply_events(
        table, events, epoch=args.epoch, mode=args.mode,
        compact_after=args.compact_after,
    )
    print(json.dumps({"epoch": args.epoch, "committed_epochs": m["epochs"],
                      "partitions": len(m.get("partitions", {}))}))
    ray.shutdown()
    return 0


def cmd_tail(args) -> int:
    _init_ray()
    import ray

    from .cdc import LakeTable, tail

    table = LakeTable(args.table, num_partitions=args.num_partitions)
    applied = tail(table, args.wal, poll_seconds=args.poll,
                   stop_after_idle=args.stop_after_idle, mode=args.mode)
    print(json.dumps({"applied_segments": applied,
                      "committed_epochs": table.committed_epochs()}))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    _init_ray()
    import ray

    from .cdc import LakeTable
    from .cdc.apply import compact

    m = compact(LakeTable(args.table), tag=args.tag)
    print(json.dumps({"compactions": m.get("compactions", [])}))
    ray.shutdown()
    return 0


def cmd_resplit(args) -> int:
    _init_ray()
    import ray

    from .cdc import LakeTable
    from .cdc.apply import resplit

    m = resplit(LakeTable(args.table), args.num_partitions, tag=args.tag)
    print(json.dumps({"num_partitions": m["num_partitions"],
                      "resplits": m.get("resplits", [])}))
    ray.shutdown()
    return 0


def cmd_run(args) -> int:
    _init_ray()
    import ray

    from .runner import PipelineRunner

    out = PipelineRunner.from_yaml(args.pipeline).run()
    n = out.count() if out is not None else 0
    print(json.dumps({"pipeline": args.pipeline, "output_rows": n}))
    ray.shutdown()
    return 0


def cmd_build(args) -> int:
    """Optimize a YAML pipeline and write ``<stem>_opt.yaml`` (the
    reference's ``docetl build``, ``cli.py:18-198``).  ``--moar`` runs
    the MCTS plan search instead (reference ``--optimizer moar``): one
    ``<stem>_moar_<i>.yaml`` per Pareto-frontier plan, plus the frontier
    summary on stdout; without it, the v1 sample-driven rewriter."""
    _init_ray()
    import ray
    import yaml

    from .optimizer import optimize_config

    with open(args.pipeline) as f:
        cfg = yaml.safe_load(f)
    if getattr(args, "moar", False):
        code = _build_moar(args, cfg)
        ray.shutdown()
        return code
    out_cfg = optimize_config(
        cfg, sample_limit=args.sample_limit, token_limit=args.token_limit
    )
    out_path = args.output or os.path.splitext(args.pipeline)[0] + "_opt.yaml"
    # decision records are for inspection, not execution config
    for op in out_cfg.get("operations", []):
        op.pop("_optimizer", None)
    with open(out_path, "w") as f:
        yaml.safe_dump(out_cfg, f, sort_keys=False)
    print(json.dumps({"pipeline": args.pipeline, "optimized": out_path,
                      "operations": [o["name"] for o in out_cfg["operations"]]}))
    ray.shutdown()
    return 0


def _build_moar(args, cfg: dict) -> int:
    """MOAR search over a single-step pipeline: sample the input
    dataset, run the MCTS, and write one executable YAML per frontier
    plan (the reference's per-node plan files,
    ``moar/MOARSearch.instantiate_node``)."""
    import yaml

    from .moar import MoarSearch
    from .runner import _load_dataset

    steps = cfg.get("pipeline", {}).get("steps", [])
    if len(steps) != 1 or "input" not in steps[0]:
        print(json.dumps({"error": "--moar requires a single-step "
                          "pipeline with an input dataset"}))
        return 2
    step = steps[0]
    ops_by_name = {o["name"]: o for o in cfg.get("operations", [])}
    missing = [n for n in step.get("operations", []) if n not in ops_by_name]
    if missing or not step.get("operations"):
        print(json.dumps({"error": f"step operations not defined: "
                          f"{missing or 'none listed'} "
                          f"(operations: {sorted(ops_by_name)})"}))
        return 2
    if step["input"] not in cfg.get("datasets", {}):
        print(json.dumps({"error": f"unknown input dataset "
                          f"{step['input']!r} "
                          f"(datasets: {sorted(cfg.get('datasets', {}))})"}))
        return 2
    base_ops = [ops_by_name[n] for n in step["operations"]]
    rows = (_load_dataset(cfg["datasets"][step["input"]])
            .limit(args.sample_limit).take_all())
    search = MoarSearch(base_ops, rows,
                        max_iterations=args.moar_iterations,
                        token_limit=args.token_limit, seed=args.moar_seed)
    frontier = search.search()
    # -o names the plan-file stem (plan i -> <stem>_moar_<i>.yaml);
    # default: next to the input pipeline.  splitext, not rsplit('.') —
    # a dotted DIRECTORY (../v1.2/pipe) must not truncate the stem.
    stem = os.path.splitext(args.output or args.pipeline)[0]
    written = []
    for i, node in enumerate(frontier):
        plan_cfg = dict(cfg)
        ops = [dict(o) for o in node.ops]
        for o in ops:
            o.pop("_moar", None)  # decision notes are not execution config
            # the node's default model is search state, not op config —
            # pin it onto every prompt op lacking an explicit override so
            # the emitted YAML executes with exactly the client the
            # simulator billed (simulate_plan's client_for fallback)
            if "prompt" in o and "code" not in o:
                o.setdefault("model", node.default_model)
        plan_cfg["operations"] = ops
        plan_cfg["pipeline"] = dict(cfg["pipeline"])
        plan_cfg["pipeline"]["steps"] = [
            dict(step, operations=[o["name"] for o in ops])]
        path = f"{stem}_moar_{i}.yaml"
        with open(path, "w") as f:
            yaml.safe_dump(plan_cfg, f, sort_keys=False)
        written.append(path)
    print(json.dumps({
        "pipeline": args.pipeline,
        "iterations": search.iteration_count,
        "plans_explored": len(search.frontier.plans),
        "search_cost_micro": search.total_search_cost,
        "frontier": [
            {"file": written[i], "path": n.path(),
             "cost_micro": search.frontier.plans_cost[n],
             "accuracy": round(search.frontier.plans_accuracy[n], 4)}
            for i, n in enumerate(frontier)
        ],
    }))
    return 0


def cmd_serve(args) -> int:
    _init_ray()
    from .server import serve

    serve(args.root, host=args.host, port=args.port)
    return 0


def cmd_state(args) -> int:
    _init_ray()
    import ray

    from .cdc import LakeTable, read_state

    t = LakeTable(args.table)
    ds = read_state(t, include_tombstones=args.tombstones)
    print(json.dumps({"rows": ds.count(), "epochs": t.committed_epochs(),
                      "levels": {str(k): len(v) for k, v in t.partition_map().items()}}))
    ray.shutdown()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="docetl_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ap = sub.add_parser("apply", help="apply one WAL segment as an epoch")
    ap.add_argument("--wal", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--epoch", type=int, required=True)
    ap.add_argument("--mode", choices=["merge", "delta"], default="merge")
    ap.add_argument("--num-partitions", type=int, default=64)
    # mirror the library default: "auto" folds any partition past 4
    # stacked levels; "none" restores manual compact() (an int default
    # of None here would silently disable auto-compaction for every
    # CLI delta ingest — the exact unbounded-level hazard it prevents)
    ap.add_argument("--compact-after", type=_compact_after, default="auto",
                    help='level-count trigger: an int, "auto" (4), or '
                         '"none" to disable')
    ap.set_defaults(fn=cmd_apply)

    tp = sub.add_parser("tail", help="tail a WAL directory of segments")
    tp.add_argument("--wal", required=True)
    tp.add_argument("--table", required=True)
    tp.add_argument("--mode", choices=["merge", "delta"], default="delta")
    tp.add_argument("--num-partitions", type=int, default=64)
    tp.add_argument("--poll", type=float, default=1.0)
    tp.add_argument("--stop-after-idle", type=int, default=3)
    tp.set_defaults(fn=cmd_tail)

    cp = sub.add_parser("compact", help="fold delta levels")
    cp.add_argument("--table", required=True)
    cp.add_argument("--tag", required=True)
    cp.set_defaults(fn=cmd_compact)

    rsp = sub.add_parser("resplit", help="repartition the table (split/merge partitions)")
    rsp.add_argument("--table", required=True)
    rsp.add_argument("--num-partitions", type=int, required=True)
    rsp.add_argument("--tag", required=True)
    rsp.set_defaults(fn=cmd_resplit)

    rp = sub.add_parser("run", help="run a YAML pipeline")
    rp.add_argument("pipeline")
    rp.set_defaults(fn=cmd_run)

    bp = sub.add_parser("build", help="optimize a YAML pipeline (rewrite "
                        "ops marked optimize: true)")
    bp.add_argument("pipeline")
    bp.add_argument("-o", "--output", default=None)
    bp.add_argument("--sample-limit", type=int, default=100)
    bp.add_argument("--token-limit", type=int, default=8192)
    bp.add_argument("--moar", action="store_true",
                    help="run the MOAR MCTS plan search; writes one "
                         "<stem>_moar_<i>.yaml per frontier plan")
    bp.add_argument("--moar-iterations", type=int, default=12)
    bp.add_argument("--moar-seed", type=int, default=0)
    bp.set_defaults(fn=cmd_build)

    sp = sub.add_parser("state", help="inspect table state")
    sp.add_argument("--table", required=True)
    sp.add_argument("--tombstones", action="store_true")
    sp.set_defaults(fn=cmd_state)

    srv = sub.add_parser("serve", help="HTTP pipeline/run API (flask "
                         "recast of the reference server)")
    srv.add_argument("--root", required=True,
                     help="storage root for pipeline/run metadata + outputs")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8000)
    srv.set_defaults(fn=cmd_serve)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
