"""Typed Python pipeline API: the reference's ``docetl.api`` surface
(``/root/reference/docetl/api.py:84-259``; model shapes from
``docetl/schemas.py`` / ``base_schemas.py:49-130``) over the Ray runner.

Pydantic models for datasets, operations, steps, and output convert to
the same config dict the YAML surface uses and execute through
``runner.PipelineRunner`` — exactly the reference's arrangement, where
``Pipeline.run()`` converts its models and hands the dict to
``DSLRunner`` (``api.py:235-259``).

Usage::

    from docetl_ray.api import Pipeline, Dataset, MapOp, ReduceOp, \
        PipelineStep, PipelineOutput

    Pipeline(
        datasets={"docs": Dataset(type="file", path="docs.parquet")},
        operations=[
            MapOp(name="score", type="code_map",
                  code="def transform(doc):\\n    return {'n': len(doc['text'])}"),
            ReduceOp(name="stats", type="code_reduce", reduce_key="lang",
                     code="def transform(rows):\\n    return {'c': len(rows)}"),
        ],
        steps=[PipelineStep(name="s1", input="docs",
                            operations=["score", "stats"])],
        output=PipelineOutput(type="file", path="/tmp/out", format="parquet"),
    ).run()
"""

from __future__ import annotations

from typing import Any

from pydantic import BaseModel, ConfigDict


class Dataset(BaseModel):
    """Reference ``Dataset`` model (api.py usage block; schemas.py)."""

    type: str = "file"
    path: str | None = None
    data: list[dict] | None = None  # type="memory"
    parsing: list[dict[str, Any]] | None = None

    def to_config(self) -> dict[str, Any]:
        cfg: dict[str, Any] = {"type": self.type}
        if self.path is not None:
            cfg["path"] = self.path
        if self.data is not None:
            cfg["data"] = self.data
        if self.parsing is not None:
            cfg["parsing"] = self.parsing
        return cfg


class BaseOp(BaseModel):
    """Open op model: extra keys pass straight through to ``_apply_op``
    (the reference ops are likewise open dicts at runner level)."""

    model_config = ConfigDict(extra="allow")

    name: str
    type: str

    def to_config(self) -> dict[str, Any]:
        return self.model_dump(exclude_none=True)


class MapOp(BaseOp):
    type: str = "map"
    prompt: str | None = None
    code: str | None = None
    output: dict[str, Any] | None = None
    drop_keys: list[str] | None = None
    gleaning: dict[str, Any] | None = None
    validate_rules: list[str] | None = None

    def to_config(self) -> dict[str, Any]:
        cfg = super().to_config()
        if "validate_rules" in cfg:  # pydantic reserves .validate
            cfg["validate"] = cfg.pop("validate_rules")
        return cfg


class FilterOp(BaseOp):
    type: str = "filter"
    prompt: str | None = None
    code: str | None = None


class ReduceOp(BaseOp):
    type: str = "reduce"
    reduce_key: str | list[str] = "_all"
    prompt: str | None = None
    code: str | None = None
    output: dict[str, Any] | None = None
    fold_prompt: str | None = None
    fold_batch_size: int | None = None
    merge_prompt: str | None = None
    merge_batch_size: int | None = None
    value_sampling: dict[str, Any] | None = None
    pass_through: bool | None = None


class ResolveOp(BaseOp):
    type: str = "resolve"
    blocking_key: str | None = None
    comparison_key: str | None = None
    id_key: str | None = None
    threshold: float | None = None
    blocking_threshold: float | None = None
    embedding_key: str | None = None
    output_key: str | None = None
    limit_comparisons: int | None = None


class ParallelMapOp(BaseOp):
    type: str = "parallel_map"
    prompts: list[dict[str, Any]] | None = None


class EquijoinOp(BaseOp):
    type: str = "equijoin"
    left: str | None = None
    right: str | None = None
    on: str | list[str] | None = None
    right_on: str | list[str] | None = None
    how: str = "inner"


class SplitOp(BaseOp):
    type: str = "split"
    split_key: str | None = None
    method: str = "token_count"
    method_kwargs: dict[str, Any] | None = None


class GatherOp(BaseOp):
    type: str = "gather"
    content_key: str | None = None
    doc_id_key: str | None = None
    order_key: str | None = None
    peripheral_chunks: dict[str, Any] | None = None


class UnnestOp(BaseOp):
    type: str = "unnest"
    unnest_key: str | None = None
    keep_empty: bool | None = None


class SampleOp(BaseOp):
    type: str = "sample"
    method: str = "first"
    samples: int | float | None = None
    key: str | None = None
    fraction: float | None = None
    method_kwargs: dict[str, Any] | None = None


class TopKOp(BaseOp):
    type: str = "topk"
    sort_key: str | list[str] | None = None
    k: int | None = None
    direction: str = "desc"
    method: str | None = None
    query: str | None = None
    keys: list[str] | None = None


class ExtractOp(BaseOp):
    type: str = "extract"
    document_keys: list[str] | None = None
    prompt: str | None = None
    patterns: list[str] | None = None
    extraction_method: str | None = None


class DedupOp(BaseOp):
    type: str = "dedup"
    method: str = "exact"
    keys: list[str] | None = None
    tiebreak_key: str | None = None
    text_key: str | None = None
    id_key: str | None = None
    threshold: float | None = None
    embedding_key: str | None = None


class PipelineStep(BaseModel):
    name: str
    input: str | None = None
    operations: list[str] = []


class PipelineOutput(BaseModel):
    type: str = "file"
    path: str | None = None
    format: str = "parquet"


class Pipeline(BaseModel):
    """The reference's top-level ``Pipeline`` model (api.py:84-259):
    holds datasets/operations/steps/output, converts to the runner's
    config dict, and executes.  ``optimize()`` runs the deterministic
    sample-driven rewrite optimizer (``optimizer.py`` — the recast of
    the reference's agentic ``docetl build`` path)."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    name: str = "pipeline"
    datasets: dict[str, Dataset] = {}
    operations: list[BaseOp] = []
    steps: list[PipelineStep] = []
    output: PipelineOutput | None = None
    checkpoint_dir: str | None = None

    def to_config(self) -> dict[str, Any]:
        cfg: dict[str, Any] = {
            "datasets": {k: d.to_config() for k, d in self.datasets.items()},
            "operations": [op.to_config() for op in self.operations],
            "pipeline": {
                "steps": [s.model_dump(exclude_none=True) for s in self.steps],
            },
        }
        if self.output is not None:
            cfg["pipeline"]["output"] = self.output.model_dump(exclude_none=True)
        if self.checkpoint_dir:
            cfg["checkpoint_dir"] = self.checkpoint_dir
        return cfg

    @classmethod
    def from_dict(cls, cfg: dict[str, Any]) -> "Pipeline":
        """Inverse of ``to_config`` (reference ``Pipeline.from_dict``)."""
        return cls(
            datasets={k: Dataset(**v) for k, v in cfg.get("datasets", {}).items()},
            operations=[BaseOp(**op) for op in cfg.get("operations", [])],
            steps=[PipelineStep(**s) for s in cfg.get("pipeline", {}).get("steps", [])],
            output=(
                PipelineOutput(**cfg["pipeline"]["output"])
                if cfg.get("pipeline", {}).get("output")
                else None
            ),
            checkpoint_dir=cfg.get("checkpoint_dir"),
        )

    def run(self):
        """Execute through the shared runner; returns the final Dataset
        (the reference returns total cost — cost is zero/irrelevant in
        the deterministic recast, so the result handle is more useful)."""
        from .runner import PipelineRunner

        return PipelineRunner(self.to_config()).run()

    def optimize(self, **kwargs) -> "Pipeline":
        """Rewrite ops marked ``optimize: true`` via the sample-driven
        optimizer and return a new Pipeline (reference
        ``Pipeline.optimize`` -> ``runner.optimize()``,
        ``runner.py:686-751``)."""
        from .optimizer import optimize_config

        cfg = optimize_config(self.to_config(), **kwargs)
        for op in cfg.get("operations", []):
            op.pop("_optimizer", None)
        return Pipeline.from_dict(cfg)
