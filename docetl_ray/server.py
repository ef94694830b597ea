"""HTTP surface: a Flask recast of the reference's FastAPI server.

The reference serves the DocWrangler UI from a FastAPI app
(``server/app/main.py``, ``app_factory.py:1-67``) whose engine-facing
routes are pipeline CRUD (``routes/pipelines.py:33-172``), run
lifecycle + cancel (``routes/runs.py:40-128`` over the
``run_manager.py:11-27`` cancel-handler registry) and a run summary
(``models.py:73-79``).  This module recasts exactly that engine-facing
slice over the Ray Data :class:`~docetl_ray.runner.PipelineRunner`:

- single-tenant: the reference's auth / namespace-role layer
  (``security.py``, ``routes/auth.py``, ``routes/users.py``) and the UI
  file-manager routes (``routes/filesystem.py``, ``data_center.py``,
  ``convert.py``) are UI/deployment concerns and are out of scope
  (SURVEY §3.3/3.4);
- storage is a JSON metadata file + per-run Parquet output directories
  under one root (the reference uses sqlite ``metadata_db`` + an
  uploads tree);
- runs execute on a background thread against the already-initialised
  Ray session; cancellation is cooperative via
  :class:`docetl_ray.runner.RunCancelled`, checked between operations
  (the reference's cancel handlers interrupt between op executions the
  same way).

Endpoints (all JSON):

=====================================  =======================================
``GET  /api/health``                   liveness + ray state
``GET  /api/pipelines``                list pipeline metadata
``POST /api/pipelines``                create ``{name, config, description?}``
``GET  /api/pipelines/<id>``           fetch one (includes ``config``)
``PUT  /api/pipelines/<id>``           replace; honours optimistic
                                       ``expected_updated_at`` like the
                                       reference's update_pipeline
``DELETE /api/pipelines/<id>``         delete
``POST /api/pipelines/<id>/run``       start a run -> RunRecord (202)
``POST /api/runs``                     start a run from an inline ``config``
``GET  /api/runs``                     list (``?status=&pipeline_id=``)
``GET  /api/runs/summary``             counts per status + last_run_at
``GET  /api/runs/<id>``                one RunRecord
``POST /api/runs/<id>/cancel``         cooperative cancel (409 if finished)
``GET  /api/runs/<id>/output``         first ``?limit=`` rows of the output
=====================================  =======================================

Flask is an optional dependency: importing this module is safe without
it; :func:`create_app` raises a clear error if it is missing.  Use the
test client (``create_app(root).test_client()``) or ``docetl-ray serve``.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from typing import Any

from .runner import PipelineRunner, RayCancelEvent, is_cancelled_error

RUN_STATUSES = ("pending", "running", "completed", "failed", "cancelled")
_FINISHED = {"completed", "failed", "cancelled"}


class _Store:
    """JSON-file-backed pipeline/run metadata store (the reference keeps
    the same records in sqlite, ``server/app/storage/metadata_db``).
    A single process-local lock serialises mutations — the server is a
    single-tenant control plane, not a data path."""

    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "server_meta.json")
        self.lock = threading.RLock()
        os.makedirs(root, exist_ok=True)
        if os.path.exists(self.path):
            with open(self.path) as f:
                data = json.load(f)
        else:
            data = {"pipelines": {}, "runs": {}}
        self.pipelines: dict[str, dict] = data["pipelines"]
        self.runs: dict[str, dict] = data["runs"]
        # in-memory only: cancel events for live runs (reference
        # run_manager registry)
        self._cancel_events: dict[str, Any] = {}
        # runs persisted as pending/running belong to a dead process
        # (their threads died with it): fail them on load so no record
        # is stuck in a non-terminal, non-cancellable state forever
        dirty = False
        for rec in self.runs.values():
            if rec["status"] in ("pending", "running"):
                rec.update(status="failed", ended_at=time.time(),
                           error="server restarted while the run was active")
                dirty = True
        if dirty:
            self._flush()

    def _flush(self):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"pipelines": self.pipelines, "runs": self.runs}, f)
        os.replace(tmp, self.path)

    # -- pipelines -------------------------------------------------------
    def create_pipeline(self, name: str, config: dict, description=None) -> dict:
        with self.lock:
            pid = str(uuid.uuid4())
            now = time.time()
            rec = {
                "id": pid,
                "name": name,
                "description": description,
                "config": config,
                "created_at": now,
                "updated_at": now,
            }
            self.pipelines[pid] = rec
            self._flush()
            return rec

    def update_pipeline(self, pid: str, *, name=None, config=None,
                        description=None, expected_updated_at=None) -> dict:
        with self.lock:
            rec = self.pipelines.get(pid)
            if rec is None:  # raced with a concurrent delete
                raise KeyError(pid)
            # optimistic concurrency, reference update_pipeline semantics
            if (expected_updated_at is not None
                    and rec["updated_at"] != expected_updated_at):
                raise ConflictError("pipeline was modified concurrently")
            # build the new record and swap it in with ONE assignment:
            # GET handlers read self.pipelines without the lock, so a
            # field-by-field in-place update could serve a torn snapshot
            # (new name with the old config) to a concurrent reader
            new = dict(rec)
            if name is not None:
                new["name"] = name
            if config is not None:
                new["config"] = config
            if description is not None:
                new["description"] = description
            new["updated_at"] = time.time()
            self.pipelines[pid] = new
            self._flush()
            return new

    def delete_pipeline(self, pid: str):
        with self.lock:
            if pid not in self.pipelines:  # raced with a concurrent delete
                raise KeyError(pid)
            del self.pipelines[pid]
            self._flush()

    # -- runs ------------------------------------------------------------
    def create_run(self, config: dict, pipeline_id=None, pipeline_name=None,
                   trigger: str = "api", cancel_event=None):
        with self.lock:
            rid = str(uuid.uuid4())
            rec = {
                "id": rid,
                "pipeline_id": pipeline_id,
                "pipeline_name": pipeline_name,
                "trigger": trigger,
                "status": "pending",
                "created_at": time.time(),
                "started_at": None,
                "ended_at": None,
                "output_path": None,
                "output_rows": None,
                "error": None,
            }
            self.runs[rid] = rec
            ev = cancel_event if cancel_event is not None else threading.Event()
            self._cancel_events[rid] = ev
            self._flush()
            return rec, ev

    def update_run(self, rid: str, **fields) -> dict:
        with self.lock:
            # new-dict swap for the same reason as update_pipeline:
            # lockless GET readers must never see a torn record (e.g.
            # status "completed" with output_rows still None)
            rec = dict(self.runs[rid])
            rec.update(fields)
            self.runs[rid] = rec
            if rec["status"] in _FINISHED:
                self._cancel_events.pop(rid, None)
            self._flush()
            return rec

    def cancel_run(self, rid: str) -> bool:
        with self.lock:
            ev = self._cancel_events.get(rid)
            if ev is None:
                return False
            ev.set()
            return True

    def summary(self) -> dict:
        with self.lock:
            runs = list(self.runs.values())
        out = {"total": len(runs), "pending": 0, "running": 0, "failed": 0,
               "completed": 0, "cancelled": 0, "last_run_at": None}
        for r in runs:
            if r["status"] in out:
                out[r["status"]] += 1
            if r["created_at"] is not None:
                if out["last_run_at"] is None or r["created_at"] > out["last_run_at"]:
                    out["last_run_at"] = r["created_at"]
        return out


class ConflictError(Exception):
    pass


def _jsonable(v: Any) -> Any:
    """Recursively coerce an Arrow-derived Python value to JSON-safe
    types (binary payload columns -> base64, timestamps -> isoformat)."""
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, (bytes, bytearray)):
        import base64

        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _written_rows(out_dir: str) -> int:
    """Row count from the written files' parquet footers — O(metadata),
    never a second execution of the (lazy) pipeline."""
    import pyarrow.dataset as pads

    return sum(f.metadata.num_rows if f.metadata is not None
               else f.count_rows()
               for f in pads.dataset(out_dir, format="parquet").get_fragments())


def _execute_run(store: _Store, rid: str, config: dict, out_dir: str,
                 cancel_event):
    """Background-thread body: drive PipelineRunner and record the
    terminal state (the reference's run executor persists the same
    lifecycle transitions into metadata_db)."""
    store.update_run(rid, status="running", started_at=time.time())
    cfg = dict(config)
    pipeline = dict(cfg.get("pipeline", {}))
    # force a server-managed parquet output location so results are
    # fetchable via /api/runs/<id>/output regardless of the config
    pipeline["output"] = {"format": "parquet", "path": out_dir}
    cfg["pipeline"] = pipeline
    try:
        runner = PipelineRunner(cfg, cancel_event=cancel_event)
        result = runner.run()
        rows = _written_rows(out_dir) if result is not None else 0
        store.update_run(rid, status="completed", ended_at=time.time(),
                         output_path=out_dir, output_rows=rows)
    except Exception as e:  # noqa: BLE001 — terminal state must be recorded
        # once cancel was REQUESTED, any raised error is the cancel taking
        # effect (the probe's RunCancelled arrives wrapped in Ray's task
        # error chain, whose exact shape varies) — the event is the truth
        cancelled = is_cancelled_error(e)
        try:
            cancelled = cancelled or cancel_event.is_set()
        except Exception:  # noqa: BLE001 — flag actor may already be dead
            pass
        if cancelled:
            store.update_run(rid, status="cancelled", ended_at=time.time())
        else:
            store.update_run(rid, status="failed", ended_at=time.time(),
                             error=f"{type(e).__name__}: {e}")


def create_app(root: str):
    """Build the Flask app over a storage root directory."""
    try:
        from flask import Flask, jsonify, request
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "flask is required for the HTTP server surface "
            "(pip install flask)"
        ) from e

    store = _Store(root)
    app = Flask("docetl_ray")
    app.config["docetl_store"] = store

    def _error(code: int, detail: str):
        return jsonify({"detail": detail}), code

    def _get_pipeline_or_404(pid: str):
        try:
            uuid.UUID(pid)
        except ValueError:
            return None, _error(400, "Invalid pipeline id")
        rec = store.pipelines.get(pid)
        if rec is None:
            return None, _error(404, "Pipeline not found")
        return rec, None

    def _meta(rec: dict) -> dict:
        return {k: rec[k] for k in
                ("id", "name", "description", "created_at", "updated_at")}

    @app.get("/api/health")
    def health():
        import ray

        return jsonify({"status": "ok",
                        "ray_initialized": ray.is_initialized()})

    # -- pipelines -------------------------------------------------------
    @app.get("/api/pipelines")
    def list_pipelines():
        with store.lock:
            recs = sorted(store.pipelines.values(),
                          key=lambda r: r["created_at"])
        return jsonify([_meta(r) for r in recs])

    @app.post("/api/pipelines")
    def create_pipeline():
        body = request.get_json(force=True, silent=True) or {}
        if not body.get("name"):
            return _error(400, "Pipeline name is required")
        if not isinstance(body.get("config"), dict):
            return _error(400, "config must be a pipeline config object")
        rec = store.create_pipeline(body["name"], body["config"],
                                    body.get("description"))
        return jsonify(rec), 201

    @app.get("/api/pipelines/<pid>")
    def get_pipeline(pid):
        rec, err = _get_pipeline_or_404(pid)
        return err if err else jsonify(rec)

    @app.put("/api/pipelines/<pid>")
    def put_pipeline(pid):
        rec, err = _get_pipeline_or_404(pid)
        if err:
            return err
        body = request.get_json(force=True, silent=True) or {}
        if "config" in body and not isinstance(body["config"], dict):
            return _error(400, "config must be a pipeline config object")
        try:
            rec = store.update_pipeline(
                pid, name=body.get("name"), config=body.get("config"),
                description=body.get("description"),
                expected_updated_at=body.get("expected_updated_at"))
        except ConflictError as e:
            return _error(409, str(e))
        except KeyError:  # deleted between the existence check and here
            return _error(404, "Pipeline not found")
        return jsonify(rec)

    @app.delete("/api/pipelines/<pid>")
    def delete_pipeline(pid):
        rec, err = _get_pipeline_or_404(pid)
        if err:
            return err
        try:
            store.delete_pipeline(pid)
        except KeyError:  # raced with a concurrent delete
            return _error(404, "Pipeline not found")
        return jsonify({"status": "deleted"})

    # -- runs ------------------------------------------------------------
    def _start_run(config: dict, pipeline_id=None, pipeline_name=None):
        # a Ray-actor-backed flag (picklable) lets the runner probe it
        # MID-EXECUTION from workers; fall back to a thread event (cancel
        # then only lands between ops) if Ray is somehow unavailable
        try:
            cancel_event = RayCancelEvent()
        except Exception:
            cancel_event = threading.Event()
        rec, ev = store.create_run(config, pipeline_id=pipeline_id,
                                   pipeline_name=pipeline_name,
                                   cancel_event=cancel_event)
        out_dir = os.path.join(store.root, "runs", rec["id"], "output")
        os.makedirs(out_dir, exist_ok=True)
        t = threading.Thread(
            target=_execute_run,
            args=(store, rec["id"], config, out_dir, ev),
            name=f"docetl-run-{rec['id'][:8]}", daemon=True)
        t.start()
        return rec

    @app.post("/api/pipelines/<pid>/run")
    def run_pipeline(pid):
        rec, err = _get_pipeline_or_404(pid)
        if err:
            return err
        run = _start_run(rec["config"], pipeline_id=pid,
                         pipeline_name=rec["name"])
        return jsonify(run), 202

    @app.post("/api/runs")
    def run_inline():
        body = request.get_json(force=True, silent=True) or {}
        if not isinstance(body.get("config"), dict):
            return _error(400, "config must be a pipeline config object")
        run = _start_run(body["config"])
        return jsonify(run), 202

    @app.get("/api/runs")
    def list_runs():
        status = request.args.get("status")
        if status is not None and status not in RUN_STATUSES:
            return _error(400, f"unknown status {status!r}")
        pipeline_id = request.args.get("pipeline_id")
        with store.lock:
            recs = sorted(store.runs.values(), key=lambda r: r["created_at"])
        if status:
            recs = [r for r in recs if r["status"] == status]
        if pipeline_id:
            recs = [r for r in recs if r["pipeline_id"] == pipeline_id]
        return jsonify(recs)

    @app.get("/api/runs/summary")
    def run_summary():
        return jsonify(store.summary())

    @app.get("/api/runs/<rid>")
    def get_run(rid):
        rec = store.runs.get(rid)
        if rec is None:
            return _error(404, "Run not found")
        return jsonify(rec)

    @app.post("/api/runs/<rid>/cancel")
    def cancel_run(rid):
        rec = store.runs.get(rid)
        if rec is None:
            return _error(404, "Run not found")
        if rec["status"] in _FINISHED:
            # reference: 409 "Run already finished" (routes/runs.py:108)
            return _error(409, "Run already finished")
        if not store.cancel_run(rid):
            return _error(409, "Run is not cancellable")
        return jsonify({"status": "cancelling"}), 202

    @app.get("/api/runs/<rid>/output")
    def run_output(rid):
        rec = store.runs.get(rid)
        if rec is None:
            return _error(404, "Run not found")
        if rec["status"] != "completed":
            return _error(409, f"Run is {rec['status']}, not completed")
        try:
            limit = int(request.args.get("limit", 100))
        except ValueError:
            return _error(400, "limit must be an integer")
        import pyarrow.dataset as pads

        tbl = pads.dataset(rec["output_path"], format="parquet") \
            .head(max(0, limit))
        return jsonify({"rows": [_jsonable(r) for r in tbl.to_pylist()],
                        "total_rows": rec["output_rows"]})

    return app


def serve(root: str, host: str = "127.0.0.1", port: int = 8000):
    """Run the development server (``docetl-ray serve``)."""
    create_app(root).run(host=host, port=port)
