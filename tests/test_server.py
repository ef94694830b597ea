"""Flask HTTP surface (docetl_ray/server.py) — the engine-facing recast
of the reference FastAPI server (server/app/routes/pipelines.py,
routes/runs.py, run_manager.py).  Uses the flask test client: no
sockets, runs execute on background threads against the session Ray."""

import threading
import time

import pytest

flask = pytest.importorskip("flask")


DOCS = "/root/testdata/sf0.001/documents.parquet"


def _config(extra_ops=(), ops_order=None):
    ops = [
        {
            "name": "add_len",
            "type": "code_map",
            "code": "def transform(doc):\n    return {'text_len': len(doc['text'])}\n",
        },
        {
            "name": "keep_long",
            "type": "code_filter",
            "code": "def transform(doc):\n    return doc['text_len'] > 200\n",
        },
    ] + list(extra_ops)
    return {
        "datasets": {"docs": {"type": "file", "path": DOCS}},
        "operations": ops,
        "pipeline": {
            "steps": [{
                "name": "s1", "input": "docs",
                "operations": ops_order or [o["name"] for o in ops],
            }],
        },
    }


@pytest.fixture()
def client(tmp_path):
    from docetl_ray.server import create_app

    app = create_app(str(tmp_path / "srv"))
    app.config["TESTING"] = True
    return app.test_client()


def _wait_run(client, rid, want=("completed", "failed", "cancelled"),
              timeout=60.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        rec = client.get(f"/api/runs/{rid}").get_json()
        if rec["status"] in want:
            return rec
        time.sleep(0.05)
    raise TimeoutError(f"run {rid} did not reach {want}")


def test_health(client):
    r = client.get("/api/health")
    assert r.status_code == 200
    body = r.get_json()
    assert body["status"] == "ok" and body["ray_initialized"] is True


def test_pipeline_crud_and_conflict(client):
    # create
    r = client.post("/api/pipelines",
                    json={"name": "p1", "config": _config(),
                          "description": "demo"})
    assert r.status_code == 201
    rec = r.get_json()
    pid = rec["id"]
    assert rec["name"] == "p1" and rec["config"]["datasets"]

    # validation errors mirror the reference's 400s
    assert client.post("/api/pipelines", json={"config": {}}).status_code == 400
    assert client.post("/api/pipelines",
                       json={"name": "x", "config": "nope"}).status_code == 400
    assert client.get("/api/pipelines/not-a-uuid").status_code == 400
    assert client.get(
        "/api/pipelines/00000000-0000-0000-0000-000000000000"
    ).status_code == 404

    # list returns metadata only (no config payload)
    listing = client.get("/api/pipelines").get_json()
    assert [p["id"] for p in listing] == [pid]
    assert "config" not in listing[0]

    # optimistic concurrency: stale expected_updated_at -> 409
    stale = rec["updated_at"]
    ok = client.put(f"/api/pipelines/{pid}",
                    json={"name": "p2", "expected_updated_at": stale})
    assert ok.status_code == 200 and ok.get_json()["name"] == "p2"
    conflict = client.put(f"/api/pipelines/{pid}",
                          json={"name": "p3", "expected_updated_at": stale})
    assert conflict.status_code == 409

    # delete
    assert client.delete(f"/api/pipelines/{pid}").status_code == 200
    assert client.get(f"/api/pipelines/{pid}").status_code == 404


def test_run_lifecycle_and_output(client):
    pid = client.post("/api/pipelines",
                      json={"name": "p", "config": _config()}).get_json()["id"]
    r = client.post(f"/api/pipelines/{pid}/run")
    assert r.status_code == 202
    run = r.get_json()
    assert run["status"] in ("pending", "running")
    assert run["pipeline_id"] == pid and run["pipeline_name"] == "p"

    rec = _wait_run(client, run["id"])
    assert rec["status"] == "completed", rec["error"]
    assert rec["started_at"] is not None and rec["ended_at"] is not None

    import duckdb

    want = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{DOCS}') WHERE length(text) > 200"
    ).fetchone()[0]
    assert rec["output_rows"] == want

    out = client.get(f"/api/runs/{run['id']}/output?limit=5").get_json()
    assert out["total_rows"] == want and len(out["rows"]) == 5
    assert all(row["text_len"] > 200 for row in out["rows"])

    # list/filter + summary
    runs = client.get(f"/api/runs?pipeline_id={pid}").get_json()
    assert [x["id"] for x in runs] == [run["id"]]
    assert client.get("/api/runs?status=bogus").status_code == 400
    summary = client.get("/api/runs/summary").get_json()
    assert summary["total"] == 1 and summary["completed"] == 1

    # finished runs are not cancellable (reference routes/runs.py:108)
    assert client.post(f"/api/runs/{run['id']}/cancel").status_code == 409


def test_run_inline_failure_recorded(client):
    cfg = _config()
    cfg["operations"][0]["code"] = "def transform(doc):\n    raise ValueError('boom')\n"
    run = client.post("/api/runs", json={"config": cfg}).get_json()
    rec = _wait_run(client, run["id"])
    assert rec["status"] == "failed"
    assert "boom" in rec["error"]
    # output of a non-completed run -> 409
    assert client.get(f"/api/runs/{run['id']}/output").status_code == 409


def test_run_cancel_cooperative(client, tmp_path):
    # a plugin op that parks until cancel is requested, so the cancel
    # check between ops is what ends the run
    from docetl_ray.runner import register_operation, _OP_PLUGINS

    started = threading.Event()
    release = threading.Event()

    def slow_op(ds, op):
        started.set()
        release.wait(30)
        return ds

    register_operation("test_server_slow", slow_op)
    try:
        cfg = _config(
            extra_ops=[{"name": "park", "type": "test_server_slow"}],
            ops_order=["park", "add_len", "keep_long"],
        )
        run = client.post("/api/runs", json={"config": cfg}).get_json()
        assert started.wait(30)
        r = client.post(f"/api/runs/{run['id']}/cancel")
        assert r.status_code == 202
        release.set()
        rec = _wait_run(client, run["id"])
        assert rec["status"] == "cancelled"
    finally:
        release.set()
        _OP_PLUGINS.pop("test_server_slow", None)


def test_store_survives_restart(tmp_path):
    from docetl_ray.server import create_app

    root = str(tmp_path / "srv")
    c1 = create_app(root).test_client()
    pid = c1.post("/api/pipelines",
                  json={"name": "p", "config": _config()}).get_json()["id"]
    # a fresh app over the same root sees the persisted pipeline
    c2 = create_app(root).test_client()
    assert c2.get(f"/api/pipelines/{pid}").get_json()["name"] == "p"


def test_cli_serve_parser():
    from docetl_ray.cli import build_parser

    args = build_parser().parse_args(["serve", "--root", "/tmp/x",
                                      "--port", "9999"])
    assert args.root == "/tmp/x" and args.port == 9999 and args.host == "127.0.0.1"


def test_run_cancel_mid_execution(client):
    """Cancel must land while the pipeline is EXECUTING (inside the
    streaming sink), not just between ops during lazy graph build: the
    runner injects a _CancelProbe stage ahead of the sink."""
    # 512 docs x 0.25 s = 128 CPU-seconds of sleep: even at 64-way task
    # parallelism the run cannot finish inside the ~0.5 s cancel window
    # below (a 64-doc variant was observed completing in 0.62 s under
    # full-suite load, racing past the cancel)
    cfg = {
        "datasets": {"rows": {"type": "memory",
                              "data": [{"i": i} for i in range(512)]}},
        "operations": [{
            "name": "slow",
            "type": "code_map",
            "code": ("import time\n"
                     "def transform(doc):\n"
                     "    time.sleep(0.25)\n"
                     "    return {'j': doc['i'] + 1}\n"),
        }],
        "pipeline": {"steps": [{"name": "s1", "input": "rows",
                                "operations": ["slow"]}]},
    }
    run = client.post("/api/runs", json={"config": cfg}).get_json()
    # wait until the run is genuinely executing, then cancel
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        if client.get(f"/api/runs/{run['id']}").get_json()["status"] == "running":
            break
        time.sleep(0.05)
    time.sleep(0.4)  # let the streaming sink start pulling batches
    import ray

    diag = {"cluster": ray.cluster_resources()}
    r = client.post(f"/api/runs/{run['id']}/cancel")
    assert r.status_code == 202, (
        r.status_code, client.get(f"/api/runs/{run['id']}").get_json(), diag)
    rec = _wait_run(client, run["id"], timeout=120)
    assert rec["status"] == "cancelled", (rec, diag)


def test_restart_sweep_fails_stuck_runs(tmp_path):
    import json as _json

    from docetl_ray.server import create_app

    root = tmp_path / "srv"
    root.mkdir()
    meta = {
        "pipelines": {},
        "runs": {"r1": {"id": "r1", "pipeline_id": None, "pipeline_name": None,
                        "trigger": "api", "status": "running",
                        "created_at": 1.0, "started_at": 1.0, "ended_at": None,
                        "output_path": None, "output_rows": None, "error": None}},
    }
    (root / "server_meta.json").write_text(_json.dumps(meta))
    c = create_app(str(root)).test_client()
    rec = c.get("/api/runs/r1").get_json()
    assert rec["status"] == "failed"
    assert "restarted" in rec["error"]
    # and it is no longer "cancellable" nor stuck: cancel -> 409 finished
    assert c.post("/api/runs/r1/cancel").status_code == 409


def test_summary_counts_pending_bucket(client):
    s = client.get("/api/runs/summary").get_json()
    assert set(s) >= {"total", "pending", "running", "failed",
                      "completed", "cancelled"}
