"""HTTP status surface: the stdlib JSON facade over Engine, exercised over a
real socket (reference parity: web_ui/app.py's /jobs, /invoke-job,
/schedule-job, /stage-progress endpoints)."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from serverless_mapreduce_spark.engine import Engine
from serverless_mapreduce_spark.webui import StatusServer


@pytest.fixture()
def server(spark, sf_dir):
    srv = StatusServer(Engine(spark, sf_dir))
    host, port = srv.start()
    yield f"http://{host}:{port}"
    srv.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_jobs_listing(server):
    code, body = _get(f"{server}/jobs")
    assert code == 200
    assert "q1_filter_scan" in body["queries"]
    assert len(body["queries"]) > 100


def test_run_then_status_and_report(server):
    code, body = _get(f"{server}/run?name=q1_filter_scan")
    assert code == 200
    run = body["run"]
    assert run["status"] == "SUCCEEDED"
    assert run["rows"] > 0
    assert run["num_jobs"] >= 1

    code, status = _get(f"{server}/status?name=q1_filter_scan")
    assert code == 200
    assert status["q1_filter_scan"][-1]["status"] == "SUCCEEDED"

    code, report = _get(f"{server}/report")
    assert code == 200
    assert report["q1_filter_scan"]["succeeded"] >= 1
    assert report["q1_filter_scan"]["task_time_ms"] >= 0


def test_explain_returns_plan(server):
    code, body = _get(f"{server}/explain?name=q1_filter_scan")
    assert code == 200
    assert "Physical Plan" in body["plan"]


def test_schedule_ticks_and_cancel(server):
    code, body = _get(
        f"{server}/schedule?name=q1_filter_scan&every_s=0.2&max_runs=1"
    )
    assert code == 200
    sid = body["id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        _, status = _get(f"{server}/status?name=q1_filter_scan")
        runs = status.get("q1_filter_scan", [])
        if any(r["status"] == "SUCCEEDED" for r in runs):
            break
        time.sleep(0.2)
    else:
        raise AssertionError("scheduled run never landed in status()")
    code, body = _get(f"{server}/cancel?id={sid}")
    assert code == 200 and body["cancelled"]


def test_progress_live_snapshot(server, spark):
    """/progress returns the live tracker view: idle → no active jobs;
    while a background job runs → it appears with stage task counts."""
    import threading

    code, body = _get(f"{server}/progress")
    assert code == 200 and body == {"active_jobs": []}

    seen: list[dict] = []
    done = threading.Event()

    def slow_job():
        try:
            spark.range(200).foreachPartition(
                lambda it: __import__("time").sleep(0.5)
            )
        finally:
            done.set()

    t = threading.Thread(target=slow_job, daemon=True)
    t.start()
    deadline = time.time() + 30
    while time.time() < deadline and not done.is_set():
        _, body = _get(f"{server}/progress")
        if body["active_jobs"]:
            seen.append(body)
            break
        time.sleep(0.05)
    t.join(timeout=60)
    assert seen, "never observed the running job in /progress"
    job = seen[0]["active_jobs"][0]
    assert job["stages"] and job["stages"][0]["num_tasks"] > 0


def test_errors_are_json(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{server}/run?name=not_a_query")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{server}/run")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{server}/nope")
    assert ei.value.code == 404
