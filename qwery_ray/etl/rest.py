"""ETL job-supervision REST layer: slave registration, job checkout,
state/statistics updates, heartbeats.

Re-expresses the reference's multi-worker job-distribution protocol
(etl/QweryETL.scala:46-77 registerAsSlave + 30 s checkForJobs loop,
etl/rest/JobClient.scala:22-48 createJob / checkoutJob / changeState /
updateStatistics, etl/actors/JobManagementActor CheckForJobs) over the
standard library: a ThreadingHTTPServer supervisor holding the job board,
and a JobClient + worker loop that claims jobs and runs them through
:class:`qwery_ray.etl.triggers.ETLController` (the Ray data plane).

Endpoints (reference-parity paths):

    POST  /api/jobs                       create {input, workflowName}
    PATCH /api/jobs/checkout/{slaveID}    atomically claim next CREATED job
    PATCH /api/job/{id}/state/{state}     CREATED|QUEUED|RUNNING|SUCCESS|FAILED
    PATCH /api/job/{id}/statistics        append a statistics snapshot list
    GET   /api/jobs                       board listing
    GET   /api/job/{id}                   one job
    POST  /api/slaves                     register worker {host} → slave id
    PATCH /api/slave/{id}/heartbeat       {cpuLoad} liveness ping

The supervisor is single-process state behind one lock (the reference's actor
mailbox serialization); checkout is therefore exactly-once per job. Durable
board state is a JSON snapshot per mutation so a restarted supervisor resumes
its queue.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

JOB_STATES = ("CREATED", "QUEUED", "RUNNING", "SUCCESS", "FAILED")


class JobBoard:
    """In-memory job/slave registry with a JSON snapshot for restart."""

    def __init__(self, snapshot_path: Optional[str] = None):
        self._lock = threading.Lock()
        self.jobs: dict[str, dict] = {}
        self.slaves: dict[str, dict] = {}
        self.snapshot_path = snapshot_path
        if snapshot_path and os.path.exists(snapshot_path):
            with open(snapshot_path) as f:
                data = json.load(f)
            self.jobs = data.get("jobs", {})
            self.slaves = data.get("slaves", {})

    def _persist(self) -> None:
        if not self.snapshot_path:
            return
        tmp = self.snapshot_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"jobs": self.jobs, "slaves": self.slaves}, f)
        os.replace(tmp, self.snapshot_path)

    def create_job(self, input_path: str, workflow: str) -> dict:
        with self._lock:
            jid = uuid.uuid4().hex[:12]
            job = {"_id": jid, "input": input_path,
                   "workflowName": workflow, "state": "CREATED",
                   "slaveID": None, "message": None, "statistics": [],
                   "createdTime": time.time()}
            self.jobs[jid] = job
            self._persist()
            return job

    def checkout(self, slave_id: str) -> Optional[dict]:
        """Atomically claim the OLDEST CREATED job (reference
        JobManagementActor.CheckForJobs semantics)."""
        with self._lock:
            pending = sorted(
                (j for j in self.jobs.values() if j["state"] == "CREATED"),
                key=lambda j: j["createdTime"])
            if not pending:
                return None
            job = pending[0]
            job["state"] = "QUEUED"
            job["slaveID"] = slave_id
            self._persist()
            return job

    def change_state(self, jid: str, state: str,
                     message: Optional[str] = None) -> Optional[dict]:
        if state not in JOB_STATES:
            raise ValueError(f"unknown job state {state!r}")
        with self._lock:
            job = self.jobs.get(jid)
            if job is None:
                return None
            job["state"] = state
            if message is not None:
                job["message"] = message
            self._persist()
            return job

    def add_statistics(self, jid: str, stats: list) -> Optional[dict]:
        with self._lock:
            job = self.jobs.get(jid)
            if job is None:
                return None
            job["statistics"].extend(stats)
            self._persist()
            return job

    def register_slave(self, host: str) -> dict:
        with self._lock:
            sid = uuid.uuid4().hex[:12]
            slave = {"_id": sid, "host": host, "cpuLoad": None,
                     "lastHeartbeat": time.time()}
            self.slaves[sid] = slave
            self._persist()
            return slave

    def heartbeat(self, sid: str, cpu_load: Optional[float]) -> Optional[dict]:
        with self._lock:
            slave = self.slaves.get(sid)
            if slave is None:
                return None
            slave["cpuLoad"] = cpu_load
            slave["lastHeartbeat"] = time.time()
            self._persist()
            return slave


def _esc(v) -> str:
    from html import escape
    return escape("" if v is None else str(v))


def _fmt_age(ts: Optional[float]) -> str:
    if not ts:
        return "—"
    d = max(0.0, time.time() - ts)
    if d < 120:
        return f"{d:.0f}s ago"
    if d < 7200:
        return f"{d / 60:.0f}m ago"
    return f"{d / 3600:.1f}h ago"


def render_dashboard(board: JobBoard) -> str:
    """Server-rendered supervisor dashboard (the reference's Scala.js
    "transgress" web client, app/js/client DashboardController.scala /
    JobHandling.scala + supervisor routes, re-expressed as one
    self-contained HTML page over the same board state the /api routes
    serve). Auto-refreshes every 5 s — the reference client's poll/WebSocket
    cadence — with zero client-side dependencies so it works in the
    stdlib-only deployment this engine targets."""
    with board._lock:
        jobs = [dict(j) for j in board.jobs.values()]
        slaves = [dict(s) for s in board.slaves.values()]
    jobs.sort(key=lambda j: j.get("createdTime") or 0, reverse=True)
    counts = {s: 0 for s in JOB_STATES}
    for j in jobs:
        counts[j["state"]] = counts.get(j["state"], 0) + 1
    badges = " ".join(
        f'<span class="badge {s.lower()}">{s} {counts.get(s, 0)}</span>'
        for s in JOB_STATES)
    job_rows = []
    for j in jobs[:200]:
        stats = j.get("statistics") or []
        last = stats[-1] if stats else {}
        # reference StatisticsLike fields (models/StatisticsLike.scala:10-17)
        # with the engine's own snapshot keys accepted as fallbacks
        rps = last.get("recordsPerSecond") or last.get("records_per_sec")
        rows = last.get("totalInserted") or last.get("rows")
        pct = last.get("pctComplete")
        stat_txt = " · ".join(x for x in (
            f"{int(rows):,} rows" if rows is not None else None,
            f"{rps:,.0f}/s" if rps else None,
            f"{pct:.0f}%" if pct is not None else None) if x) or "—"
        job_rows.append(
            f'<tr><td><code>{_esc(j["_id"])}</code></td>'
            f'<td>{_esc(j.get("workflowName"))}</td>'
            f'<td>{_esc(os.path.basename(j.get("input") or ""))}</td>'
            f'<td><span class="badge {j["state"].lower()}">'
            f'{_esc(j["state"])}</span></td>'
            f'<td>{_esc(j.get("slaveID") or "—")}</td>'
            f'<td>{stat_txt}</td>'
            f'<td>{_fmt_age(j.get("createdTime"))}</td>'
            f'<td class="msg">{_esc(j.get("message") or "")}</td></tr>')
    slave_rows = []
    for s in sorted(slaves, key=lambda x: x.get("lastHeartbeat") or 0,
                    reverse=True):
        load = s.get("cpuLoad")
        load_txt = f"{load:.2f}" if isinstance(load, (int, float)) else "—"
        alive = (time.time() - (s.get("lastHeartbeat") or 0)) < 60
        slave_rows.append(
            f'<tr><td><code>{_esc(s["_id"])}</code></td>'
            f'<td>{_esc(s.get("host"))}</td>'
            f'<td>{load_txt}</td>'
            f'<td>{_fmt_age(s.get("lastHeartbeat"))}</td>'
            f'<td><span class="badge {"success" if alive else "failed"}">'
            f'{"LIVE" if alive else "STALE"}</span></td></tr>')
    return f"""<!doctype html>
<html><head><meta charset="utf-8">
<meta http-equiv="refresh" content="5">
<title>qwery-ray supervisor</title>
<style>
 body{{font:14px/1.5 system-ui,sans-serif;margin:2rem;color:#222}}
 h1{{font-size:1.3rem}} h2{{font-size:1.05rem;margin-top:2rem}}
 table{{border-collapse:collapse;width:100%}}
 th,td{{text-align:left;padding:.3rem .6rem;border-bottom:1px solid #ddd}}
 th{{background:#f5f5f5}} code{{font-size:.85em}}
 .msg{{color:#777;max-width:28rem;overflow:hidden;text-overflow:ellipsis}}
 .badge{{padding:.1rem .5rem;border-radius:.6rem;font-size:.8em;
        background:#eee}}
 .badge.running{{background:#cce5ff}} .badge.success{{background:#d4edda}}
 .badge.failed{{background:#f8d7da}} .badge.queued{{background:#fff3cd}}
</style></head><body>
<h1>qwery-ray ETL supervisor</h1>
<p>{badges} &nbsp;·&nbsp; {len(slaves)} slave(s) &nbsp;·&nbsp;
refreshes every 5 s &nbsp;·&nbsp; JSON: <a href="/api/jobs">/api/jobs</a>
<a href="/api/slaves">/api/slaves</a></p>
<h2>Jobs ({len(jobs)})</h2>
<table><tr><th>id</th><th>workflow</th><th>input</th><th>state</th>
<th>slave</th><th>last stats</th><th>created</th><th>message</th></tr>
{''.join(job_rows) or '<tr><td colspan="8">no jobs yet</td></tr>'}
</table>
<h2>Slaves ({len(slaves)})</h2>
<table><tr><th>id</th><th>host</th><th>cpu load</th><th>heartbeat</th>
<th>status</th></tr>
{''.join(slave_rows) or '<tr><td colspan="5">no slaves registered</td></tr>'}
</table>
</body></html>"""


def _make_handler(board: JobBoard):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, obj, code: int = 200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n) or b"{}") if n else {}

        def _send_html(self, html: str, code: int = 200):
            body = html.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parts = self.path.strip("/").split("/")
            if parts == [""] or parts == ["dashboard"]:
                self._send_html(render_dashboard(board))
            elif parts[:2] == ["api", "jobs"]:
                self._send(list(board.jobs.values()))
            elif parts[:2] == ["api", "job"] and len(parts) == 3:
                job = board.jobs.get(parts[2])
                self._send([job] if job else [], 200 if job else 404)
            elif parts[:2] == ["api", "slaves"]:
                self._send(list(board.slaves.values()))
            else:
                self._send({"error": "not found"}, 404)

        def do_POST(self):
            parts = self.path.strip("/").split("/")
            if parts[:2] == ["api", "jobs"]:
                b = self._body()
                self._send([board.create_job(b.get("input", ""),
                                             b.get("workflowName", ""))])
            elif parts[:2] == ["api", "slaves"]:
                b = self._body()
                self._send([board.register_slave(b.get("host", "?"))])
            else:
                self._send({"error": "not found"}, 404)

        def do_PATCH(self):
            parts = self.path.strip("/").split("/")
            if parts[:3] == ["api", "jobs", "checkout"] and len(parts) == 4:
                job = board.checkout(parts[3])
                self._send([job] if job else [])
            elif parts[:2] == ["api", "job"] and len(parts) == 5 \
                    and parts[3] == "state":
                b = self._body()
                job = board.change_state(parts[2], parts[4],
                                         b.get("message"))
                self._send([job] if job else [], 200 if job else 404)
            elif parts[:2] == ["api", "job"] and len(parts) == 4 \
                    and parts[3] == "statistics":
                job = board.add_statistics(parts[2], self._body_list())
                self._send([job] if job else [], 200 if job else 404)
            elif parts[:2] == ["api", "slave"] and len(parts) == 4 \
                    and parts[3] == "heartbeat":
                b = self._body()
                slave = board.heartbeat(parts[2], b.get("cpuLoad"))
                self._send([slave] if slave else [], 200 if slave else 404)
            else:
                self._send({"error": "not found"}, 404)

        def _body_list(self) -> list:
            n = int(self.headers.get("Content-Length") or 0)
            data = json.loads(self.rfile.read(n) or b"[]") if n else []
            return data if isinstance(data, list) else [data]

    return Handler


class JobSupervisor:
    """The REST supervisor (reference ETL server side). ``port=0`` binds an
    ephemeral port (tests); the bound port is ``self.port``."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 snapshot_path: Optional[str] = None):
        self.board = JobBoard(snapshot_path)
        self._server = ThreadingHTTPServer((host, port),
                                           _make_handler(self.board))
        self.host, self.port = self._server.server_address[:2]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    @property
    def base_url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "JobSupervisor":
        self._thread.start()
        return self

    def stop(self) -> None:
        # shutdown() blocks on an event that only serve_forever() sets —
        # calling it on a supervisor that was never start()ed hangs forever
        if self._thread.is_alive():
            self._server.shutdown()
        self._server.server_close()


class JobClient:
    """Worker-side REST client (reference etl/rest/JobClient.scala:22-48)."""

    def __init__(self, base_url: str):
        import urllib.parse

        u = urllib.parse.urlparse(base_url)
        self.host, self.port = u.hostname, u.port

    def _req(self, method: str, path: str, body=None) -> list:
        import http.client

        conn = http.client.HTTPConnection(self.host, self.port, timeout=30)
        try:
            payload = json.dumps(body).encode() if body is not None else None
            conn.request(method, path, body=payload,
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = json.loads(resp.read() or b"[]")
            return data if isinstance(data, list) else [data]
        finally:
            conn.close()

    def create_job(self, input_path: str, workflow: str) -> dict:
        return self._req("POST", "/api/jobs",
                         {"input": input_path,
                          "workflowName": workflow})[0]

    def checkout_job(self, slave_id: str) -> Optional[dict]:
        out = self._req("PATCH", f"/api/jobs/checkout/{slave_id}")
        return out[0] if out else None

    def change_state(self, jid: str, state: str,
                     message: Optional[str] = None) -> Optional[dict]:
        out = self._req("PATCH", f"/api/job/{jid}/state/{state}",
                        {"message": message} if message else None)
        return out[0] if out else None

    def update_statistics(self, jid: str, stats: list) -> Optional[dict]:
        out = self._req("PATCH", f"/api/job/{jid}/statistics", stats)
        return out[0] if out else None

    def register_slave(self, host: str) -> dict:
        return self._req("POST", "/api/slaves", {"host": host})[0]

    def heartbeat(self, slave_id: str,
                  cpu_load: Optional[float] = None) -> Optional[dict]:
        out = self._req("PATCH", f"/api/slave/{slave_id}/heartbeat",
                        {"cpuLoad": cpu_load})
        return out[0] if out else None

    def jobs(self) -> list:
        return self._req("GET", "/api/jobs")


def execute_job(client: JobClient, controller, job: dict) -> dict:
    """Run ONE claimed job through the controller's trigger machinery and
    report state + statistics back (reference QweryETL.processJob)."""
    jid = job["_id"]
    client.change_state(jid, "RUNNING")
    fname = os.path.basename(job["input"])
    trigger = controller.lookup_trigger(fname)
    if trigger is None:
        return client.change_state(jid, "FAILED",
                                   f"no trigger accepts '{fname}'")
    result = controller._run_job(trigger, fname)
    client.update_statistics(jid, [{
        "rows": result.rows_inserted, "elapsedSec": result.elapsed_sec,
        "status": result.status}])
    return client.change_state(
        jid, "SUCCESS" if result.status == "archived" else "FAILED",
        result.error)


def run_worker(base_url: str, controller, *, max_jobs: Optional[int] = None,
               poll_interval: float = 0.2,
               idle_rounds: int = 3) -> list[dict]:
    """One worker process's claim-and-run loop (reference
    QweryETL.checkForJobs → processJob): register as slave, claim jobs,
    execute each through the controller's trigger machinery, report state
    + run statistics back. Returns the completed job dicts."""
    client = JobClient(base_url)
    slave = client.register_slave(host=os.uname().nodename)
    sid = slave["_id"]
    done: list[dict] = []
    idle = 0
    while idle < idle_rounds and (max_jobs is None or len(done) < max_jobs):
        try:
            load = os.getloadavg()[0]
        except OSError:
            load = None
        client.heartbeat(sid, load)
        job = client.checkout_job(sid)
        if job is None:
            idle += 1
            time.sleep(poll_interval)
            continue
        idle = 0
        done.append(execute_job(client, controller, job))
    return done
