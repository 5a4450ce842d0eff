"""ETL trigger/workflow tests (reference etltest/triggers/TriggerTest.scala:
prefix-match trigger executes an INSERT script; file lifecycle
inbox → work → archive/failed)."""

import json
import os

import pytest


@pytest.fixture()
def etl_home(ray_session, tmp_path):
    home = str(tmp_path / "etl")
    os.makedirs(os.path.join(home, "inbox"), exist_ok=True)
    return home


def write_inbox(home, name, text):
    with open(os.path.join(home, "inbox", name), "w") as f:
        f.write(text)


class TestConstraints:
    def test_constraint_kinds(self):
        from qwery_ray.etl.triggers import Constraint

        assert Constraint(prefix="comp").matches("Companylist.csv")
        assert not Constraint(prefix="comp").matches("list.csv")
        assert Constraint(suffix=".csv").matches("a.CSV")
        assert Constraint(contains="any").matches("companylist.csv")
        assert Constraint(equals="a.csv").matches("A.csv")
        assert Constraint(regex=r"comp\w+\.csv").matches("companylist.csv")
        assert not Constraint(regex=r"comp\w+\.csv").matches("x.csv")


class TestWorkflow:
    def test_trigger_runs_script_and_archives(self, etl_home, tmp_path):
        from qwery_ray.etl.triggers import Constraint, ETLController, Trigger

        out = str(tmp_path / "out.json")
        trig = Trigger(
            "company-lists",
            [Constraint(prefix="company"), Constraint(suffix=".csv")],
            f"INSERT INTO '{out}' (symbol, sector) "
            "SELECT Symbol, Sector FROM '{{ work.file.path }}' "
            "WHERE Sector = 'Finance'")
        ctl = ETLController(etl_home, [trig])
        write_inbox(etl_home, "companylist.csv",
                    "Symbol,Sector\nAAPL,Technology\nGS,Finance\nMS,Finance\n")
        write_inbox(etl_home, "ignored.txt", "nope")
        results = ctl.process_inbox()
        assert len(results) == 1
        r = results[0]
        assert r.status == "archived" and r.rows_inserted == 2
        # file archived under yyyy/MM/dd
        archived = []
        for root, _, files in os.walk(os.path.join(etl_home, "archive")):
            archived += files
        assert archived == ["companylist.csv"]
        assert os.listdir(os.path.join(etl_home, "inbox")) == ["ignored.txt"]
        with open(out) as f:
            rows = [json.loads(l) for l in f]
        assert {r["symbol"] for r in rows} == {"GS", "MS"}

    def test_failing_job_goes_to_failed(self, etl_home):
        from qwery_ray.etl.triggers import Constraint, ETLController, Trigger

        trig = Trigger("bad", [Constraint(suffix=".csv")],
                       "SELECT * FROM nonexistent_table_xyz")
        ctl = ETLController(etl_home, [trig])
        write_inbox(etl_home, "data.csv", "a,b\n1,2\n")
        results = ctl.process_inbox()
        assert results[0].status == "failed"
        assert results[0].error
        failed = []
        for root, _, files in os.walk(os.path.join(etl_home, "failed")):
            failed += files
        assert failed == ["data.csv"]

    def test_from_config_json(self, etl_home, tmp_path):
        from qwery_ray.etl.triggers import ETLController

        cfg = tmp_path / "triggers.json"
        cfg.write_text(json.dumps({"triggers": [{
            "name": "t1",
            "constraints": [{"suffix": ".csv"}],
            "script": "SELECT 1 AS one",
        }]}))
        ctl = ETLController.from_config(etl_home, str(cfg))
        assert ctl.lookup_trigger("x.csv").name == "t1"
        assert ctl.lookup_trigger("x.json") is None


class TestScheduledEvents:
    def test_next_run_rollover_and_due(self):
        import datetime as dt

        from qwery_ray.etl.schedule import ScheduledEvent

        ev = ScheduledEvent("nightly", "SELECT 1", ["02:30", "14:00"])
        now = dt.datetime(2026, 8, 17, 15, 0)
        assert ev.next_run(now) == dt.datetime(2026, 8, 18, 2, 30)
        assert ev.due(now)  # 14:00 already passed and never ran
        ev.last_run = now
        assert not ev.due(dt.datetime(2026, 8, 17, 15, 5))
        assert ev.due(dt.datetime(2026, 8, 18, 2, 31))

    def test_run_pending_executes_script(self, ray_session, tmp_path):
        import datetime as dt
        import json as _json

        from qwery_ray.etl.schedule import Scheduler

        out = tmp_path / "sched_out.csv"
        cfg = tmp_path / "scheduled-events.json"
        cfg.write_text(_json.dumps({"events": [{
            "name": "export-regions",
            "script": f"INSERT INTO '{out}' (name) SELECT r_name FROM region",
            "times": ["03:00"],
        }]}))

        def factory():
            from qwery_ray import QweryEngine

            from conftest import SF_TINY

            return QweryEngine(table_root=SF_TINY)

        sched = Scheduler.from_config(str(cfg), engine_factory=factory)
        ran = sched.run_pending(dt.datetime(2026, 8, 17, 3, 1))
        assert ran == ["export-regions"]
        assert len(out.read_text().strip().splitlines()) == 6  # header + 5
        # second poll in the same window: no double-run
        assert sched.run_pending(dt.datetime(2026, 8, 17, 3, 2)) == []


class TestJobSupervisorREST:
    """Job-distribution REST protocol (reference QweryETL.scala:46-77 +
    etl/rest/JobClient.scala:22-48): slave registration, atomic job
    checkout, state transitions, statistics, heartbeats, restart resume."""

    def test_protocol_roundtrip(self, tmp_path):
        from qwery_ray.etl.rest import JobClient, JobSupervisor

        sup = JobSupervisor(snapshot_path=str(tmp_path / "board.json")).start()
        try:
            client = JobClient(sup.base_url)
            slave = client.register_slave("worker-1")
            assert slave["_id"]
            job = client.create_job("/inbox/companylist.csv",
                                    "company-lists")
            assert job["state"] == "CREATED"
            # atomic checkout: first wins, second gets nothing
            claimed = client.checkout_job(slave["_id"])
            assert claimed["_id"] == job["_id"]
            assert claimed["state"] == "QUEUED"
            assert client.checkout_job("other-slave") is None
            client.change_state(job["_id"], "RUNNING")
            client.update_statistics(job["_id"],
                                     [{"rows": 5, "elapsedSec": 0.1}])
            done = client.change_state(job["_id"], "SUCCESS")
            assert done["state"] == "SUCCESS"
            assert done["statistics"] == [{"rows": 5, "elapsedSec": 0.1}]
            hb = client.heartbeat(slave["_id"], 0.5)
            assert hb["cpuLoad"] == 0.5
        finally:
            sup.stop()
        # board snapshot survives a supervisor restart (queue resume)
        sup2 = JobSupervisor(snapshot_path=str(tmp_path / "board.json"))
        assert list(sup2.board.jobs.values())[0]["state"] == "SUCCESS"
        sup2.stop()

    def test_worker_loop_runs_jobs(self, etl_home, tmp_path):
        from qwery_ray.etl.rest import (JobClient, JobSupervisor,
                                        run_worker)
        from qwery_ray.etl.triggers import (Constraint, ETLController,
                                            Trigger)

        out = str(tmp_path / "out.json")
        trig = Trigger(
            "company-lists",
            [Constraint(prefix="company"), Constraint(suffix=".csv")],
            f"INSERT INTO '{out}' (symbol, sector) "
            "SELECT Symbol, Sector FROM '{{ work.file.path }}' "
            "WHERE Sector = 'Finance'")
        ctl = ETLController(etl_home, [trig])
        write_inbox(etl_home, "companylist.csv",
                    "Symbol,Sector\nGS,Finance\nAAPL,Technology\n")
        write_inbox(etl_home, "companyother.csv", "Symbol,Sector\n")

        sup = JobSupervisor().start()
        try:
            client = JobClient(sup.base_url)
            for f in ("companylist.csv", "companyother.csv"):
                client.create_job(os.path.join(etl_home, "inbox", f),
                                  "company-lists")
            done = run_worker(sup.base_url, ctl, max_jobs=2,
                              poll_interval=0.01, idle_rounds=2)
            assert [j["state"] for j in done] == ["SUCCESS", "SUCCESS"]
            assert done[0]["statistics"][0]["rows"] == 1
            # inbox drained, archive populated by the controller
            assert os.listdir(os.path.join(etl_home, "inbox")) == []
        finally:
            sup.stop()

    def test_worker_reports_failure(self, etl_home):
        from qwery_ray.etl.rest import JobClient, JobSupervisor, run_worker
        from qwery_ray.etl.triggers import Constraint, ETLController, Trigger

        trig = Trigger("bad", [Constraint(suffix=".csv")],
                       "SELECT FROM WHERE !!!")
        ctl = ETLController(etl_home, [trig])
        write_inbox(etl_home, "data.csv", "a,b\n1,2\n")
        sup = JobSupervisor().start()
        try:
            client = JobClient(sup.base_url)
            client.create_job(os.path.join(etl_home, "inbox", "data.csv"),
                              "bad")
            done = run_worker(sup.base_url, ctl, max_jobs=1,
                              poll_interval=0.01, idle_rounds=2)
            assert done[0]["state"] == "FAILED"
        finally:
            sup.stop()


class TestDashboard:
    """Supervisor web dashboard (the reference's Scala.js transgress client,
    app/js/client/.../DashboardController.scala + JobHandling.scala,
    re-expressed as a server-rendered page over the same board state)."""

    def _get(self, url: str) -> tuple[int, str, str]:
        import urllib.request
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, r.headers.get("Content-Type", ""), \
                r.read().decode()

    def test_dashboard_renders_board_state(self):
        from qwery_ray.etl.rest import JobClient, JobSupervisor

        sup = JobSupervisor().start()
        try:
            client = JobClient(sup.base_url)
            slave = client.register_slave("node-7")
            client.heartbeat(slave["_id"], 0.42)
            job = client.create_job("/inbox/companylist.csv", "company-lists")
            client.checkout_job(slave["_id"])
            client.change_state(job["_id"], "RUNNING")
            client.update_statistics(job["_id"], [{
                "rows": 1234, "recordsPerSecond": 567.0,
                "pctComplete": 50.0}])

            for path in ("/", "/dashboard"):
                code, ctype, html = self._get(sup.base_url + path)
                assert code == 200 and ctype.startswith("text/html")
                assert job["_id"] in html
                assert "company-lists" in html
                assert "companylist.csv" in html
                assert "RUNNING" in html
                assert "node-7" in html
                assert "0.42" in html          # slave cpu load
                assert "1,234 rows" in html    # latest statistics snapshot
                assert "567/s" in html
                assert "50%" in html
                assert "LIVE" in html
        finally:
            sup.stop()

    def test_dashboard_empty_board_and_escaping(self):
        from qwery_ray.etl.rest import JobClient, JobSupervisor

        sup = JobSupervisor().start()
        try:
            code, _, html = self._get(sup.base_url + "/dashboard")
            assert code == 200
            assert "no jobs yet" in html and "no slaves registered" in html
            # HTML injection via job fields must be escaped
            client = JobClient(sup.base_url)
            client.create_job("/inbox/<script>alert(1)<x>.csv",
                              "<b>wf</b>")
            _, _, html = self._get(sup.base_url + "/")
            assert "<script>alert(1)" not in html
            assert "&lt;script&gt;" in html
            assert "<b>wf</b>" not in html and "&lt;b&gt;wf&lt;/b&gt;" in html
        finally:
            sup.stop()
