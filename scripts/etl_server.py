#!/usr/bin/env python
"""Runnable ETL server — the reference `etl/QweryETL.scala:main` analog.

One process ties the pieces together: REST job supervisor (board +
checkout protocol), inbox watcher (new files matching a trigger become
CREATED jobs — reference FileManagementActor's WatchService poll),
scheduled events, and a claim-and-run worker driving the Ray SQL engine.
Extra worker processes on other machines join with `--worker <url>`.

    python scripts/etl_server.py --home /data/etl --config triggers.json \
        [--port 8080] [--poll 5] [--max-rounds N] [--schedule events.json]
    python scripts/etl_server.py --worker http://host:8080 --home ... --config ...

`--max-rounds` bounds the loop (tests / batch drains); the default runs
until interrupted. Requires QWERY_HOME-style layout: inbox/ work/ archive/
failed/ under --home (created if missing).
"""
import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--home", required=True)
    ap.add_argument("--config", required=True,
                    help="triggers.json (reference ETLConfig format)")
    ap.add_argument("--schedule", help="scheduled-events.json")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--poll", type=float, default=5.0)
    ap.add_argument("--max-rounds", type=int, default=0,
                    help="0 = run forever")
    ap.add_argument("--worker", metavar="URL",
                    help="join an existing supervisor instead of serving")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")

    from qwery_ray.etl.rest import (JobClient, JobSupervisor, execute_job,
                                    run_worker)
    from qwery_ray.etl.triggers import ETLController

    ctl = ETLController.from_config(args.home, args.config)

    if args.worker:
        done = run_worker(args.worker, ctl, poll_interval=args.poll,
                          idle_rounds=args.max_rounds or 10 ** 9)
        print(f"worker drained {len(done)} job(s)")
        return 0

    sched = None
    if args.schedule:
        from qwery_ray.etl.schedule import Scheduler

        sched = Scheduler.from_config(args.schedule)

    sup = JobSupervisor(
        port=args.port,
        snapshot_path=os.path.join(args.home, "job_board.json")).start()
    print(f"supervisor at {sup.base_url}", flush=True)
    client = JobClient(sup.base_url)
    slave = client.register_slave(os.uname().nodename)
    inbox = os.path.join(args.home, "inbox")
    os.makedirs(inbox, exist_ok=True)
    queued = {j["input"] for j in client.jobs()}

    rounds = range(args.max_rounds) if args.max_rounds else itertools.count()
    for _ in rounds:
        if sched is not None:
            sched.run_pending()
        for fname in sorted(os.listdir(inbox)):
            path = os.path.join(inbox, fname)
            trig = ctl.lookup_trigger(fname)
            if trig is not None and path not in queued:
                client.create_job(path, trig.name)
                queued.add(path)
        client.heartbeat(slave["_id"])
        job = client.checkout_job(slave["_id"])
        if job is not None:
            done = execute_job(client, ctl, job)
            print(f"job {done['_id']} [{os.path.basename(done['input'])}] "
                  f"-> {done['state']}", flush=True)
        else:
            time.sleep(args.poll)
    sup.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
