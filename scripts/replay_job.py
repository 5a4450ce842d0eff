"""CDC replay driver — the `ray job submit` entrypoint.

    ray job submit -- python scripts/replay_job.py \
        --events /data/binlog_parquet --lake /data/lake \
        --partitions 4096 --chunk-lsns 100000000 [--follow]

On a real cluster this is the long-running ingest job: it tails the event
log, commits a checkpointed transaction per LSN chunk, and exits cleanly on
idle (or runs forever with --follow --idle-rounds 0). Locally it runs the
same code path the tests and bench exercise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--events", required=True, help="event-log parquet dir")
    p.add_argument("--lake", required=True, help="lake directory")
    p.add_argument("--partitions", type=int, default=128)
    p.add_argument("--chunk-lsns", type=int, default=None,
                   help="checkpoint granularity (LSNs per txn)")
    p.add_argument("--follow", action="store_true",
                   help="keep tailing for new segments")
    p.add_argument("--poll-interval", type=float, default=5.0)
    p.add_argument("--idle-rounds", type=int, default=3,
                   help="with --follow: stop after N empty polls (0 = forever)")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` this attaches to the cluster; standalone it
        # starts a local one
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from qwery_ray.cdc.engine import CDCLakeEngine

    eng = CDCLakeEngine(args.lake, num_partitions=args.partitions)
    if args.follow:
        manifest = eng.follow(
            args.events, poll_interval=args.poll_interval,
            idle_rounds=args.idle_rounds or None,
            chunk_lsns=args.chunk_lsns)
    else:
        manifest = eng.replay(args.events, chunk_lsns=args.chunk_lsns)
    print(json.dumps({
        "watermark_lsn": manifest["watermark_lsn"],
        "version": manifest["version"],
        "partitions": len(manifest["partitions"]),
        "txns": len(manifest["committed_txns"]),
        "rows": sum(i["rows"] for i in manifest["partitions"].values()),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
