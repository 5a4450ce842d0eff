"""Randomized lake-sequence differ for the flagship path.

Drives the exactly-once CDC lake engine through its SQL surface with a
randomized sequence of `UPSERT INTO '<lake>' [WITH LAKE] SELECT … FROM
(VALUES …) KEYED ON k` statements — each statement a new transaction that
must resume from the previous watermark — and checks the lake state after
EVERY statement against a driver-side last-writer-wins oracle (pandas
dedup by key on max LSN). Reads go back through `FROM '<lake>' WITH LAKE`
so the snapshot-read path is exercised too.

Complements tests/test_cdc_replay.py (replay-engine property tests over
synthesized event streams) by fuzzing the multi-statement SQL-surface
resume path end-to-end.

Usage:
    python scripts/fuzz_lake_vs_oracle.py [--steps 25] [--seed 7] [--runs 4]
"""
import argparse
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd


def run_sequence(run: int, seed: int, steps: int, sess) -> int:
    rng = random.Random(seed * 1000 + run)
    lake = os.path.join(tempfile.mkdtemp(prefix="lakefuzz_"), "lake")
    oracle: dict[int, tuple] = {}  # k -> (lsn, v, s)
    lsn = 0
    bad = 0
    for i in range(steps):
        rows = []
        for _ in range(rng.randint(1, 6)):
            lsn += 1
            k = rng.randint(0, 30)
            v = rng.randint(-100, 100)
            s = rng.choice("abcdef") * rng.randint(1, 3)
            op = "delete" if rng.random() < 0.15 else "upsert"
            rows.append((lsn, k, v, s, op))
        vals = ", ".join(f"({l}, {k}, {v}, '{s}', '{op}')"
                         for l, k, v, s, op in rows)
        with_lake = " WITH LAKE" if i == 0 else ""  # resume path after txn 1
        sess.sql(
            f"UPSERT INTO '{lake}'{with_lake} "
            f"SELECT * FROM (VALUES {vals}) t(lsn, k, v, s, op) KEYED ON k")
        for l, k, v, s, op in rows:  # LWW oracle; tombstones stay in the
            # dict (a later lower-LSN upsert must not resurrect the key)
            if k not in oracle or oracle[k][0] < l:
                oracle[k] = (l, v, s) if op == "upsert" else (l, None, None)
        back = sess.sql(f"SELECT k, v, s FROM '{lake}' WITH LAKE")
        got = (back.to_pandas() if hasattr(back, "to_pandas") else back) \
            .sort_values("k", ignore_index=True)
        want = pd.DataFrame(
            [(k, v, s) for k, (l, v, s) in sorted(oracle.items())
             if v is not None],
            columns=["k", "v", "s"])
        if len(got) != len(want) or \
                not (got["k"].to_numpy() == want["k"].to_numpy()).all() or \
                not (got["v"].to_numpy() == want["v"].to_numpy()).all() or \
                not (got["s"].to_numpy() == want["s"].to_numpy()).all():
            print(f"[run {run} step {i}] LAKE STATE MISMATCH\n"
                  f"got:\n{got}\nwant:\n{want}")
            bad += 1
            break
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from qwery_ray.engine.session import QweryEngine
    sess = QweryEngine()
    bad = sum(run_sequence(r, args.seed, args.steps, sess)
              for r in range(args.runs))
    print(f"\n{args.runs} runs x {args.steps} steps, {bad} failures "
          f"(seed={args.seed})")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
