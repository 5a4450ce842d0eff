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


def apply_merge_step(rng: random.Random, sess, lake: str,
                     oracle: dict) -> int:
    """One randomized MERGE INTO the lake (r5: MERGE-arm sequences against
    lake targets) + the oracle update over the VISIBLE state. Returns the
    lake's new watermark so the caller can keep its LSN counter ahead."""
    import json

    ks = rng.sample(range(0, 30), rng.randint(1, 5))
    rows = [(k, rng.randint(-100, 100),
             rng.choice("abcdef") * rng.randint(1, 3)) for k in ks]
    thresh = rng.randint(-60, 60)
    vals = ", ".join(f"({k}, {v}, '{s}')" for k, v, s in rows)
    sess.sql(
        f"MERGE INTO '{lake}' AS tg USING (SELECT * FROM (VALUES {vals}) "
        f"x(k, v, s)) AS sr ON tg.k = sr.k "
        f"WHEN MATCHED AND sr.v < {thresh} THEN DELETE "
        f"WHEN MATCHED THEN UPDATE SET v = sr.v, s = sr.s "
        f"WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (sr.k, sr.v, sr.s)")
    wm = json.load(open(os.path.join(lake, "manifest.json")))["watermark_lsn"]
    for k, v, s in rows:
        visible = k in oracle and oracle[k][1] is not None
        if visible and v < thresh:
            oracle[k] = (wm, None, None)       # matched-delete tombstone
        else:
            oracle[k] = (wm, v, s)             # matched-update / insert
    return wm


def run_sequence(run: int, seed: int, steps: int, sess) -> int:
    rng = random.Random(seed * 1000 + run)
    lake = os.path.join(tempfile.mkdtemp(prefix="lakefuzz_"), "lake")
    oracle: dict[int, tuple] = {}  # k -> (lsn, v, s)
    lsn = 0
    bad = 0
    for i in range(steps):
        if i > 0 and rng.random() < 0.35:
            # MERGE assigns its own LSNs above the watermark — sync the
            # counter so later UPSERT literals stay ahead of it
            lsn = max(lsn, apply_merge_step(rng, sess, lake, oracle))
            rows = []
        else:
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
            with_lake = " WITH LAKE" if i == 0 else ""  # resume after txn 1
            sess.sql(
                f"UPSERT INTO '{lake}'{with_lake} "
                f"SELECT * FROM (VALUES {vals}) t(lsn, k, v, s, op) "
                f"KEYED ON k")
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
