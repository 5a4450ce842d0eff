"""Randomized DML-sequence differ for the statement surface.

Applies ONE randomized sequence of INSERT / ANSI-UPDATE / DELETE /
UPSERT…KEYED ON statements to (a) a parquet file target through the
engine's SQL surface and (b) an in-memory DuckDB table, comparing the
full sorted table state after EVERY statement — any drift pinpoints the
exact statement that diverged. This exercises the CDC-adjacent keyed-
mutation path end-to-end (parse → compile → upsert/update/delete →
atomic file rewrite), complementing scripts/fuzz_vs_duckdb.py (SELECT
surface) and the lake-engine property tests (tests/test_cdc_replay.py).

r5: randomized MERGE-arm statements joined the sequence (r4 verdict
item 5). The installed DuckDB has no MERGE, so each MERGE is EMULATED on
the oracle side as an equivalent statement sequence over a temp source
table (matched-set snapshot first, then delete/update/NMBS/insert in
first-match-wins order); tests/test_merge.py additionally fuzzes MERGE
in isolation against a naive reference.

Usage:
    python scripts/fuzz_dml_vs_duckdb.py [--steps 60] [--seed 7] [--runs 5]
"""
import argparse
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

COLS = ["k", "v", "s", "t"]


def seed_rows(rng: random.Random, n: int) -> list[tuple]:
    return [(i, rng.randint(-50, 200), rng.choice("abcdef") * rng.randint(1, 3),
             round(rng.uniform(-10, 1000), 2)) for i in range(n)]


def lit(x) -> str:
    if x is None:
        return "NULL"
    if isinstance(x, str):
        return "'" + x + "'"
    return repr(x)


def row_sql(r) -> str:
    return "(" + ", ".join(lit(x) for x in r) + ")"


def gen_rows(rng: random.Random, m: int, allow_null: bool = True):
    rows = []
    for _ in range(m):
        k = rng.randint(0, 80)
        v = None if allow_null and rng.random() < 0.1 else rng.randint(-50, 200)
        s = None if allow_null and rng.random() < 0.1 else \
            rng.choice("abcdef") * rng.randint(1, 3)
        t = round(rng.uniform(-10, 1000), 2)
        rows.append((k, v, s, t))
    return rows


def gen_pred(rng: random.Random) -> str:
    return rng.choice([
        f"k % {rng.randint(2, 7)} = {rng.randint(0, 1)}",
        f"v > {rng.randint(-20, 150)}",
        f"t < {rng.randint(0, 900)}",
        f"s LIKE '{rng.choice('abc')}%'",
        f"k BETWEEN {rng.randint(0, 30)} AND {rng.randint(30, 80)}",
        "v IS NULL",
        f"k > {rng.randint(60, 90)}",  # often empty — empty-match paths
    ])


def gen_assignments(rng: random.Random) -> str:
    # at most one assignment per column (DuckDB rejects duplicates)
    opts = {
        "v": [f"v = v + {rng.randint(1, 9)}",
              f"v = v * 2 - {rng.randint(0, 5)}",
              "v = k"],    # cross-column: must read the PRE-update row
        "t": ["t = t / 2", f"t = t + {rng.randint(1, 50)}"],
        "s": ["s = UPPER(s)", "s = s || 'x'", "s = COALESCE(s, 'z')"],
    }
    cols = rng.sample(list(opts), rng.randint(1, 2))
    return ", ".join(rng.choice(opts[c]) for c in cols)


def gen_merge_step(rng: random.Random, path: str):
    """One randomized MERGE (unique source keys, random arm subset) + its
    DuckDB emulation: snapshot the matched key set FIRST, then apply the
    arms in the engine's first-match-wins order as plain statements."""
    ks = rng.sample(range(0, 80), rng.randint(1, 6))
    rows = [(k, rng.randint(-50, 200), rng.choice("abcdef"),
             round(rng.uniform(-10, 1000), 2)) for k in ks]
    vals = ", ".join(row_sql(x) for x in rows)

    c1 = f"v > {rng.randint(-20, 150)}"        # matched-delete cond (src)
    c2 = f"v < {rng.randint(-20, 150)}"        # insert cond (src)
    c3 = f"v < {rng.randint(-20, 150)}"        # NMBS cond (target)
    has_del = rng.random() < 0.5
    has_upd = rng.random() < 0.9 or not has_del
    ins_cond = rng.random() < 0.4
    has_nmbs = rng.random() < 0.4
    upd_set_eng = rng.choice(["v = sr.v", "v = sr.v + tg.v",
                              "s = sr.s, v = sr.v"])
    upd_set_ora = upd_set_eng.replace("sr.", "msrc.").replace("tg.", "t.")

    arms, emu = [], []
    emu.append("CREATE OR REPLACE TEMP TABLE msrc "
               "(k BIGINT, v BIGINT, s VARCHAR, t DOUBLE)")
    emu.append(f"INSERT INTO msrc VALUES {vals}")
    emu.append("CREATE OR REPLACE TEMP TABLE mmatched AS "
               "SELECT DISTINCT m.k FROM msrc m JOIN t tt ON tt.k = m.k")
    if has_del:
        arms.append(f"WHEN MATCHED AND sr.{c1} THEN DELETE")
        emu.append(f"DELETE FROM t WHERE k IN (SELECT k FROM msrc m "
                   f"WHERE m.{c1}) AND k IN (SELECT k FROM mmatched)")
    if has_upd:
        arms.append(f"WHEN MATCHED THEN UPDATE SET {upd_set_eng}")
        guard = f" AND NOT (msrc.{c1})" if has_del else ""
        emu.append(f"UPDATE t SET {upd_set_ora} FROM msrc "
                   f"WHERE t.k = msrc.k{guard}")
    if has_nmbs:
        arms.append(f"WHEN NOT MATCHED BY SOURCE AND tg.{c3} "
                    f"THEN UPDATE SET v = tg.v + 1")
        emu.append(f"UPDATE t SET v = v + 1 WHERE k NOT IN "
                   f"(SELECT k FROM msrc) AND {c3}")
    icond_eng = f" AND sr.{c2}" if ins_cond else ""
    icond_ora = f" AND m.{c2}" if ins_cond else ""
    arms.append("WHEN NOT MATCHED" + icond_eng +
                " THEN INSERT (k, v, s, t) VALUES (sr.k, sr.v, sr.s, sr.t)")
    emu.append(f"INSERT INTO t (k, v, s, t) SELECT m.k, m.v, m.s, m.t "
               f"FROM msrc m WHERE m.k NOT IN (SELECT k FROM mmatched)"
               f"{icond_ora}")
    eng = (f"MERGE INTO '{path}' AS tg USING (SELECT * FROM "
           f"(VALUES {vals}) v(k, v, s, t)) AS sr ON tg.k = sr.k "
           + " ".join(arms))
    return eng, "; ".join(emu)


def gen_step(rng: random.Random, path: str, state: dict):
    """(engine_sql, duckdb_sql_or_callable) for one random statement."""
    r = rng.random()
    if r < 0.05 and state["ncols"] < 3:
        # additive schema evolution: INSERT carrying a brand-new column;
        # existing rows null-backfill (DuckDB mirror: ALTER TABLE ADD)
        state["ncols"] += 1
        col = f"x{state['ncols']}"
        state["cols"].append(col)
        rows = gen_rows(rng, rng.randint(1, 3), allow_null=False)
        extra = [rng.randint(0, 9) for _ in rows]
        eng = (f"INSERT INTO '{path}' (k, v, s, t, {col}) "
               + " ".join("VALUES " + row_sql(x + (e,))
                          for x, e in zip(rows, extra)))
        ora = (f"ALTER TABLE t ADD COLUMN {col} BIGINT; "
               f"INSERT INTO t (k, v, s, t, {col}) VALUES "
               + ", ".join(row_sql(x + (e,))
                           for x, e in zip(rows, extra)))
        return eng, ora
    if r < 0.3:
        rows = gen_rows(rng, rng.randint(1, 5))
        eng = (f"INSERT INTO '{path}' (k, v, s, t) "
               + " ".join("VALUES " + row_sql(x) for x in rows))
        ora = ("INSERT INTO t (k, v, s, t) VALUES "
               + ", ".join(row_sql(x) for x in rows))
        return eng, ora
    if r < 0.55:
        pred = gen_pred(rng)
        sets = gen_assignments(rng)
        return (f"UPDATE '{path}' SET {sets} WHERE {pred}",
                f"UPDATE t SET {sets} WHERE {pred}")
    if r < 0.7:
        pred = gen_pred(rng) if rng.random() < 0.9 else None
        w = f" WHERE {pred}" if pred else ""
        return f"DELETE FROM '{path}'{w}", f"DELETE FROM t{w}"
    if r < 0.85:
        return gen_merge_step(rng, path)
    # UPSERT … KEYED ON k: engine replaces ALL target rows sharing an
    # incoming key with the statement's LAST row for that key
    rows = gen_rows(rng, rng.randint(1, 4), allow_null=False)
    eng = (f"UPSERT INTO '{path}' (k, v, s, t) "
           + " ".join("VALUES " + row_sql(x) for x in rows)
           + " KEYED ON k")
    deduped = list({x[0]: x for x in rows}.values())  # last per key wins
    keys = ", ".join(str(x[0]) for x in deduped)
    ora = (f"DELETE FROM t WHERE k IN ({keys}); "
           "INSERT INTO t (k, v, s, t) VALUES "
           + ", ".join(row_sql(x) for x in deduped))
    return eng, ora


def table_state(path: str, cols) -> pd.DataFrame:
    df = pq.read_table(path).to_pandas()
    return df[cols].sort_values(cols, ignore_index=True, na_position="last")


def oracle_state(con, cols) -> pd.DataFrame:
    df = con.execute("SELECT " + ", ".join(cols) + " FROM t").df()
    return df.sort_values(cols, ignore_index=True, na_position="last")


def compare(a: pd.DataFrame, b: pd.DataFrame, cols) -> str:
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in cols:
        av, bv = a[c], b[c]
        if c not in ("s",):
            x = av.astype(float).to_numpy()
            y = bv.astype(float).to_numpy()
            ok = np.isclose(x, y, rtol=0, atol=0, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                return f"VALUE col {c} row {i}: {x[i]!r} vs {y[i]!r}"
        else:
            x = av.astype("string").fillna("\0null")
            y = bv.astype("string").fillna("\0null")
            if not (x == y).all():
                i = int((x != y).to_numpy().argmax())
                return f"VALUE col {c} row {i}: {x[i]!r} vs {y[i]!r}"
    return ""


def run_sequence(run: int, seed: int, steps: int, sess) -> int:
    rng = random.Random(seed * 1000 + run)
    rows = seed_rows(rng, rng.randint(10, 40))
    tmp = tempfile.mkdtemp(prefix="dmlfuzz_")
    path = os.path.join(tmp, "t.parquet")
    tbl = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
        "s": pa.array([r[2] for r in rows], pa.string()),
        "t": pa.array([r[3] for r in rows], pa.float64()),
    })
    pq.write_table(tbl, path)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, v BIGINT, s VARCHAR, t DOUBLE)")
    con.execute("INSERT INTO t SELECT * FROM tbl")
    state = {"ncols": 0, "cols": list(COLS)}
    bad = 0
    for i in range(steps):
        eng_sql, ora_sql = gen_step(rng, path, state)
        try:
            sess.sql(eng_sql)
        except Exception as ex:
            print(f"[run {run} step {i}] ENGINE-ERR {type(ex).__name__}: "
                  f"{str(ex)[:120]}\n    {eng_sql}")
            bad += 1
            break
        for stmt in ora_sql.split("; "):
            con.execute(stmt)
        diff = compare(table_state(path, state["cols"]),
                       oracle_state(con, state["cols"]), state["cols"])
        if diff:
            print(f"[run {run} step {i}] MISMATCH {diff}\n    {eng_sql}")
            bad += 1
            break
    con.close()
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--runs", type=int, default=5)
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
