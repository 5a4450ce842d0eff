"""Single-process reference replay — the correctness oracle.

The executable restatement of the reference's UPSERT KEYED ON semantics
(ops/sql/Upsert.scala, JDBCOutputSource.scala:62-104): a dict keyed by
(repo, path), events applied strictly in LSN order, delete removes the key.
Used only on tiny fixtures (FIXTURES.md §5)."""

from __future__ import annotations

import glob
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq


def naive_replay(events_dir: str, *, upto_lsn: int | None = None) -> dict:
    """Returns {(repo, path): row_dict} — the expected final lake state."""
    files = sorted(glob.glob(f"{events_dir}/*.parquet"))
    rows = []
    for f in files:
        rows.extend(pq.read_table(f).to_pylist())
    rows.sort(key=lambda r: r["lsn"])
    state: dict = {}
    for r in rows:
        if upto_lsn is not None and r["lsn"] > upto_lsn:
            continue
        key = (r["repo"], r["path"])
        if r["op"] == "delete":
            state.pop(key, None)
        else:
            row = {k: v for k, v in r.items() if k != "op"}
            state[key] = row
    return state


def sha256_of_state(state: dict) -> dict:
    """{(repo, path): sha256(content)} — the per-row invariant vs the engine."""
    return {
        k: hashlib.sha256((v["content"] or "").encode()).hexdigest()
        for k, v in state.items()
    }


def sha256_of_table(table: pa.Table) -> dict:
    out = {}
    for r in table.select(["repo", "path", "content"]).to_pylist():
        out[(r["repo"], r["path"])] = hashlib.sha256(
            (r["content"] or "").encode()).hexdigest()
    return out
