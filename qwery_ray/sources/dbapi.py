"""DBAPI (PEP 249) source/sink — the reference's JDBC parity
(core/sources/JDBCInputSource.scala:14-60 query → rows,
JDBCOutputSource.scala:62-104 insert-else-update upsert), re-expressed for
Python database drivers (sqlite3, psycopg2, mysqlclient, ...).

Read shapes:
- ``read_sql(query, conn_factory)`` — driver-side paged fetch → arrow
  blocks (small/medium results).
- ``read_sql_partitioned(...)`` — the scale path: the value range of a
  numeric partition column splits into N slices; EACH RAY TASK opens its
  own connection and reads one slice (the classic JDBC partitioned-read
  pattern — parallelism without any driver-side materialization).

Write: ``write_sql(ds, table, conn_factory)`` batched executemany INSERT;
``upsert_keys`` gives DELETE-matching-keys-then-INSERT per batch inside a
transaction (portable equivalent of the reference's insert-else-update).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import pyarrow as pa
import ray.data as rd

FETCH_BATCH = 50_000


def _rows_to_table(cols: list[str], rows: list) -> pa.Table:
    arrays = {c: [r[i] for r in rows] for i, c in enumerate(cols)}
    return pa.table({c: pa.array(v) for c, v in arrays.items()})


def read_sql(query: str, conn_factory: Callable, *,
             params: Sequence = ()) -> rd.Dataset:
    """Run one query through a fresh DBAPI connection; page results into
    arrow-backed blocks (driver-side — use read_sql_partitioned for large
    tables)."""
    conn = conn_factory()
    try:
        cur = conn.cursor()
        cur.execute(query, tuple(params))
        cols = [d[0] for d in cur.description]
        tables = []
        while True:
            rows = cur.fetchmany(FETCH_BATCH)
            if not rows:
                break
            tables.append(_rows_to_table(cols, rows))
        if not tables:
            return rd.from_arrow(pa.table({c: pa.array([]) for c in cols}))
        return rd.from_arrow(tables)
    finally:
        conn.close()


def read_sql_partitioned(table: str, conn_factory: Callable, *,
                         partition_col: str, num_partitions: int = 16,
                         columns: Optional[list[str]] = None,
                         where: Optional[str] = None) -> rd.Dataset:
    """Parallel DBAPI read: slice ``partition_col``'s [min, max] range into
    ``num_partitions`` intervals; each Ray task opens its own connection
    and fetches one slice. No row ever passes through the driver."""
    conn = conn_factory()
    try:
        cur = conn.cursor()
        base_where = f" WHERE {where}" if where else ""
        cur.execute(f"SELECT MIN({partition_col}), MAX({partition_col}) "
                    f"FROM {table}{base_where}")
        lo, hi = cur.fetchone()
    finally:
        conn.close()
    if lo is None:
        return read_sql(f"SELECT * FROM {table} WHERE 1=0", conn_factory)
    span = max(1, math.ceil((int(hi) - int(lo) + 1) / num_partitions))
    bounds = [(int(lo) + i * span, int(lo) + (i + 1) * span)
              for i in range(num_partitions)]
    col_sql = ", ".join(columns) if columns else "*"
    extra = f" AND ({where})" if where else ""

    def fetch_slice(batch: pa.Table) -> pa.Table:
        out = []
        for b_lo, b_hi in zip(batch.column("lo").to_pylist(),
                              batch.column("hi").to_pylist()):
            conn = conn_factory()  # one connection per task attempt
            try:
                cur = conn.cursor()
                cur.execute(
                    f"SELECT {col_sql} FROM {table} WHERE {partition_col} "
                    f">= ? AND {partition_col} < ?{extra}", (b_lo, b_hi))
                cols = [d[0] for d in cur.description]
                rows = cur.fetchall()
            finally:
                conn.close()
            if rows:
                out.append(_rows_to_table(cols, rows))
        if not out:
            return pa.table({})
        return pa.concat_tables(out, promote_options="permissive")

    spec = rd.from_items([{"lo": b_lo, "hi": b_hi} for b_lo, b_hi in bounds],
                         override_num_blocks=num_partitions)
    return spec.map_batches(fetch_slice, batch_format="pyarrow",
                            batch_size=1)


def write_sql(ds: rd.Dataset, table: str, conn_factory: Callable, *,
              upsert_keys: Optional[list[str]] = None,
              batch_size: int = 10_000) -> int:
    """Stream the dataset into a DBAPI table. With ``upsert_keys``, each
    batch deletes matching-key rows then inserts (transactional, portable
    insert-else-update — reference JDBCOutputSource.scala:62-104)."""
    conn = conn_factory()
    count = 0
    try:
        cur = conn.cursor()
        for batch in ds.iter_batches(batch_size=batch_size,
                                     batch_format="pyarrow"):
            cols = batch.column_names
            rows = list(zip(*[batch.column(c).to_pylist() for c in cols]))
            if not rows:
                continue
            if upsert_keys:
                key_pred = " AND ".join(f"{k} = ?" for k in upsert_keys)
                key_idx = [cols.index(k) for k in upsert_keys]
                cur.executemany(
                    f"DELETE FROM {table} WHERE {key_pred}",
                    [tuple(r[i] for i in key_idx) for r in rows])
            ph = ", ".join("?" for _ in cols)
            cur.executemany(
                f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({ph})",
                rows)
            count += len(rows)
        conn.commit()
    finally:
        conn.close()
    return count
