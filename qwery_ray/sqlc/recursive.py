"""WITH RECURSIVE: semi-naive fixpoint evaluation over Ray Data.

Standard SQL recursive-CTE semantics (Postgres/DuckDB model, public ANSI
SQL:1999 7.13): the CTE body must be ``base UNION [ALL] recursive`` where
only the recursive term references the CTE name; each iteration the
recursive term sees ONLY the previous iteration's rows (the "working
table"); UNION (distinct) additionally drops rows already produced, which
is what makes cyclic graphs terminate.

Scale shape: every iteration's base/recursive term is a full distributed
Ray Data query — joins against big tables inside the recursive term run as
normal broadcast/shuffle joins. Only the per-iteration working table and
the accumulated result materialize on the driver (the identical contract
Postgres and DuckDB use: their working tables are also materialized). A
recursion-depth cap (``QWERY_MAX_RECURSION``, default 10000) converts
runaway UNION ALL recursions into an error instead of an infinite loop.

The reference engine has no recursive queries — this is a superset on the
statement surface (SURVEY.md §2.1), same family as window functions and
set ops.
"""

from __future__ import annotations

import os
from dataclasses import fields, is_dataclass

import pyarrow as pa

from . import ast as A

MAX_ITER = int(os.environ.get("QWERY_MAX_RECURSION", "10000"))


def references_table(node, name: str) -> bool:
    """True if any TableRef under ``node`` (statements, sources, exprs,
    nested tuples) names ``name`` (case-insensitive)."""
    target = name.lower()

    def walk(x) -> bool:
        if isinstance(x, A.TableRef):
            if x.name.lower() == target:
                return True
        if is_dataclass(x) and not isinstance(x, type):
            return any(walk(getattr(x, f.name)) for f in fields(x))
        if isinstance(x, (tuple, list)):
            return any(walk(v) for v in x)
        return False

    return walk(node)


def split_recursive_union(query, name: str):
    """Split ``base UNION [ALL] recursive`` for CTE ``name``.

    UNION ALL chains associate left, so a multi-branch body like
    ``b1 UNION ALL b2 UNION ALL rec`` splits at the outermost node whose
    right side self-references; everything left of it is the base. Returns
    (base, recursive_term, distinct). Raises if the shape is not the ANSI
    one (self-reference in the base / no UNION at all)."""
    if not isinstance(query, A.Union):
        raise ValueError(
            "recursive CTE must be 'base UNION [ALL] recursive-term'")
    if references_table(query.right, name):
        base, rec = query.left, query.right
    else:
        # self-reference must then live deeper on the left — not ANSI
        raise ValueError(
            "recursive CTE: the self-referencing term must be the last "
            "UNION branch")
    if references_table(base, name):
        raise ValueError(
            "recursive CTE: the base (non-recursive) term must not "
            f"reference {name!r}")
    return base, rec, query.distinct


def _rename(table: pa.Table, cols) -> pa.Table:
    if cols is None:
        return table
    if len(cols) != table.num_columns:
        raise ValueError(
            f"recursive CTE declares {len(cols)} column(s) but the query "
            f"produces {table.num_columns}")
    return table.rename_columns(list(cols))


def _distinct_minus(new: pa.Table, seen: set) -> pa.Table:
    """Rows of ``new``, de-duplicated, minus rows already in ``seen``
    (which it updates). Row identity = the tuple of Python values — the
    driver-side working sets here are small by the recursion contract."""
    if new.num_rows == 0:
        return new
    keep = []
    cols = [new.column(i).to_pylist() for i in range(new.num_columns)]
    for r in range(new.num_rows):
        key = tuple(col[r] for col in cols)
        if key not in seen:
            seen.add(key)
            keep.append(r)
    if len(keep) == new.num_rows:
        return new
    return new.take(pa.array(keep, type=pa.int64()))


def run_recursive_cte(session, name: str, query, cols) -> pa.Table:
    """Execute one recursive CTE to fixpoint; returns the final table."""
    from .compiler import _materialize_small

    base, rec, distinct = split_recursive_union(query, name)

    def run(stmt) -> pa.Table:
        res = session.execute(stmt)
        tbl = _materialize_small(res) if not isinstance(res, pa.Table) \
            else res
        if tbl.num_rows == 0 and tbl.num_columns == 0:
            # fully-filtered Ray datasets can lose their schema (known
            # Ray 2.49 behavior) — an empty fixpoint delta; the caller
            # only checks num_rows
            return tbl
        return _rename(tbl, cols)

    acc = run(base)
    seen: set = set()
    if distinct:
        acc = _distinct_minus(acc, seen)
    delta = acc
    chunks = [acc]
    key = name.lower()
    saved = session.views.get(key)
    try:
        for _ in range(MAX_ITER):
            if delta.num_rows == 0:
                break
            # the recursive term sees ONLY the previous iteration's rows
            session.views[key] = A.MaterializedTable(delta, name)
            new = run(rec)
            if new.num_rows == 0:
                break
            if new.schema != acc.schema:
                new = new.cast(acc.schema)
            delta = _distinct_minus(new, seen) if distinct else new
            if delta.num_rows:
                chunks.append(delta)
        else:
            if delta.num_rows:
                raise RuntimeError(
                    f"recursive CTE {name!r} exceeded {MAX_ITER} iterations "
                    "(set QWERY_MAX_RECURSION to raise the cap)")
    finally:
        if saved is not None:
            session.views[key] = saved
        else:
            session.views.pop(key, None)
    return pa.concat_tables(chunks)
