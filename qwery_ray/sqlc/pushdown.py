"""Read-time optimizations: column pruning + parquet filter pushdown.

Converts WHERE conjuncts over base-table columns into pyarrow dataset
expressions so row groups are skipped at the scan (the reference reads every
byte of every file; at 100 TB the scan is the dominant cost, so pruning at
the read is the single biggest lever)."""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from . import ast as A
from .exprs import collect_column_refs


def _lit_ok(value, col_type: pa.DataType) -> bool:
    """Only push comparisons whose literal type matches the column's type
    class — the engine's lenient cross-type compares stay in the engine."""
    if value is None:
        return False
    if isinstance(value, bool):
        return pa.types.is_boolean(col_type)
    if isinstance(value, (int, float)):
        return pa.types.is_integer(col_type) or pa.types.is_floating(col_type)
    if isinstance(value, str):
        return pa.types.is_string(col_type) or pa.types.is_large_string(col_type)
    return False


def to_dataset_expression(cond, schema: dict[str, pa.DataType],
                          alias: Optional[str] = None,
                          require_alias: bool = False):
    """Cond → pyarrow dataset expression, or None if not safely pushable.

    ``alias`` is the scanned table's alias: a qualified ref (``x.col``)
    converts only when its qualifier IS that alias — a ref qualified to a
    DIFFERENT table must never filter this scan even if the bare name
    exists here too (same-named columns on both sides of a join).
    ``require_alias=True`` (join right sides) additionally rejects
    unqualified refs, whose post-join resolution favors the left side."""
    if isinstance(cond, A.And):
        left = to_dataset_expression(cond.left, schema, alias, require_alias)
        right = to_dataset_expression(cond.right, schema, alias, require_alias)
        if left is not None and right is not None:
            return left & right
        return left if right is None else right  # partial AND is still sound
    if isinstance(cond, A.Or):
        left = to_dataset_expression(cond.left, schema, alias, require_alias)
        right = to_dataset_expression(cond.right, schema, alias, require_alias)
        if left is None or right is None:
            return None  # partial OR would over-filter — not sound
        return left | right
    if isinstance(cond, A.Comparison):
        col, lit = _col_lit(cond.left, cond.right, schema, alias,
                            require_alias)
        if col is None:
            return None
        name, value, flipped = col, lit[0], lit[1]
        op = cond.op
        if flipped:
            op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}.get(op, op)
        f = pc.field(name)
        return {"=": f == value, "!=": f != value, ">": f > value,
                ">=": f >= value, "<": f < value, "<=": f <= value}[op]
    if isinstance(cond, A.IsNull):
        if isinstance(cond.operand, A.ColumnRef):
            name = _ref_name(cond.operand, schema, alias, require_alias)
            if name:
                f = pc.field(name)
                return f.is_valid() if cond.negated else ~f.is_valid()
        return None
    if isinstance(cond, A.InList):
        if isinstance(cond.operand, A.ColumnRef):
            name = _ref_name(cond.operand, schema, alias, require_alias)
            vals = [v.value for v in cond.values if isinstance(v, A.Literal)]
            # a NULL in the list needs three-valued IN (x NOT IN (..., NULL)
            # is never TRUE) — leave it to the exact batch evaluator
            if name and len(vals) == len(cond.values) and \
                    all(v is not None for v in vals) and \
                    all(_lit_ok(v, schema[name.lower()]) for v in vals):
                expr = pc.field(name).isin(vals)
                return ~expr if cond.negated else expr
        return None
    if isinstance(cond, A.Between):
        if isinstance(cond.operand, A.ColumnRef) and not cond.negated and \
                isinstance(cond.low, A.Literal) and isinstance(cond.high, A.Literal):
            name = _ref_name(cond.operand, schema, alias, require_alias)
            if name and _lit_ok(cond.low.value, schema[name.lower()]) \
                    and _lit_ok(cond.high.value, schema[name.lower()]):
                f = pc.field(name)
                return (f >= cond.low.value) & (f <= cond.high.value)
        return None
    return None


def _ref_name(ref: A.ColumnRef, schema: dict[str, pa.DataType],
              alias: Optional[str], require_alias: bool) -> Optional[str]:
    """The scan column a ref may filter, or None (wrong alias / unknown)."""
    if ref.table_alias is not None:
        if alias is None or ref.table_alias.lower() != alias:
            return None
    elif require_alias:
        return None
    return ref.name if ref.name.lower() in schema else None


def _col_lit(left, right, schema, alias=None, require_alias=False):
    """(col_name, (literal, flipped)) for ColumnRef⋈Literal comparisons."""
    if isinstance(left, A.ColumnRef) and isinstance(right, A.Literal):
        name = _ref_name(left, schema, alias, require_alias)
        if name and _lit_ok(right.value, schema[name.lower()]):
            return name, (right.value, False)
    if isinstance(right, A.ColumnRef) and isinstance(left, A.Literal):
        name = _ref_name(right, schema, alias, require_alias)
        if name and _lit_ok(left.value, schema[name.lower()]):
            return name, (left.value, True)
    return None, None


def referenced_columns(sel: A.Select) -> Optional[set]:
    """All column names (lower) a SELECT references, or None if it needs every
    column (SELECT *)."""
    if any(isinstance(it, A.Star) for it in sel.items):
        return None
    out: set = set()
    for it in sel.items:
        collect_column_refs(it.expr, out)
    for clause in (sel.where, sel.having, sel.qualify):
        if clause is not None:
            collect_column_refs(clause, out)
    for g in sel.group_by:
        collect_column_refs(g, out)
    for ob in sel.order_by:
        collect_column_refs(ob.expr, out)
    for j in sel.joins:
        collect_column_refs(j.on, out)
        if isinstance(j.right, A.TableFunc):
            # lateral UNNEST(t.col): the argument reads the LEFT frame
            for a in j.right.args:
                collect_column_refs(a, out)
    return out
