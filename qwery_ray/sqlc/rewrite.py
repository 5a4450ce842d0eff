"""Generic AST transforms: bottom-up expression rewriting.

Used for (a) inlining SQL UDFs (CREATE FUNCTION bodies substitute their
parameters — the vectorized analogue of the reference's child-scope call,
core/ops/Function.scala:9-26), (b) replacing aggregate calls with references
to their computed columns, (c) resolving scalar subqueries to literals.
"""

from __future__ import annotations

from dataclasses import fields, is_dataclass
from typing import Callable

from . import ast as A


def transform_expr(expr, fn: Callable):
    """Bottom-up: rebuild the node with transformed children, then apply fn."""
    if expr is None:
        return None
    if isinstance(expr, A.Expr) and is_dataclass(expr):
        kwargs = {}
        changed = False
        for f in fields(expr):
            val = getattr(expr, f.name)
            new = _transform_field(val, fn)
            kwargs[f.name] = new
            if new is not val:
                changed = True
        node = type(expr)(**kwargs) if changed else expr
        return fn(node)
    if isinstance(expr, A.Expr):  # non-dataclass Expr (e.g. _ScalarSubquery)
        return fn(expr)
    return expr


def _transform_field(val, fn):
    if isinstance(val, A.Expr):
        return transform_expr(val, fn)
    if isinstance(val, A.OrderItem):
        # OrderItem is not an Expr but carries one (WindowCall.order_by)
        new = transform_expr(val.expr, fn)
        return A.OrderItem(new, val.ascending, val.nulls_first) \
            if new is not val.expr else val
    if isinstance(val, tuple):
        new = tuple(_transform_field(v, fn) for v in val)
        return new if any(a is not b for a, b in zip(new, val)) else val
    return val


def substitute_columns(expr, mapping: dict):
    """Replace ColumnRef nodes whose lower-cased name is in mapping."""

    def repl(node):
        if isinstance(node, A.ColumnRef) and node.table_alias is None:
            return mapping.get(node.name.lower(), node)
        return node

    return transform_expr(expr, repl)


def substitute_nodes(expr, mapping: dict):
    """Replace whole sub-expressions by structural equality."""

    def repl(node):
        try:
            return mapping.get(node, node)
        except TypeError:  # unhashable literal
            return node

    return transform_expr(expr, repl)
