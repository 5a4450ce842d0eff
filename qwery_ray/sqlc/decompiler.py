"""AST → SQL string decompiler.

Parity with the reference's QweryDecompiler (core/QweryDecompiler.scala,
tested by coretest/QweryDecompilerTest.scala golden round-trips): every
statement the parser produces can be rendered back to SQL that re-parses to
an equivalent AST (round-trip property tested in tests/test_decompiler.py).
"""

from __future__ import annotations

from . import ast as A


def _ident(name: str) -> str:
    if name and name.replace("_", "a").isalnum() and not name[0].isdigit() \
            and "." not in name and " " not in name:
        return name
    return f"`{name}`"


def _string(value: str) -> str:
    # inverse of lexer.unquote_string, in reverse order: backslashes are
    # escape characters inside STR tokens, so they double FIRST (a bare
    # backslash before the doubled quote would re-escape it)
    return "'" + value.replace("\\", "\\\\").replace("'", "''") + "'"


def expr_sql(e) -> str:
    if isinstance(e, A.Literal):
        v = e.value
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return _string(v)
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            if v.time() == _dt.time(0):
                return f"DATE '{v.date().isoformat()}'"
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        return repr(v)
    if isinstance(e, A.IntervalLit):
        if e.months and e.seconds:
            # mixed calendar+fixed parts only exist via the string form
            return (f"INTERVAL '{e.months} months "
                    f"{e.seconds:g} seconds'")
        if e.months:
            if e.months % 12 == 0:
                return f"INTERVAL {e.months // 12} YEAR"
            return f"INTERVAL {e.months} MONTH"
        s = e.seconds
        for unit, div in (("DAY", 86400), ("HOUR", 3600), ("MINUTE", 60)):
            if s and s % div == 0:
                return f"INTERVAL {int(s // div)} {unit}"
        return f"INTERVAL {s:g} SECOND"
    if isinstance(e, A.ColumnRef):
        if e.table_alias:
            return f"{e.table_alias}.{_ident(e.name)}"
        return _ident(e.name)
    if isinstance(e, A.VarRef):
        return f"@{e.name}"
    if isinstance(e, A.BinaryOp):
        return f"({expr_sql(e.left)} {e.op} {expr_sql(e.right)})"
    if isinstance(e, A.UnaryOp):
        return f"({e.op}{expr_sql(e.operand)})"
    if isinstance(e, A.FuncCall):
        if e.is_star:
            return f"{e.name}(*)"
        inner = ", ".join(expr_sql(a) for a in e.args)
        if e.distinct:
            inner = "DISTINCT " + inner
        if e.ignore_nulls:
            inner += " IGNORE NULLS"
        if e.order_by:
            inner += " ORDER BY " + ", ".join(
                expr_sql(o.expr) + ("" if o.ascending else " DESC")
                for o in e.order_by)
        return f"{e.name}({inner})"
    if isinstance(e, A.WindowCall):
        inner = expr_sql(e.func) + " OVER ("
        parts = []
        if e.partition_by:
            parts.append("PARTITION BY " + ", ".join(expr_sql(p)
                                                     for p in e.partition_by))
        if e.order_by:
            parts.append("ORDER BY " + ", ".join(
                expr_sql(o.expr) + ("" if o.ascending else " DESC")
                for o in e.order_by))
        if e.frame:
            def bound(v, low):
                if v is None:
                    return "UNBOUNDED PRECEDING" if low \
                        else "UNBOUNDED FOLLOWING"
                if v == 0:
                    return "CURRENT ROW"
                return f"{-v} PRECEDING" if v < 0 else f"{v} FOLLOWING"

            kind = getattr(e, "frame_kind", "ROWS") or "ROWS"
            parts.append(f"{kind} BETWEEN {bound(e.frame[0], True)} "
                         f"AND {bound(e.frame[1], False)}")
        return inner + " ".join(parts) + ")"
    if isinstance(e, A.InSubquery):
        op = "NOT IN" if e.negated else "IN"
        return f"{expr_sql(e.operand)} {op} ({to_sql(e.query)})"
    if isinstance(e, A.QuantifiedComparison):
        op = "<>" if e.op == "!=" else e.op
        return (f"{expr_sql(e.left)} {op} {e.quant} "
                f"({to_sql(e.query)})")
    if isinstance(e, A.Exists):
        kw = "NOT EXISTS" if e.negated else "EXISTS"
        return f"{kw} ({to_sql(e.query)})"
    if type(e).__name__ == "_ScalarSubquery":  # parser-internal Expr node
        return f"({to_sql(e.query)})"
    if isinstance(e, A.CaseWhen):
        parts = ["CASE"]
        for cond, val in e.branches:
            parts.append(f"WHEN {expr_sql(cond)} THEN {expr_sql(val)}")
        if e.else_expr is not None:
            parts.append(f"ELSE {expr_sql(e.else_expr)}")
        parts.append("END")
        return " ".join(parts)
    if isinstance(e, A.Cast):
        return f"CAST({expr_sql(e.operand)} AS {e.type_name})"
    if isinstance(e, A.Comparison):
        return f"{expr_sql(e.left)} {e.op} {expr_sql(e.right)}"
    if isinstance(e, A.Like):
        kw = "ILIKE" if e.case_insensitive else "LIKE"
        op = f"NOT {kw}" if e.negated else kw
        esc = getattr(e, "escape", None)
        tail = f" ESCAPE '{esc}'" if esc else ""
        return f"{expr_sql(e.operand)} {op} {expr_sql(e.pattern)}{tail}"
    if isinstance(e, A.Matches):
        if getattr(e, "anchored", False):
            return f"{expr_sql(e.operand)} SIMILAR TO {expr_sql(e.pattern)}"
        return f"{expr_sql(e.operand)} MATCHES {expr_sql(e.pattern)}"
    if isinstance(e, A.IsNull):
        return f"{expr_sql(e.operand)} IS {'NOT ' if e.negated else ''}NULL"
    if isinstance(e, A.IsDistinctFrom):
        op = "IS DISTINCT FROM" if e.distinct else "IS NOT DISTINCT FROM"
        return f"{expr_sql(e.left)} {op} {expr_sql(e.right)}"
    if isinstance(e, A.InList):
        vals = ", ".join(expr_sql(v) for v in e.values)
        op = "NOT IN" if e.negated else "IN"
        return f"{expr_sql(e.operand)} {op} ({vals})"
    if isinstance(e, A.Between):
        op = "NOT BETWEEN" if e.negated else "BETWEEN"
        return (f"{expr_sql(e.operand)} {op} {expr_sql(e.low)} "
                f"AND {expr_sql(e.high)}")
    if isinstance(e, A.And):
        return f"({expr_sql(e.left)} AND {expr_sql(e.right)})"
    if isinstance(e, A.Or):
        return f"({expr_sql(e.left)} OR {expr_sql(e.right)})"
    if isinstance(e, A.Not):
        return f"NOT ({expr_sql(e.operand)})"
    raise ValueError(f"cannot decompile {type(e).__name__}")


def _source_sql(src) -> str:
    if isinstance(src, A.TableRef):
        name = src.name if src.name.isidentifier() else _string(src.name)
        out = name
        if src.alias:
            out += f" AS {src.alias}"
        return out
    if isinstance(src, A.SubquerySource):
        out = f"({to_sql(src.query)})"
        if src.alias:
            out += f" AS {src.alias}"
        return out
    if isinstance(src, (A.Select, A.Union, A.SetOp)):
        return f"({to_sql(src)})"
    if isinstance(src, A.ExecutableSource):
        out = f"({to_sql(src.stmt)})"
        if src.alias:
            out += f" AS {src.alias}"
        return out
    if isinstance(src, A.SampledSource):
        amt = f"{src.value:g}" + ("%" if src.is_percent else " ROWS")
        return (f"{_source_sql(src.inner)} USING SAMPLE {amt} "
                f"({src.method}, {src.seed})")
    if isinstance(src, A.TableFunc):
        args = ", ".join(expr_sql(a) for a in src.args)
        out = f"{src.name}({args})"
        if src.alias:
            out += f" AS {src.alias}"
            if src.col_alias:
                out += f"({src.col_alias})"
        elif src.col_alias:
            out += f" AS _tf({src.col_alias})"
        return out
    raise ValueError(f"cannot decompile source {type(src).__name__}")


def to_sql(stmt) -> str:
    if isinstance(stmt, A.Pivot):
        gb = f" GROUP BY {', '.join(_ident(g) for g in stmt.group_by)}" \
            if stmt.group_by else ""
        return (f"PIVOT {_source_sql(stmt.table)} ON {_ident(stmt.on)} "
                f"USING {expr_sql(stmt.agg)}{gb}")
    if isinstance(stmt, A.Unpivot):
        return (f"UNPIVOT {_source_sql(stmt.table)} ON "
                f"{', '.join(_ident(c) for c in stmt.on)} INTO NAME "
                f"{_ident(stmt.name_col)} VALUE {_ident(stmt.value_col)}")
    if isinstance(stmt, A.Delete):
        w = f" WHERE {expr_sql(stmt.where)}" if stmt.where is not None else ""
        target = stmt.target if stmt.target.isidentifier() \
            else _string(stmt.target)
        return f"DELETE FROM {target}{w}"
    if isinstance(stmt, A.WithCtes):
        parts = ", ".join(
            f"{name}{'(' + ', '.join(cols) + ')' if cols else ''} "
            f"AS ({to_sql(q)})"
            for name, q, cols in stmt.ctes)
        rec = "RECURSIVE " if stmt.recursive else ""
        return f"WITH {rec}{parts} {to_sql(stmt.body)}"
    if isinstance(stmt, A.Select):
        parts = ["SELECT"]
        if stmt.distinct:
            parts.append("DISTINCT")
        items = []
        for it in stmt.items:
            if isinstance(it, A.Star):
                s = f"{it.table_alias}.*" if it.table_alias else "*"
                if it.exclude:
                    s += f" EXCLUDE ({', '.join(_ident(c) for c in it.exclude)})"
                if it.replace:
                    s += " REPLACE (" + ", ".join(
                        f"{expr_sql(ex)} AS {_ident(n)}"
                        for ex, n in it.replace) + ")"
                items.append(s)
            else:
                s = expr_sql(it.expr)
                if it.alias:
                    s += f" AS {_ident(it.alias)}"
                items.append(s)
        parts.append(", ".join(items))
        if stmt.source is not None:
            parts.append("FROM " + _source_sql(stmt.source))
        for j in stmt.joins:
            if j.join_type == "CROSS":
                parts.append("CROSS JOIN " + _source_sql(j.right))
            else:
                jt = {"ASOF_LEFT": "ASOF LEFT"}.get(j.join_type, j.join_type)
                if getattr(j, "natural", False):
                    parts.append(f"NATURAL {jt} JOIN "
                                 f"{_source_sql(j.right)}")
                elif getattr(j, "using", ()):
                    parts.append(f"{jt} JOIN {_source_sql(j.right)} "
                                 f"USING ({', '.join(j.using)})")
                else:
                    parts.append(f"{jt} JOIN {_source_sql(j.right)} "
                                 f"ON {expr_sql(j.on)}")
        if stmt.where is not None:
            parts.append("WHERE " + expr_sql(stmt.where))
        if stmt.group_by and stmt.grouping_sets is not None:
            sets_sql = ", ".join(
                "(" + ", ".join(expr_sql(stmt.group_by[i]) for i in gs) + ")"
                for gs in stmt.grouping_sets)
            parts.append(f"GROUP BY GROUPING SETS ({sets_sql})")
        elif stmt.group_by:
            parts.append("GROUP BY " + ", ".join(expr_sql(g)
                                                 for g in stmt.group_by))
        if stmt.having is not None:
            parts.append("HAVING " + expr_sql(stmt.having))
        if stmt.qualify is not None:
            parts.append("QUALIFY " + expr_sql(stmt.qualify))
        if stmt.order_by:
            obs = ", ".join(
                expr_sql(o.expr) + ("" if o.ascending else " DESC")
                + ("" if o.nulls_first is None else
                   (" NULLS FIRST" if o.nulls_first else " NULLS LAST"))
                for o in stmt.order_by)
            parts.append("ORDER BY " + obs)
        if stmt.limit is not None:
            parts.append(f"LIMIT {stmt.limit}")
        if stmt.offset is not None:
            parts.append(f"OFFSET {stmt.offset}")
        return " ".join(parts)
    if isinstance(stmt, A.Union):
        op = "UNION DISTINCT" if stmt.distinct else "UNION ALL"
        if stmt.by_name:
            op += " BY NAME"
        return f"{to_sql(stmt.left)} {op} {to_sql(stmt.right)}"
    if isinstance(stmt, A.SetOp):
        op = f"{stmt.op} ALL" if stmt.all else stmt.op
        return f"{to_sql(stmt.left)} {op} {to_sql(stmt.right)}"
    if isinstance(stmt, A.Insert):
        verb = "INSERT OVERWRITE" if stmt.overwrite else "INSERT INTO"
        cols = f" ({', '.join(_ident(c) for c in stmt.columns)})" \
            if stmt.columns else ""
        target = stmt.target if stmt.target.isidentifier() \
            else _string(stmt.target)
        return f"{verb} {target}{cols} {to_sql(stmt.source)}"
    if isinstance(stmt, A.Values):
        rows = " ".join(
            "VALUES (" + ", ".join(expr_sql(v) for v in row) + ")"
            for row in stmt.rows)
        return rows
    if isinstance(stmt, A.Upsert):
        cols = f" ({', '.join(_ident(c) for c in stmt.columns)})" \
            if stmt.columns else ""
        target = stmt.target if stmt.target.isidentifier() \
            else _string(stmt.target)
        keys = ", ".join(_ident(k) for k in stmt.keyed_on)
        return (f"UPSERT INTO {target}{cols} {to_sql(stmt.source)} "
                f"KEYED ON {keys}")
    if isinstance(stmt, A.Merge):
        target = stmt.target if stmt.target.isidentifier() \
            else _string(stmt.target)
        parts = [f"MERGE INTO {target}"]
        if stmt.target_alias:
            parts.append(f"AS {_ident(stmt.target_alias)}")
        parts.append(f"USING ({to_sql(stmt.source)})")
        if stmt.source_alias:
            parts.append(f"AS {_ident(stmt.source_alias)}")
        parts.append(f"ON {expr_sql(stmt.on)}")
        for w in stmt.whens:
            head = {"matched": "WHEN MATCHED",
                    "not_matched": "WHEN NOT MATCHED",
                    "not_matched_by_source":
                        "WHEN NOT MATCHED BY SOURCE"}[w.matched]
            if w.condition is not None:
                head += f" AND {expr_sql(w.condition)}"
            if w.action == "delete":
                parts.append(f"{head} THEN DELETE")
            elif w.action == "update":
                sets = ", ".join(f"{_ident(n)} = {expr_sql(e)}"
                                 for n, e in w.assignments)
                parts.append(f"{head} THEN UPDATE SET {sets}")
            elif w.insert_values is None:
                parts.append(f"{head} THEN INSERT *")
            else:
                cols = f" ({', '.join(_ident(c) for c in w.insert_columns)})" \
                    if w.insert_columns else ""
                vals = ", ".join(expr_sql(e) for e in w.insert_values)
                parts.append(f"{head} THEN INSERT{cols} VALUES ({vals})")
        return " ".join(parts)
    if isinstance(stmt, A.Update):
        sets = ", ".join(f"{_ident(n)} = {expr_sql(e)}"
                         for n, e in stmt.assignments)
        target = stmt.target if stmt.target.isidentifier() \
            else _string(stmt.target)
        keys = ", ".join(_ident(k) for k in stmt.keyed_on)
        return (f"UPDATE {target} SET {sets} FROM {to_sql(stmt.source)} "
                f"KEYED ON {keys}")
    if isinstance(stmt, A.Declare):
        return f"DECLARE @{stmt.name} {stmt.type_name}"
    if isinstance(stmt, A.SetVar):
        if isinstance(stmt.value, A.Expr):
            return f"SET @{stmt.name} = {expr_sql(stmt.value)}"
        return f"SET @{stmt.name} = ({to_sql(stmt.value)})"
    if isinstance(stmt, A.CreateView):
        return f"CREATE VIEW {_ident(stmt.name)} AS {to_sql(stmt.query)}"
    if isinstance(stmt, A.CreateFunction):
        params = ", ".join(stmt.params)
        body = "; ".join(to_sql(s) for s in stmt.body)
        if len(stmt.body) > 1:
            body = f"BEGIN {body} END"
        return f"CREATE FUNCTION {_ident(stmt.name)}({params}) AS {body}"
    if isinstance(stmt, A.CreateProcedure):
        params = ", ".join(stmt.params)
        body = "; ".join(to_sql(s) for s in stmt.body)
        return f"CREATE PROCEDURE {_ident(stmt.name)}({params}) AS BEGIN {body} END"
    if isinstance(stmt, A.Call):
        args = ", ".join(expr_sql(a) for a in stmt.args)
        return f"CALL {_ident(stmt.name)}({args})"
    if isinstance(stmt, A.Return):
        return "RETURN" if stmt.value is None else f"RETURN {expr_sql(stmt.value)}"
    if isinstance(stmt, A.CodeBlock):
        return "BEGIN " + "; ".join(to_sql(s) for s in stmt.statements) + " END"
    if isinstance(stmt, A.Describe):
        out = f"DESCRIBE {_source_sql(stmt.source)}"
        if stmt.limit is not None:
            out += f" LIMIT {stmt.limit}"
        return out
    if isinstance(stmt, A.Show):
        return f"SHOW {stmt.entity}"
    if isinstance(stmt, A.Drop):
        ie = "IF EXISTS " if stmt.if_exists else ""
        return f"DROP {stmt.kind} {ie}{_ident(stmt.name)}"
    if isinstance(stmt, A.Explain):
        kw = "EXPLAIN ANALYZE" if stmt.analyze else "EXPLAIN"
        return f"{kw} {to_sql(stmt.query)}"
    if isinstance(stmt, A.NativeSQL):
        out = f"NATIVE SQL {_string(stmt.query)}"
        if stmt.connection:
            out += f" FROM {_string(stmt.connection)}"
        return out
    if isinstance(stmt, A.Optimize):
        out = f"OPTIMIZE {_string(stmt.target)}"
        if stmt.partitions:
            out += f" PARTITION ({', '.join(map(str, stmt.partitions))})"
        return out
    if isinstance(stmt, A.Vacuum):
        out = f"VACUUM {_string(stmt.target)}"
        if stmt.retain is not None:
            out += f" RETAIN {stmt.retain} VERSIONS"
        return out
    raise ValueError(f"cannot decompile {type(stmt).__name__}")
