"""Recursive-descent parser for the qwery SQL dialect.

Grammar coverage mirrors the reference's declarative statement templates
(core/SQLLanguageParser.scala:596-612 keyword dispatch; SELECT :813-821,
INSERT :742, SELECT..INTO rewrite :839-853) plus sane supersets noted in
SURVEY.md §7.1: multi-key GROUP BY, executed ORDER BY, LEFT/RIGHT/FULL joins,
IN/BETWEEN/HAVING/DISTINCT.
"""

from __future__ import annotations

from dataclasses import replace as dc_replace

from . import ast as A
from .lexer import Token, tokenize, unquote_ident, unquote_string

# common cross-dialect aggregate spellings → the engine's canonical name
_FUNC_ALIASES = {"LIST": "ARRAY_AGG", "LIST_AGG": "STRING_AGG",
                 "LISTAGG": "STRING_AGG", "GROUP_CONCAT": "STRING_AGG",
                 "STRPOS": "INSTR", "CHARINDEX": "INSTR"}

_IV_MONTH_UNITS = {"YEAR": 12, "QUARTER": 3, "MONTH": 1, "MON": 1}
_IV_SECOND_UNITS = {"WEEK": 604800.0, "DAY": 86400.0, "HOUR": 3600.0,
                    "MINUTE": 60.0, "MIN": 60.0, "SECOND": 1.0,
                    "SEC": 1.0, "MILLISECOND": 1e-3}


def parse_interval_text(s: str):
    """DuckDB-style interval STRING: '<n> <unit> [<n> <unit> …]' (e.g.
    '1 hour 30 minutes', '2 days'). Returns an IntervalLit, or None when
    the string is a bare number ('INTERVAL '1' HOUR' form — the unit
    follows as a token)."""
    toks = s.split()
    if len(toks) < 2 or len(toks) % 2:
        return None
    months, secs = 0, 0.0
    for q, u in zip(toks[::2], toks[1::2]):
        try:
            qty = float(q)
        except ValueError:
            return None
        uu = u.upper()
        if uu.endswith("S") and uu[:-1] in (_IV_MONTH_UNITS
                                            | _IV_SECOND_UNITS):
            uu = uu[:-1]
        if uu in _IV_MONTH_UNITS:
            months += int(qty * _IV_MONTH_UNITS[uu])
        elif uu in _IV_SECOND_UNITS:
            secs += qty * _IV_SECOND_UNITS[uu]
        else:
            return None
    return A.IntervalLit(months=months, seconds=secs)

_TYPE_NAMES = {
    "BOOLEAN", "BYTE", "DATE", "DOUBLE", "FLOAT", "INT", "INTEGER",
    "LONG", "SHORT", "STRING", "UUID", "DECIMAL", "TIMESTAMP",
}

_AGG_FUNCS = {"AVG", "COUNT", "MIN", "MAX", "SUM"}


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, sql: str):
        self.sql = sql
        self.tokens = tokenize(sql)
        self.i = 0

    # ------------------------------------------------------------- plumbing
    def peek(self, offset: int = 0) -> Token:
        j = min(self.i + offset, len(self.tokens) - 1)
        return self.tokens[j]

    def next(self) -> Token:
        tok = self.tokens[self.i]
        if tok.kind != "EOF":
            self.i += 1
        return tok

    def at(self, *words: str) -> bool:
        tok = self.peek()
        return tok.kind in ("IDENT", "OP") and tok.upper in words

    def accept(self, *words: str) -> bool:
        if self.at(*words):
            self.next()
            return True
        return False

    def expect(self, word: str) -> Token:
        tok = self.peek()
        if not self.at(word):
            raise ParseError(f"expected {word!r} at pos {tok.pos}, got {tok.text!r}")
        return self.next()

    def error(self, msg: str):
        tok = self.peek()
        raise ParseError(f"{msg} at pos {tok.pos} (got {tok.text!r})")

    # ----------------------------------------------------------- statements
    def parse_statements(self) -> list[A.Statement]:
        stmts = []
        while self.peek().kind != "EOF":
            while self.accept(";"):
                pass
            if self.peek().kind == "EOF":
                break
            stmts.append(self.parse_statement())
            while self.accept(";"):
                pass
        return stmts

    def parse_statement(self) -> A.Statement:
        tok = self.peek()
        word = tok.upper if tok.kind == "IDENT" else None
        if word == "WITH":
            return self.parse_with_ctes()
        if word == "SELECT":
            return self.parse_select_or_union()
        if word == "INSERT":
            return self.parse_insert()
        if word == "UPSERT":
            return self.parse_upsert()
        if word == "MERGE":
            return self.parse_merge()
        if word == "UPDATE":
            return self.parse_update()
        if word == "DELETE":
            self.next()
            self.expect("FROM")
            target = self.parse_target_name()
            where = self.parse_cond() if self.accept("WHERE") else None
            return A.Delete(target, where)
        if word == "COPY":
            return self.parse_copy()
        if word == "VALUES":
            # top-level VALUES (…), (…) — a literal-rows query
            return self.parse_values()
        if word == "DECLARE":
            return self.parse_declare()
        if word == "SET":
            return self.parse_set()
        if word == "CREATE":
            return self.parse_create()
        if word == "DROP":
            self.next()
            kind = self.next().upper
            if kind not in ("VIEW", "FUNCTION", "PROCEDURE"):
                self.error(f"cannot DROP {kind}")
            if_exists = False
            if self.accept("IF"):
                self.expect("EXISTS")
                if_exists = True
            return A.Drop(kind, self._ident_name(), if_exists)
        if word == "CALL":
            return self.parse_call()
        if word == "RETURN":
            self.next()
            if self.peek().kind == "EOF" or self.at(";", "END"):
                return A.Return(None)
            return A.Return(self.parse_expr())
        if word == "SPARK":
            # reference InsertSpark (ops/sql/InsertSpark.scala) materialized
            # via Spark; the whole rebuild IS the distributed path, so SPARK
            # INSERT is an alias for INSERT
            self.next()
            return self.parse_insert()
        if word == "NATIVE":
            self.next()
            self.expect("SQL")
            query = unquote_string(self.next().text)
            conn = None
            if self.accept("FROM"):
                conn = unquote_string(self.next().text)
            return A.NativeSQL(query, conn)
        if word == "PIVOT":
            return self.parse_pivot()
        if word == "UNPIVOT":
            return self.parse_unpivot()
        if word == "BEGIN":
            return self.parse_block()
        if word == "DESCRIBE":
            return self.parse_describe()
        if word == "EXPLAIN":
            self.next()
            analyze = bool(self.accept("ANALYZE"))
            return A.Explain(self.parse_statement(), analyze)
        if word == "SHOW":
            self.next()
            ent = self.next().upper
            return A.Show(ent)
        if word == "OPTIMIZE":
            self.next()
            target = unquote_string(self.next().text)
            parts = []
            if self.accept("PARTITION"):
                self.expect("(")
                while True:
                    parts.append(int(self.next().text))
                    if not self.accept(","):
                        break
                self.expect(")")
            return A.Optimize(target, tuple(parts))
        if word == "VACUUM":
            self.next()
            target = unquote_string(self.next().text)
            retain = None
            if self.accept("RETAIN"):
                retain = int(self.next().text)
                self.expect("VERSIONS")
            return A.Vacuum(target, retain)
        self.error("unexpected statement")

    def parse_block(self) -> A.CodeBlock:
        self.expect("BEGIN")
        stmts = []
        while not self.at("END"):
            if self.peek().kind == "EOF":
                self.error("unterminated BEGIN block")
            stmts.append(self.parse_statement())
            while self.accept(";"):
                pass
        self.expect("END")
        return A.CodeBlock(tuple(stmts))

    # ------------------------------------------------------------- SELECT
    def parse_with_ctes(self) -> A.Statement:
        """WITH name AS (query) [, ...] SELECT ... — CTEs become scoped
        session views for the duration of the statement."""
        self.expect("WITH")
        recursive = bool(self.accept("RECURSIVE"))
        ctes = []
        while True:
            name = self.next().text
            cols = None
            if self.accept("("):
                cols = [self.next().text]
                while self.accept(","):
                    cols.append(self.next().text)
                self.expect(")")
            self.expect("AS")
            self.expect("(")
            query = self.parse_with_ctes() if self.at("WITH") \
                else self.parse_select_or_union()
            self.expect(")")
            ctes.append((name, query, tuple(cols) if cols else None))
            if not self.accept(","):
                break
        body = self.parse_statement()
        return A.WithCtes(tuple(ctes), body, recursive)

    def parse_select_or_union(self) -> A.Statement:
        left = self.parse_select()
        while self.at("UNION", "EXCEPT", "INTERSECT"):
            word = self.next().upper
            if word == "UNION":
                distinct = False
                if self.accept("ALL"):
                    pass
                elif self.accept("DISTINCT"):
                    distinct = True
                by_name = False
                if self.accept("BY"):
                    self.expect("NAME")
                    by_name = True
                # NOTE: reference UNION is UNION ALL (ops/sql/Union.scala)
                left = A.Union(left, self.parse_select(),
                               distinct=distinct, by_name=by_name)
            else:
                all_ = bool(self.accept("ALL"))
                if not all_:
                    self.accept("DISTINCT")
                left = A.SetOp(word, left, self.parse_select(), all=all_)
        return self._hoist_setop_tail(left)

    @staticmethod
    def _hoist_setop_tail(stmt: A.Statement) -> A.Statement:
        """ANSI: a trailing ORDER BY / LIMIT / OFFSET after a set op binds
        to the WHOLE result, not the last branch — but the branch parser
        consumes it. Hoist it off the rightmost (unparenthesized) Select
        onto a wrapper over the set operation."""
        if not isinstance(stmt, (A.Union, A.SetOp)):
            return stmt
        rm = stmt
        while isinstance(rm.right, (A.Union, A.SetOp)):
            rm = rm.right
        tail = rm.right
        if not isinstance(tail, A.Select) or not (
                tail.order_by or tail.limit is not None
                or tail.offset is not None):
            return stmt
        order_by, limit, offset = tail.order_by, tail.limit, tail.offset
        stripped = dc_replace(tail, order_by=(), limit=None, offset=None)

        def rebuild(node):
            if node is tail:
                return stripped
            return dc_replace(node, right=rebuild(node.right))

        # positional ORDER BY k can't resolve against the wrapper's `*` —
        # translate it to the k-th output column name (set-op output names
        # come from the LEFTMOST branch)
        lm = stmt
        while isinstance(lm, (A.Union, A.SetOp)):
            lm = lm.left
        def positional(o):
            if isinstance(o.expr, A.Literal) and isinstance(o.expr.value,
                                                            int) \
                    and isinstance(lm, A.Select) \
                    and 1 <= o.expr.value <= len(lm.items):
                it = lm.items[o.expr.value - 1]
                if isinstance(it, A.SelectItem):
                    name = it.alias or (it.expr.name if isinstance(
                        it.expr, A.ColumnRef) else None)
                    if name:
                        return A.OrderItem(A.ColumnRef(name), o.ascending,
                                           o.nulls_first)
            return o
        order_by = tuple(positional(o) for o in order_by)

        return A.Select(items=(A.Star(),),
                        source=A.SubquerySource(rebuild(stmt), None),
                        order_by=order_by, limit=limit, offset=offset)

    def parse_select(self) -> A.Statement:
        self.expect("SELECT")
        if self.at("ALL") and self.peek(1).upper not in ("FROM", ",", ")"):
            self.next()  # ANSI no-op: SELECT ALL = not DISTINCT
        distinct = bool(self.accept("DISTINCT"))
        distinct_on: list[A.Expr] = []
        if distinct and self.accept("ON"):
            # DISTINCT ON (keys): first row per key under ORDER BY —
            # desugars below to QUALIFY ROW_NUMBER() OVER (...) = 1
            self.expect("(")
            distinct_on.append(self.parse_expr())
            while self.accept(","):
                distinct_on.append(self.parse_expr())
            self.expect(")")
            distinct = False
        limit = None
        if self.accept("TOP"):  # TOP n (SQLLanguageParser.scala:815)
            limit = int(self.next().text)
        items = [self.parse_select_item()]
        while self.accept(","):
            items.append(self.parse_select_item())

        source = None
        joins: list[A.JoinClause] = []
        if self.accept("FROM"):
            source = self.parse_source()
            while True:
                if self.accept(","):
                    # SQL-92 implicit cross join: FROM a, b [, c …] — the
                    # WHERE clause supplies any equi-conditions
                    joins.append(A.JoinClause("CROSS", self.parse_source(),
                                              A.Literal(True)))
                    continue
                if self.at("INNER", "LEFT", "RIGHT", "FULL", "JOIN", "CROSS",
                           "ASOF", "SEMI", "ANTI", "NATURAL"):
                    joins.append(self.parse_join())
                    continue
                break

        where = self.parse_cond() if self.accept("WHERE") else None

        group_by: list[A.Expr] = []
        grouping_sets = None
        if self.accept("GROUP"):
            self.expect("BY")
            if self.at("ROLLUP", "CUBE") or self.at("GROUPING"):
                group_by, grouping_sets = self.parse_grouping_spec()
            elif self.accept("ALL"):
                # DuckDB sugar: group by every non-aggregate SELECT item
                from .exprs import collect_agg_calls

                if any(isinstance(it, A.Star) for it in items):
                    raise ParseError("GROUP BY ALL cannot be combined "
                                     "with SELECT *")
                group_by = [it.expr for it in items
                            if not collect_agg_calls(it.expr)]
                if not group_by:
                    raise ParseError("GROUP BY ALL found no non-aggregate "
                                     "SELECT items to group by")
            else:
                group_by.append(self.parse_expr())
                while self.accept(","):
                    group_by.append(self.parse_expr())

        having = self.parse_cond() if self.accept("HAVING") else None
        qualify = self.parse_cond() if self.accept("QUALIFY") else None

        # ANSI named-window clause: WINDOW w AS (PARTITION BY … ORDER BY …
        # [frame]) [, w2 AS (…)] — `OVER w` references resolve below
        named_windows: dict[str, tuple] = {}
        if self.accept("WINDOW"):
            while True:
                wname = self._ident_name()
                self.expect("AS")
                named_windows[wname.lower()] = self._parse_window_body()
                if not self.accept(","):
                    break

        order_by: list[A.OrderItem] = []
        if self.accept("ORDER"):
            self.expect("BY")
            if self.accept("ALL"):
                # DuckDB sugar: order by every output column, left-to-right
                # (expanded to positional refs; the compiler resolves those)
                if any(isinstance(it, A.Star) for it in items):
                    raise ParseError("ORDER BY ALL cannot be combined "
                                     "with SELECT *")
                asc = True
                if self.accept("DESC"):
                    asc = False
                else:
                    self.accept("ASC")
                order_by = [A.OrderItem(A.Literal(i + 1), asc)
                            for i in range(len(items))]
            else:
                order_by.append(self.parse_order_item())
                while self.accept(","):
                    order_by.append(self.parse_order_item())

        if self.accept("LIMIT"):
            limit = int(self.next().text)
        offset = None
        if self.accept("OFFSET"):
            offset = int(self.next().text)
            if not self.accept("ROWS"):
                self.accept("ROW")
        if self.accept("FETCH"):
            # ANSI: FETCH {FIRST|NEXT} n {ROWS|ROW} ONLY
            if not self.accept("FIRST"):
                self.expect("NEXT")
            limit = int(self.next().text)
            if not self.accept("ROWS"):
                self.accept("ROW")
            self.expect("ONLY")

        if distinct_on:
            rn = A.WindowCall(
                A.FuncCall("ROW_NUMBER", ()),
                partition_by=tuple(distinct_on),
                order_by=tuple(o for o in order_by
                               if o.expr not in distinct_on))
            keep = A.Comparison("=", rn, A.Literal(1))
            qualify = keep if qualify is None else A.And(qualify, keep)

        select = A.Select(
            items=tuple(items), source=source, joins=tuple(joins), where=where,
            group_by=tuple(group_by), having=having, order_by=tuple(order_by),
            limit=limit, distinct=distinct, qualify=qualify,
            grouping_sets=grouping_sets, offset=offset,
        )
        # run even with no WINDOW clause so a dangling `OVER w` errors
        # instead of compiling as an empty window
        select = _resolve_named_windows(select, named_windows)

        # SELECT ... INTO 'target' sugar → Insert (SQLLanguageParser.scala:839-853)
        if self.accept("INTO"):
            target = self.parse_target_name()
            hints = self.parse_hints()
            return A.Insert(target=target, columns=(), source=select, hints=hints)
        return select

    def parse_grouping_spec(self):
        """GROUP BY ROLLUP(...)/CUBE(...)/GROUPING SETS(...) → (keys, sets).

        keys = distinct grouping expressions in first-appearance order;
        sets = tuple of grouping sets, each a tuple of indexes into keys.
        Supersets of the reference (no grouping sets there at all)."""
        def key_index(keys, e):
            for i, k in enumerate(keys):
                if k == e:
                    return i
            keys.append(e)
            return len(keys) - 1

        if self.accept("ROLLUP"):
            self.expect("(")
            keys = [self.parse_expr()]
            while self.accept(","):
                keys.append(self.parse_expr())
            self.expect(")")
            sets = tuple(tuple(range(k)) for k in range(len(keys), -1, -1))
            return keys, sets
        if self.accept("CUBE"):
            self.expect("(")
            keys = [self.parse_expr()]
            while self.accept(","):
                keys.append(self.parse_expr())
            self.expect(")")
            n = len(keys)
            sets = tuple(
                tuple(i for i in range(n) if mask & (1 << i))
                for mask in range((1 << n) - 1, -1, -1))
            return keys, sets
        self.expect("GROUPING")
        self.expect("SETS")
        self.expect("(")
        keys: list = []
        sets = []
        while True:
            if self.accept("("):
                idxs = []
                if not self.at(")"):
                    idxs.append(key_index(keys, self.parse_expr()))
                    while self.accept(","):
                        idxs.append(key_index(keys, self.parse_expr()))
                self.expect(")")
                sets.append(tuple(idxs))
            else:
                sets.append((key_index(keys, self.parse_expr()),))
            if not self.accept(","):
                break
        self.expect(")")
        return keys, tuple(sets)

    def _parse_star_modifiers(self) -> tuple:
        """DuckDB star modifiers: EXCLUDE (a, b) / REPLACE (expr AS c)."""
        exclude: list[str] = []
        replace: list = []
        while self.at("EXCLUDE", "REPLACE"):
            kind = self.next().upper
            self.expect("(")
            if kind == "EXCLUDE":
                exclude.append(self._ident_name())
                while self.accept(","):
                    exclude.append(self._ident_name())
            else:
                while True:
                    expr = self.parse_expr()
                    self.expect("AS")
                    replace.append((expr, self._ident_name()))
                    if not self.accept(","):
                        break
            self.expect(")")
        return tuple(exclude), tuple(replace)

    def parse_select_item(self):
        tok = self.peek()
        if tok.kind == "OP" and tok.text == "*":
            self.next()
            if self.at("EXCLUDE", "REPLACE"):
                exclude, replace = self._parse_star_modifiers()
                return A.Star(exclude=exclude, replace=replace)
            return A.Star()
        # alias.* form: the lexer folds the trailing dot into the IDENT ("c.")
        if (
            tok.kind == "IDENT" and tok.text.endswith(".")
            and self.peek(1).kind == "OP" and self.peek(1).text == "*"
        ):
            alias = self.next().text.rstrip(".")
            self.next()
            return A.Star(table_alias=alias)
        # full condition grammar in select items: SELECT a > b AS flag,
        # x BETWEEN 1 AND 2 AS inside, … (parse_predicate returns the bare
        # expression when no predicate operator follows)
        expr = self.parse_cond()
        alias = None
        if self.accept("AS"):
            alias = self._ident_name()
        elif self.peek().kind in ("IDENT", "QIDENT") and not self._is_clause_keyword(self.peek()):
            alias = self._ident_name()
        return A.SelectItem(expr, alias)

    _CLAUSE_KEYWORDS = {
        "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "TOP", "UNION",
        "INTO", "AS", "ON", "INNER", "LEFT", "RIGHT", "FULL", "JOIN", "CROSS",
        "ASOF", "SEMI", "ANTI",
        "KEYED", "WITH", "AND", "OR", "NOT", "ASC", "DESC", "END", "WHEN",
        "OVER", "PARTITION", "QUALIFY", "EXCEPT", "INTERSECT",
        "USING", "TABLESAMPLE",
        "THEN", "ELSE", "CASE", "VALUES", "SET", "BY", "SELECT", "LIKE",
        "MATCHES", "BETWEEN", "IN", "IS", "NULL", "DISTINCT", "ALL",
        "OFFSET", "ILIKE", "USING", "NATURAL", "WINDOW", "FETCH",
    }

    def _is_clause_keyword(self, tok: Token) -> bool:
        return tok.upper in self._CLAUSE_KEYWORDS

    def _ident_name(self) -> str:
        tok = self.next()
        if tok.kind == "QIDENT":
            return unquote_ident(tok.text)
        if tok.kind == "IDENT":
            return tok.text
        if tok.kind == "STR":
            return unquote_string(tok.text)
        raise ParseError(f"expected identifier at {tok.pos}, got {tok.text!r}")

    def parse_order_item(self) -> A.OrderItem:
        expr = self.parse_expr()
        asc = True
        if self.accept("DESC"):
            asc = False
        else:
            self.accept("ASC")
        nulls_first = None
        if self.accept("NULLS"):
            word = self.next().upper
            if word == "FIRST":
                nulls_first = True
            elif word == "LAST":
                nulls_first = False
            else:
                self.error("expected FIRST or LAST after NULLS")
        return A.OrderItem(expr, asc, nulls_first)

    # ------------------------------------------------------------- sources
    def parse_source(self) -> A.Source:
        src = self._parse_source_base()
        if self.accept("TABLESAMPLE"):
            return self._parse_sample_spec(src)
        if self.at("USING") and self.peek(1).upper == "SAMPLE":
            self.next()
            self.next()
            return self._parse_sample_spec(src)
        return src

    def _parse_sample_spec(self, src: A.Source) -> A.Source:
        """USING SAMPLE / TABLESAMPLE spec (DuckDB grammar): `10%`,
        `10 PERCENT`, `100 [ROWS]`, `bernoulli(10%)`, `reservoir(100)`,
        `10% (system, 7)`, trailing `REPEATABLE (seed)`."""
        method = None
        seed = 42

        def amount():
            v = float(self.next().text)
            if self.peek().kind == "OP" and self.peek().text == "%":
                self.next()
                return v, True
            if self.accept("PERCENT"):
                return v, True
            if self.accept("ROWS"):
                return v, False
            return v, None  # defaulted by context below

        if self.peek().kind in ("IDENT", "QIDENT") and \
                self.peek().upper in ("BERNOULLI", "SYSTEM", "RESERVOIR"):
            method = self.next().upper
            self.expect("(")
            value, is_percent = amount()
            self.expect(")")
        else:
            value, is_percent = amount()
            if self.peek().kind == "OP" and self.peek().text == "(":
                self.next()
                method = self.next().upper
                if self.accept(","):
                    seed = int(float(self.next().text))
                self.expect(")")
        if is_percent is None:
            # bare numbers: percent for bernoulli/system, rows otherwise
            is_percent = method in ("BERNOULLI", "SYSTEM")
        if method is None:
            method = "BERNOULLI" if is_percent else "RESERVOIR"
        if self.accept("REPEATABLE"):
            self.expect("(")
            seed = int(float(self.next().text))
            self.expect(")")
        return A.SampledSource(src, method, value, is_percent, seed)

    def _parse_source_base(self) -> A.Source:
        tok = self.peek()
        if tok.kind == "OP" and tok.text == "(":
            self.next()
            # (SHOW ...) / (DESCRIBE ...) as a source: every executable
            # yields a table (reference core/ops/Executable.scala:10-14)
            if self.peek().upper in ("SHOW", "DESCRIBE"):
                if self.peek().upper == "SHOW":
                    self.next()
                    inner_stmt: A.Statement = A.Show(self.next().upper)
                else:
                    inner_stmt = self.parse_describe()
                self.expect(")")
                alias = None
                if self.accept("AS"):
                    alias = self._ident_name()
                elif self.peek().kind in ("IDENT", "QIDENT") and \
                        not self._is_clause_keyword(self.peek()):
                    alias = self._ident_name()
                return A.ExecutableSource(inner_stmt, alias)
            if self.at("VALUES"):
                # (VALUES (…), (…)) v(a, b) — inline literal rows source
                self.next()
                rows = [self._parse_values_row()]
                while self.accept(","):
                    rows.append(self._parse_values_row())
                self.expect(")")
                alias = None
                cols: tuple = ()
                if self.accept("AS"):
                    alias = self._ident_name()
                elif self.peek().kind in ("IDENT", "QIDENT") and \
                        not self._is_clause_keyword(self.peek()):
                    alias = self._ident_name()
                if alias is not None and self.peek().kind == "OP" and \
                        self.peek().text == "(":
                    self.next()
                    names = [self._ident_name()]
                    while self.accept(","):
                        names.append(self._ident_name())
                    self.expect(")")
                    cols = tuple(names)
                return A.SubquerySource(A.Values(tuple(rows), cols), alias)
            inner = self.parse_with_ctes() if self.at("WITH") \
                else self.parse_select_or_union()
            self.expect(")")
            alias = None
            if self.accept("AS"):
                alias = self._ident_name()
            elif self.peek().kind in ("IDENT", "QIDENT") and not self._is_clause_keyword(self.peek()):
                alias = self._ident_name()
            return A.SubquerySource(inner, alias)
        if tok.kind == "STR":  # quoted path: 'companylist.csv'
            self.next()
            name = unquote_string(tok.text)
        else:
            name = self._ident_name()
        if name.upper() in ("GENERATE_SERIES", "RANGE", "UNNEST") and \
                self.peek().kind == "OP" and self.peek().text == "(":
            # table-valued function: GENERATE_SERIES(a, b[, step]) / RANGE(…)
            # / lateral UNNEST(list-expr) as a join right side
            self.next()
            args = [self.parse_expr()]
            while self.accept(","):
                args.append(self.parse_expr())
            self.expect(")")
            alias = None
            col_alias = None
            if self.accept("AS"):
                alias = self._ident_name()
            elif self.peek().kind in ("IDENT", "QIDENT") and \
                    not self._is_clause_keyword(self.peek()):
                alias = self._ident_name()
            if alias is not None and self.peek().kind == "OP" and \
                    self.peek().text == "(":
                self.next()
                col_alias = self._ident_name()
                self.expect(")")
            return A.TableFunc(name.upper(), tuple(args), alias, col_alias)
        hints = self.parse_hints()
        alias = None
        if self.accept("AS"):
            alias = self._ident_name()
        elif self.peek().kind in ("IDENT", "QIDENT") and not self._is_clause_keyword(self.peek()):
            alias = self._ident_name()
        return A.TableRef(name, alias, hints)

    def parse_hints(self) -> dict:
        """WITH <FORMAT|'key' 'value'|...> hints, loosely mirroring
        core/SQLLanguageParser.scala hint templates (WITH CSV/JSON/GZIP/
        DELIMITER/HEADERS/QUOTED ...)."""
        hints: dict = {}
        while self.at("WITH"):
            self.next()
            key = self.next().upper
            if key in ("CSV", "JSON", "PSV", "TSV", "FIXED", "AVRO", "PARQUET", "TEXT"):
                hints["format"] = key.lower()
                if key == "AVRO" and self.peek().kind == "STR":
                    hints["avro_schema"] = unquote_string(self.next().text)
            elif key == "GZIP":
                hints["gzip"] = True
            elif key == "DELIMITER":
                hints["delimiter"] = unquote_string(self.next().text)
            elif key == "QUOTED":
                sub = self.next().upper  # NUMBERS | TEXT
                hints[f"quoted_{sub.lower()}"] = True
            elif key == "COLUMN":
                self.expect("HEADERS")
                hints["headers"] = True
            elif key == "HEADERS":
                hints["headers"] = True
            elif key == "LAKE":
                hints["lake"] = True
                if self.accept("VERSION"):
                    hints["lake_version"] = int(self.next().text)
                elif self.accept("CHANGES"):
                    # WITH LAKE CHANGES VERSION a [TO b]: the change data
                    # feed between two retained snapshots (superset;
                    # Delta-style CDF)
                    self.expect("VERSION")
                    hints["lake_changes_from"] = int(self.next().text)
                    if self.accept("TO"):
                        hints["lake_changes_to"] = int(self.next().text)
            elif key == "PARTITION":
                # WITH PARTITION (col [, col]): hive-partitioned parquet
                # output — one directory level per column value
                self.expect("(")
                cols = [self._ident_name()]
                while self.accept(","):
                    cols.append(self._ident_name())
                self.expect(")")
                hints["partition_cols"] = cols
            elif key == "PROPERTIES":
                hints["properties"] = unquote_string(self.next().text)
            else:
                # generic `WITH key 'value'`
                if self.peek().kind == "STR":
                    hints[key.lower()] = unquote_string(self.next().text)
                else:
                    hints[key.lower()] = True
        return hints

    def parse_pivot(self) -> A.Statement:
        """PIVOT tbl ON col [IN (v1,…)] USING AGG(expr) [GROUP BY a, b]
        (DuckDB simplified syntax). An explicit IN list rewrites directly
        to a Select with one CASE-filtered aggregate per value (column
        order = IN order); the dynamic form returns A.Pivot and the session
        discovers the values (sorted ascending, like DuckDB)."""
        self.expect("PIVOT")
        table = self.parse_source()
        self.expect("ON")
        on = self._ident_name()
        values = None
        if self.accept("IN"):
            self.expect("(")
            values = [self.parse_expr()]
            while self.accept(","):
                values.append(self.parse_expr())
            self.expect(")")
            if not all(isinstance(v, A.Literal) for v in values):
                self.error("PIVOT IN list must be literal values")
        self.expect("USING")
        agg = self.parse_expr()
        if not isinstance(agg, A.FuncCall):
            self.error("PIVOT USING requires an aggregate call")
        group_by: list[str] = []
        if self.accept("GROUP"):
            self.expect("BY")
            group_by.append(self._ident_name())
            while self.accept(","):
                group_by.append(self._ident_name())
        if values is not None:
            return pivot_to_select(table, on, [v.value for v in values],
                                   agg, group_by)
        return A.Pivot(table, on, agg, tuple(group_by))

    def parse_unpivot(self) -> A.Unpivot:
        """UNPIVOT tbl ON c1[, c2 …] INTO NAME nc VALUE vc (DuckDB
        simplified syntax)."""
        self.expect("UNPIVOT")
        table = self.parse_source()
        self.expect("ON")
        on = [self._ident_name()]
        while self.accept(","):
            on.append(self._ident_name())
        name_col, value_col = "name", "value"
        if self.accept("INTO"):
            self.expect("NAME")
            name_col = self._ident_name()
            self.expect("VALUE")
            value_col = self._ident_name()
        return A.Unpivot(table, tuple(on), name_col, value_col)

    def parse_join(self) -> A.JoinClause:
        jt = "INNER"
        natural = bool(self.accept("NATURAL"))
        if self.accept("ASOF"):
            # DuckDB-compatible: ASOF JOIN (inner) / ASOF LEFT [OUTER] JOIN
            jt = "ASOF"
            if self.accept("LEFT"):
                self.accept("OUTER")
                jt = "ASOF_LEFT"
        elif self.accept("SEMI"):
            jt = "SEMI"
        elif self.accept("ANTI"):
            jt = "ANTI"
        elif self.accept("INNER"):
            jt = "INNER"
        elif self.accept("LEFT"):
            self.accept("OUTER")
            jt = "LEFT"
            if self.accept("SEMI"):  # Spark-style LEFT SEMI / LEFT ANTI
                jt = "SEMI"
            elif self.accept("ANTI"):
                jt = "ANTI"
        elif self.accept("RIGHT"):
            self.accept("OUTER")
            jt = "RIGHT"
        elif self.accept("FULL"):
            self.accept("OUTER")
            jt = "FULL"
        elif self.accept("CROSS"):
            jt = "CROSS"
        self.expect("JOIN")
        right = self.parse_source()
        if jt == "CROSS":
            return A.JoinClause(jt, right, A.Literal(True))
        if natural:
            # NATURAL JOIN: keys = all shared column names, resolved by
            # the compiler against the two frames' schemas
            return A.JoinClause(jt, right, A.Literal(True), natural=True)
        if self.accept("USING"):
            self.expect("(")
            cols = [self._ident_name()]
            while self.accept(","):
                cols.append(self._ident_name())
            self.expect(")")
            return A.JoinClause(jt, right, A.Literal(True),
                                using=tuple(cols))
        self.expect("ON")
        on = self.parse_cond()
        return A.JoinClause(jt, right, on)

    # ------------------------------------------------------- DML statements
    def parse_values(self) -> A.Values:
        """Top-level VALUES (…), (…) — a literal-rows query."""
        self.expect("VALUES")
        rows = [self._parse_values_row()]
        while self.accept(","):
            rows.append(self._parse_values_row())
        return A.Values(tuple(rows))

    def parse_copy(self) -> A.Insert:
        """DuckDB-style export: COPY (query)|table TO 'path'
        [(FORMAT fmt [, HEADER] [, DELIMITER 'c'])] — sugar for the
        engine's INSERT OVERWRITE '<path>' (format resolved from the
        option or the path extension by sources/writers.py)."""
        self.expect("COPY")
        if self.peek().kind == "OP" and self.peek().text == "(":
            self.next()
            src = self.parse_with_ctes() if self.at("WITH") \
                else self.parse_select_or_union()
            self.expect(")")
        else:
            name = self.parse_target_name()
            src = A.Select(items=(A.Star(),), source=A.TableRef(name))
        self.expect("TO")
        tok = self.next()
        if tok.kind != "STR":
            self.error("COPY ... TO expects a quoted path")
        path = unquote_string(tok.text)
        hints: dict = {}
        if self.peek().kind == "OP" and self.peek().text == "(":
            self.next()
            while not self.accept(")"):
                key = self.next().upper
                if key == "FORMAT":
                    hints["format"] = self.next().upper.lower()
                elif key in ("HEADER", "HEADERS"):
                    hints["headers"] = True
                    if self.peek().upper in ("TRUE", "FALSE"):
                        hints["headers"] = self.next().upper == "TRUE"
                elif key in ("DELIMITER", "DELIM", "SEP"):
                    hints["delimiter"] = unquote_string(self.next().text)
                elif key == "COMPRESSION":
                    if self.next().upper == "GZIP":
                        hints["gzip"] = True
                else:
                    self.error(f"unsupported COPY option {key}")
                self.accept(",")
        hints.update(self.parse_hints())
        return A.Insert(target=path, columns=(), source=src,
                        overwrite=True, hints=hints)

    def parse_target_name(self) -> str:
        tok = self.peek()
        if tok.kind == "STR":
            self.next()
            return unquote_string(tok.text)
        return self._ident_name()

    def parse_insert(self) -> A.Insert:
        self.expect("INSERT")
        overwrite = False
        if self.accept("OVERWRITE"):
            overwrite = True
        else:
            self.expect("INTO")
        target = self.parse_target_name()
        columns: list[str] = []
        if self.accept("("):
            columns.append(self._ident_name())
            while self.accept(","):
                columns.append(self._ident_name())
            self.expect(")")
        hints = self.parse_hints()
        source = self.parse_insert_source()
        hints.update(self.parse_hints())
        return A.Insert(target, tuple(columns), source, overwrite, hints)

    def _parse_values_row(self) -> tuple:
        self.expect("(")
        row = [self.parse_expr()]
        while self.accept(","):
            row.append(self.parse_expr())
        self.expect(")")
        return tuple(row)

    def parse_insert_source(self) -> A.Statement:
        if self.at("VALUES"):
            rows = []
            while self.accept("VALUES"):
                self.expect("(")
                row = [self.parse_expr()]
                while self.accept(","):
                    row.append(self.parse_expr())
                self.expect(")")
                rows.append(tuple(row))
                # also allow VALUES (..), (..), (..)
                while self.accept(","):
                    self.expect("(")
                    row = [self.parse_expr()]
                    while self.accept(","):
                        row.append(self.parse_expr())
                    self.expect(")")
                    rows.append(tuple(row))
            return A.Values(tuple(rows))
        return self.parse_select_or_union()

    def parse_merge(self) -> A.Merge:
        """MERGE INTO tgt [AS t] USING (query)|table [AS s] ON cond
        WHEN [NOT] MATCHED [BY SOURCE] [AND cond] THEN
        UPDATE SET a=e,... | DELETE | INSERT [(cols)] VALUES (...) | INSERT *
        """
        self.expect("MERGE")
        self.expect("INTO")
        target = self.parse_target_name()
        target_alias = None
        if self.accept("AS"):
            target_alias = self._ident_name()
        elif self.peek().kind == "IDENT" and not self.at("USING"):
            target_alias = self._ident_name()
        self.expect("USING")
        if self.at("("):
            self.expect("(")
            source = self.parse_with_ctes() if self.at("WITH") \
                else self.parse_select_or_union()
            self.expect(")")
        else:
            source = A.Select(items=(A.Star(),),
                              source=A.TableRef(self.parse_target_name()))
        source_alias = None
        if self.accept("AS"):
            source_alias = self._ident_name()
        elif self.peek().kind == "IDENT" and not self.at("ON"):
            source_alias = self._ident_name()
        self.expect("ON")
        on = self.parse_cond()

        whens: list[A.MergeWhen] = []
        while self.at("WHEN"):
            self.expect("WHEN")
            if self.accept("NOT"):
                self.expect("MATCHED")
                matched = "not_matched"
                if self.accept("BY"):
                    side = self.next().upper
                    if side == "SOURCE":
                        matched = "not_matched_by_source"
                    elif side != "TARGET":
                        self.error("expected BY SOURCE or BY TARGET")
            else:
                self.expect("MATCHED")
                matched = "matched"
            cond = self.parse_cond() if self.accept("AND") else None
            self.expect("THEN")
            if self.accept("DELETE"):
                if matched == "not_matched":
                    self.error("WHEN NOT MATCHED supports INSERT only")
                whens.append(A.MergeWhen(matched, cond, "delete"))
            elif self.accept("UPDATE"):
                if matched == "not_matched":
                    self.error("WHEN NOT MATCHED supports INSERT only")
                self.expect("SET")
                assignments = []
                while True:
                    name = self._ident_name()
                    if self.accept("."):  # strip an optional t. qualifier
                        name = self._ident_name()
                    self.expect("=")
                    assignments.append((name, self.parse_expr()))
                    if not self.accept(","):
                        break
                whens.append(A.MergeWhen(matched, cond, "update",
                                         assignments=tuple(assignments)))
            elif self.accept("INSERT"):
                if matched != "not_matched":
                    self.error("INSERT is only valid for WHEN NOT MATCHED")
                if self.at("*"):
                    self.next()
                    whens.append(A.MergeWhen(matched, cond, "insert"))
                    continue
                cols: list[str] = []
                if self.accept("("):
                    cols.append(self._ident_name())
                    while self.accept(","):
                        cols.append(self._ident_name())
                    self.expect(")")
                self.expect("VALUES")
                self.expect("(")
                vals = [self.parse_expr()]
                while self.accept(","):
                    vals.append(self.parse_expr())
                self.expect(")")
                whens.append(A.MergeWhen(
                    matched, cond, "insert", insert_columns=tuple(cols),
                    insert_values=tuple(vals)))
            else:
                self.error("expected UPDATE / DELETE / INSERT after THEN")
        if not whens:
            self.error("MERGE requires at least one WHEN clause")
        return A.Merge(target, target_alias, source, source_alias, on,
                       tuple(whens))

    def parse_upsert(self) -> A.Upsert:
        self.expect("UPSERT")
        self.expect("INTO")
        target = self.parse_target_name()
        columns: list[str] = []
        if self.accept("("):
            columns.append(self._ident_name())
            while self.accept(","):
                columns.append(self._ident_name())
            self.expect(")")
        hints = self.parse_hints()
        source = self.parse_insert_source()
        self.expect("KEYED")
        self.expect("ON")
        keys = [self._ident_name()]
        while self.accept(","):
            keys.append(self._ident_name())
        return A.Upsert(target, tuple(columns), source, tuple(keys), hints)

    def parse_update(self) -> A.Update:
        self.expect("UPDATE")
        target = self.parse_target_name()
        self.expect("SET")
        assignments = []
        name = self._ident_name()
        self.expect("=")
        assignments.append((name, self.parse_expr()))
        while self.accept(","):
            name = self._ident_name()
            self.expect("=")
            assignments.append((name, self.parse_expr()))
        if not self.at("FROM"):
            # ANSI in-place form: UPDATE t SET a = e [WHERE cond]
            where = self.parse_cond() if self.accept("WHERE") else None
            return A.Update(target, tuple(assignments), where=where)
        self.expect("FROM")
        source = self.parse_select_or_union() if self.at("SELECT") else A.Select(
            items=(A.Star(),), source=self.parse_source())
        self.expect("KEYED")
        self.expect("ON")
        keys = [self._ident_name()]
        while self.accept(","):
            keys.append(self._ident_name())
        return A.Update(target, tuple(assignments), source, tuple(keys))

    def parse_declare(self) -> A.Declare:
        self.expect("DECLARE")
        var = self.next()
        if var.kind != "VAR":
            raise ParseError(f"expected @variable at {var.pos}")
        type_name = self.next().upper
        return A.Declare(var.text.lstrip("@"), type_name)

    def parse_set(self) -> A.SetVar:
        self.expect("SET")
        var = self.next()
        if var.kind != "VAR":
            raise ParseError(f"expected @variable at {var.pos}")
        self.expect("=")
        if self.peek().kind == "OP" and self.peek().text == "(" and self.peek(1).upper == "SELECT":
            self.next()
            query = self.parse_select_or_union()
            self.expect(")")
            return A.SetVar(var.text.lstrip("@"), query)
        return A.SetVar(var.text.lstrip("@"), self.parse_expr())

    def parse_create(self) -> A.Statement:
        self.expect("CREATE")
        replace = bool(self.accept("OR") and self.expect("REPLACE"))
        kind = self.next().upper
        name = self._ident_name()
        if kind == "VIEW":
            self.expect("AS")
            return A.CreateView(name, self.parse_select_or_union())
        if kind == "TABLE":
            # CTAS sugar: CREATE [OR REPLACE] TABLE t AS q → materialize q
            # as <root>/t.parquet (bare-name resolution finds it); plain
            # CREATE errors if the table exists, OR REPLACE overwrites
            self.expect("AS")
            query = self.parse_select_or_union()
            hints = {"create_table": True, "or_replace": replace}
            return A.Insert(name, (), query, overwrite=replace, hints=hints)
        params: list[str] = []
        if self.accept("("):
            if not self.at(")"):
                params.append(self._ident_name())
                while self.accept(","):
                    params.append(self._ident_name())
            self.expect(")")
        self.expect("AS")
        if self.at("BEGIN"):
            body = self.parse_block().statements
        else:
            body = (self.parse_statement(),)
        if kind == "FUNCTION":
            return A.CreateFunction(name, tuple(params), body)
        if kind == "PROCEDURE":
            return A.CreateProcedure(name, tuple(params), body)
        self.error(f"unsupported CREATE {kind}")

    def parse_call(self) -> A.Call:
        self.expect("CALL")
        name = self._ident_name()
        args: list[A.Expr] = []
        if self.accept("("):
            if not self.at(")"):
                args.append(self.parse_expr())
                while self.accept(","):
                    args.append(self.parse_expr())
            self.expect(")")
        return A.Call(name, tuple(args))

    def parse_describe(self) -> A.Describe:
        self.expect("DESCRIBE")
        if self.peek().kind == "OP" and self.peek().text == "(":
            self.next()
            src = self.parse_select_or_union()
            self.expect(")")
            src = A.SubquerySource(src, None)
        else:
            src = self.parse_source()
        limit = None
        if self.accept("LIMIT"):
            limit = int(self.next().text)
        return A.Describe(src, limit)

    # ---------------------------------------------------------- conditions
    def parse_cond(self) -> A.Cond:
        return self.parse_or()

    def parse_or(self) -> A.Cond:
        left = self.parse_and()
        while self.accept("OR"):
            left = A.Or(left, self.parse_and())
        return left

    def parse_and(self) -> A.Cond:
        left = self.parse_not()
        while self.accept("AND"):
            left = A.And(left, self.parse_not())
        return left

    def parse_not(self) -> A.Cond:
        if self.accept("NOT"):
            inner = self.parse_not()
            if isinstance(inner, A.Exists):  # normalize NOT EXISTS
                return A.Exists(inner.query, not inner.negated)
            return A.Not(inner)
        return self.parse_predicate()

    def parse_predicate(self) -> A.Cond:
        if self.at("EXISTS"):
            save = self.i
            self.next()
            if self.peek().kind == "OP" and self.peek().text == "(":
                self.next()
                sub = self.parse_select_or_union()
                self.expect(")")
                return A.Exists(sub, False)
            self.i = save  # EXISTS used as a plain identifier
        if self.peek().kind == "OP" and self.peek().text == "(":
            # could be parenthesized condition; try it
            save = self.i
            try:
                self.next()
                cond = self.parse_cond()
                self.expect(")")
                if self._cond_follows():
                    return cond
                # it was a parenthesized expression in a comparison
                self.i = save
            except ParseError:
                self.i = save
        left = self.parse_expr()
        return self._predicate_tail(left)

    def _cond_follows(self) -> bool:
        tok = self.peek()
        return tok.kind == "EOF" or self.at(
            "AND", "OR", ")", ";", "THEN", "GROUP", "ORDER", "LIMIT", "HAVING",
        )

    def _like_escape(self):
        """Optional LIKE … ESCAPE '<char>' clause."""
        if self.accept("ESCAPE"):
            tok = self.next()
            esc = unquote_string(tok.text) if tok.kind == "STR" else tok.text
            if len(esc) != 1:
                self.error("ESCAPE must be a single character")
            return esc
        return None

    def _predicate_tail(self, left: A.Expr) -> A.Cond:
        negated = bool(self.accept("NOT"))
        if self.accept("LIKE"):
            return A.Like(left, self.parse_expr(), negated,
                          escape=self._like_escape())
        if self.accept("ILIKE"):
            return A.Like(left, self.parse_expr(), negated,
                          case_insensitive=True, escape=self._like_escape())
        if self.accept("SIMILAR"):
            # ANSI SIMILAR TO: regex match anchored to the WHOLE string
            self.expect("TO")
            m = A.Matches(left, self.parse_expr(), anchored=True)
            return A.Not(m) if negated else m
        if self.accept("MATCHES"):
            m = A.Matches(left, self.parse_expr())
            return A.Not(m) if negated else m
        if self.accept("BETWEEN"):
            symmetric = bool(self.accept("SYMMETRIC"))
            low = self.parse_add()
            self.expect("AND")
            high = self.parse_add()
            if symmetric:
                # ANSI BETWEEN SYMMETRIC: bounds in either order
                both = A.Or(A.Between(left, low, high, False),
                            A.Between(left, high, low, False))
                return A.Not(both) if negated else both
            return A.Between(left, low, high, negated)
        if self.accept("IN"):
            self.expect("(")
            if self.at("SELECT"):
                # IN (SELECT …) → semi/anti join via broadcast key set
                sub = self.parse_select_or_union()
                self.expect(")")
                return A.InSubquery(left, sub, negated)
            vals = [self.parse_expr()]
            while self.accept(","):
                vals.append(self.parse_expr())
            self.expect(")")
            return A.InList(left, tuple(vals), negated)
        if self.accept("IS"):
            neg = bool(self.accept("NOT"))
            if self.accept("DISTINCT"):
                # null-safe inequality: IS DISTINCT FROM / IS NOT DISTINCT
                # FROM (ANSI; NULLs compare equal to each other)
                self.expect("FROM")
                right = self.parse_expr()
                return A.IsDistinctFrom(left, right, distinct=not neg)
            self.expect("NULL")
            return A.IsNull(left, neg)
        if negated:
            self.error("expected LIKE/MATCHES/BETWEEN/IN after NOT")
        tok = self.peek()
        if tok.kind == "OP" and tok.text in ("=", "!=", "<>", ">", ">=", "<", "<="):
            self.next()
            op = "=" if tok.text == "=" else ("!=" if tok.text in ("!=", "<>") else tok.text)
            if self.at("ANY", "SOME", "ALL"):
                quant = self.next().upper
                quant = "ANY" if quant == "SOME" else quant
                self.expect("(")
                sub = self.parse_select_or_union()
                self.expect(")")
                return A.QuantifiedComparison(op, left, sub, quant)
            right = self.parse_expr()
            return A.Comparison(op, left, right)
        # no predicate operator follows: return the bare expression — when it
        # is used as a condition, eval_mask casts it to boolean
        return left

    # --------------------------------------------------------- expressions
    def parse_expr(self) -> A.Expr:
        return self.parse_add()

    def parse_add(self) -> A.Expr:
        left = self.parse_mul()
        while True:
            tok = self.peek()
            if tok.kind == "OP" and tok.text in ("+", "-", "||"):
                self.next()
                left = A.BinaryOp(tok.text, left, self.parse_mul())
            else:
                return left

    def parse_mul(self) -> A.Expr:
        left = self.parse_pow()
        while True:
            tok = self.peek()
            if tok.kind == "OP" and tok.text in ("*", "/", "%"):
                self.next()
                left = A.BinaryOp(tok.text, left, self.parse_pow())
            else:
                return left

    def parse_pow(self) -> A.Expr:
        left = self.parse_unary()
        tok = self.peek()
        if tok.kind == "OP" and tok.text == "**":
            self.next()
            return A.BinaryOp("**", left, self.parse_pow())  # right-assoc
        return left

    def parse_unary(self) -> A.Expr:
        tok = self.peek()
        if tok.kind == "OP" and tok.text in ("-", "+"):
            self.next()
            return A.UnaryOp(tok.text, self.parse_unary())
        expr = self.parse_primary()
        # postfix: l[2] → LIST_EXTRACT (1-based, DuckDB); s[a:b] slices
        # (1-based inclusive, negative = from end); x::TYPE casts
        while True:
            tok = self.peek()
            if tok.kind == "OP" and tok.text == "[":
                self.next()
                lo = None
                if not (self.peek().kind == "OP"
                        and self.peek().text == ":"):
                    lo = self.parse_expr()
                if self.peek().kind == "OP" and self.peek().text == ":":
                    self.next()
                    hi = None
                    if not (self.peek().kind == "OP"
                            and self.peek().text == "]"):
                        hi = self.parse_expr()
                    self.expect("]")
                    expr = A.FuncCall("ARRAY_SLICE", (
                        expr,
                        lo if lo is not None else A.Literal(1),
                        hi if hi is not None else A.Literal(-1)))
                else:
                    self.expect("]")
                    expr = A.FuncCall("LIST_EXTRACT", (expr, lo))
            elif tok.kind == "OP" and tok.text in ("->", "->>"):
                # JSON extraction operators (DuckDB/Postgres): -> returns
                # JSON text, ->> returns the unquoted string value
                self.next()
                rhs = self.parse_primary()
                fn = "JSON_EXTRACT" if tok.text == "->" \
                    else "JSON_EXTRACT_STRING"
                expr = A.FuncCall(fn, (expr, rhs))
            elif tok.kind == "OP" and tok.text == "::":
                self.next()
                type_name = self.next().upper
                if self.accept("("):  # DECIMAL(p,s) — ignore precision
                    while not self.accept(")"):
                        self.next()
                expr = A.Cast(expr, type_name)
            else:
                return expr

    def parse_primary(self) -> A.Expr:
        tok = self.peek()
        if tok.kind == "NUM":
            self.next()
            text = tok.text
            if "." in text or "e" in text or "E" in text:
                return A.Literal(float(text))
            return A.Literal(int(text))
        if tok.kind == "STR":
            self.next()
            return A.Literal(unquote_string(tok.text))
        if tok.kind == "VAR":
            self.next()
            return A.VarRef(tok.text.lstrip("@"))
        if tok.kind == "QIDENT":
            self.next()
            return A.ColumnRef(unquote_ident(tok.text))
        if tok.kind == "OP" and tok.text == "[":
            # list literal [a, b, …] → LIST_VALUE(a, b, …)
            self.next()
            args: list[A.Expr] = []
            if not (self.peek().kind == "OP" and self.peek().text == "]"):
                args.append(self.parse_expr())
                while self.accept(","):
                    args.append(self.parse_expr())
            self.expect("]")
            return A.FuncCall("LIST_VALUE", tuple(args))
        if tok.kind == "OP" and tok.text == "(":
            self.next()
            if self.at("SELECT"):  # scalar subquery
                q = self.parse_select_or_union()
                self.expect(")")
                return _ScalarSubquery(q)
            expr = self.parse_cond()
            self.expect(")")
            return expr
        if tok.kind == "IDENT":
            word = tok.upper
            if word == "CASE":
                return self.parse_case()
            if word in ("CAST", "TRY_CAST"):
                # the engine's CAST is already lenient (invalid → NULL,
                # reference Cast.scala:25) — TRY_CAST is a DuckDB-parity
                # alias of the same node
                self.next()
                self.expect("(")
                operand = self.parse_expr()
                self.expect("AS")
                type_name = self.next().upper
                if self.accept("("):  # DECIMAL(p,s) — ignore precision
                    while not self.accept(")"):
                        self.next()
                self.expect(")")
                return A.Cast(operand, type_name)
            if word in ("CURRENT_DATE", "CURRENT_TIMESTAMP"):
                # niladic ANSI datetime keywords (optional empty parens);
                # NOW() is session/driver-stamped → deterministic
                self.next()
                if self.peek().kind == "OP" and self.peek().text == "(":
                    self.next()
                    self.expect(")")
                now = A.FuncCall("NOW", ())
                return A.Cast(now, "DATE") if word == "CURRENT_DATE" else now
            if word == "IF" and self.peek(1).kind == "OP" \
                    and self.peek(1).text == "(":
                # IF(cond, a, b) — the condition needs the boolean grammar
                self.next()
                self.expect("(")
                cond = self.parse_cond()
                self.expect(",")
                a = self.parse_expr()
                self.expect(",")
                b = self.parse_expr()
                self.expect(")")
                return A.CaseWhen(((cond, a),), b)
            if word == "INTERVAL" and self.peek(1).kind in ("NUM", "STR"):
                self.next()
                t2 = self.next()
                if t2.kind == "STR":
                    s = unquote_string(t2.text)
                    iv = parse_interval_text(s)
                    if iv is not None:
                        # DuckDB-style INTERVAL '1 hour 30 minutes' — the
                        # quantity+unit(s) live inside the string
                        return iv
                    qty = float(s)
                else:
                    qty = float(t2.text)
                unit = self.next().upper.rstrip("S")
                months = {"YEAR": 12, "QUARTER": 3, "MONTH": 1}.get(unit)
                if months is not None:
                    return A.IntervalLit(months=int(qty * months))
                secs = {"WEEK": 604800.0, "DAY": 86400.0, "HOUR": 3600.0,
                        "MINUTE": 60.0, "SECOND": 1.0,
                        "MILLISECOND": 1e-3}.get(unit)
                if secs is None:
                    self.error(f"unsupported INTERVAL unit {unit}")
                return A.IntervalLit(seconds=qty * secs)
            if word in ("DATE", "TIMESTAMP") and self.peek(1).kind == "STR":
                import datetime as _dt

                self.next()
                s = unquote_string(self.next().text)
                if word == "DATE":
                    d = _dt.date.fromisoformat(s)
                    return A.Literal(_dt.datetime(d.year, d.month, d.day))
                return A.Literal(_dt.datetime.fromisoformat(s))
            if word == "NULL":
                self.next()
                return A.Literal(None)
            if word == "TRUE":
                self.next()
                return A.Literal(True)
            if word == "FALSE":
                self.next()
                return A.Literal(False)
            if word == "NOT":
                self.next()
                return A.Not(self.parse_predicate())
            # function call?
            if self.peek(1).kind == "OP" and self.peek(1).text == "(":
                name = self.next().text
                self.expect("(")
                if name.upper() == "EXTRACT":
                    # EXTRACT(part FROM expr) → part(expr)
                    part = self.next().upper
                    self.expect("FROM")
                    inner = self.parse_expr()
                    self.expect(")")
                    return A.FuncCall(part, (inner,))
                if name.upper() == "POSITION":
                    # ANSI POSITION(needle IN haystack) → INSTR
                    needle = self.parse_expr()
                    self.expect("IN")
                    hay = self.parse_expr()
                    self.expect(")")
                    return A.FuncCall("INSTR", (hay, needle))
                if name.upper() == "TRIM" and \
                        self.at("BOTH", "LEADING", "TRAILING"):
                    # ANSI TRIM([BOTH|LEADING|TRAILING] [chars] FROM s)
                    side = self.next().upper
                    chars = None if self.at("FROM") else self.parse_expr()
                    self.expect("FROM")
                    s = self.parse_expr()
                    self.expect(")")
                    fn = {"BOTH": "TRIM", "LEADING": "LTRIM",
                          "TRAILING": "RTRIM"}[side]
                    args = (s,) if chars is None else (s, chars)
                    return A.FuncCall(fn, args)
                if self.accept(")"):
                    call = A.FuncCall(name.upper(), ())
                    if self.at("OVER"):
                        return self._parse_over(call)
                    return self._maybe_filter(call)
                if self.peek().kind == "OP" and self.peek().text == "*":
                    self.next()
                    self.expect(")")
                    call = A.FuncCall(name.upper(), (), is_star=True)
                    if self.at("FILTER"):
                        call = self._maybe_filter(call)
                    if self.at("OVER"):
                        return self._parse_over(call)
                    return call
                distinct = bool(self.accept("DISTINCT"))
                # full condition grammar in args: BOOL_AND(x > 2),
                # COUNT(a IS NULL OR b < 0), … — parse_predicate returns the
                # bare expression when no predicate operator follows
                args = [self.parse_cond()]
                while self.accept(","):
                    args.append(self.parse_cond())
                ignore_nulls = False
                if self.accept("IGNORE"):  # fn(x IGNORE NULLS), DuckDB form
                    self.expect("NULLS")
                    ignore_nulls = True
                agg_order: list[A.OrderItem] = []
                if self.accept("ORDER"):  # STRING_AGG(x, sep ORDER BY y)
                    self.expect("BY")
                    agg_order.append(self.parse_order_item())
                    while self.accept(","):
                        agg_order.append(self.parse_order_item())
                self.expect(")")
                call = A.FuncCall(_FUNC_ALIASES.get(name.upper(),
                                                    name.upper()),
                                  tuple(args),
                                  distinct=distinct,
                                  ignore_nulls=ignore_nulls,
                                  order_by=tuple(agg_order))
                if self.at("WITHIN"):
                    call = self._parse_within_group(call)
                if self.at("FILTER"):
                    call = self._maybe_filter(call)
                if self.at("OVER"):
                    return self._parse_over(call)
                return call
            # column ref (possibly alias.col via dotted IDENT)
            self.next()
            if "." in tok.text:
                alias, _, col = tok.text.partition(".")
                return A.ColumnRef(col, table_alias=alias)
            # `alias`.`col` or ident.`col`
            if self.peek().kind == "OP" and self.peek().text == "." and self.peek(1).kind == "QIDENT":
                self.next()
                col = unquote_ident(self.next().text)
                return A.ColumnRef(col, table_alias=tok.text)
            return A.ColumnRef(tok.text)
        self.error("unexpected token in expression")

    def _maybe_filter(self, call: A.FuncCall) -> A.FuncCall:
        """AGG(x) FILTER (WHERE c) → AGG(CASE WHEN c THEN x END); COUNT(*)
        FILTER → COUNT(CASE WHEN c THEN 1 END) (empty cells count 0)."""
        if not (self.at("FILTER") and self.peek(1).kind == "OP"
                and self.peek(1).text == "("):
            return call
        self.next()
        self.expect("(")
        self.accept("WHERE")  # DuckDB also allows FILTER (cond)
        cond = self.parse_cond()
        self.expect(")")
        inner = A.Literal(1) if call.is_star or not call.args \
            else call.args[0]
        case = A.CaseWhen(((cond, inner),))
        return A.FuncCall("COUNT" if call.is_star else call.name,
                          (case,) + tuple(call.args[1:]),
                          distinct=call.distinct)

    def _parse_over(self, call: A.FuncCall) -> A.WindowCall:
        self.expect("OVER")
        if not (self.peek().kind == "OP" and self.peek().text == "("):
            # named window: `fn() OVER w` — resolved against the WINDOW
            # clause at the end of parse_select
            return A.WindowCall(call, named=self._ident_name())
        pb, ob, frame, kind, excl = self._parse_window_body()
        return A.WindowCall(call, pb, ob, frame, kind, exclude=excl)

    def _parse_window_body(self):
        self.expect("(")
        partition_by: list[A.Expr] = []
        order_by: list[A.OrderItem] = []
        if self.accept("PARTITION"):
            self.expect("BY")
            partition_by.append(self.parse_expr())
            while self.accept(","):
                partition_by.append(self.parse_expr())
        if self.accept("ORDER"):
            self.expect("BY")
            order_by.append(self.parse_order_item())
            while self.accept(","):
                order_by.append(self.parse_order_item())
        frame: tuple = ()
        frame_kind = "ROWS"
        exclude = "NO OTHERS"
        if self.at("ROWS") or self.at("RANGE") or self.at("GROUPS"):
            kind = self.next().upper
            if self.accept("BETWEEN"):
                lo = self._parse_frame_bound(low=True)
                self.expect("AND")
                hi = self._parse_frame_bound(low=False)
            else:
                # ANSI single-bound shorthand: `ROWS n PRECEDING` ≡
                # BETWEEN n PRECEDING AND CURRENT ROW
                lo = self._parse_frame_bound(low=True)
                hi = 0
            if kind == "RANGE" and lo is None and hi == 0:
                pass  # the ANSI default frame — () keeps peer semantics
            else:
                frame = (lo, hi)
                frame_kind = kind
            if self.accept("EXCLUDE"):
                # ANSI frame exclusion (requires an explicit frame)
                if self.accept("NO"):
                    self.expect("OTHERS")
                elif self.accept("CURRENT"):
                    self.expect("ROW")
                    exclude = "CURRENT ROW"
                elif self.accept("GROUP"):
                    exclude = "GROUP"
                else:
                    self.expect("TIES")
                    exclude = "TIES"
        self.expect(")")
        return (tuple(partition_by), tuple(order_by), frame, frame_kind,
                exclude)

    def _parse_within_group(self, call: A.FuncCall) -> A.FuncCall:
        """ANSI ordered-set syntax: PERCENTILE_CONT(p) WITHIN GROUP
        (ORDER BY x [ASC|DESC]) — rewritten to the engine's two-argument
        form fn(x, p); STRING_AGG/ARRAY_AGG take it as their agg ORDER BY.
        DESC inverts the fraction for CONT (value-continuous symmetry);
        DISC's rank semantics are not symmetric, so DESC raises there."""
        self.expect("WITHIN")
        self.expect("GROUP")
        self.expect("(")
        self.expect("ORDER")
        self.expect("BY")
        target = self.parse_expr()
        desc = False
        if self.accept("DESC"):
            desc = True
        else:
            self.accept("ASC")
        self.expect(")")
        name = call.name
        if name in ("PERCENTILE_CONT", "PERCENTILE_DISC",
                    "QUANTILE_CONT", "QUANTILE_DISC", "MEDIAN"):
            p = call.args[0] if call.args else A.Literal(0.5)
            if desc:
                if name.endswith("DISC"):
                    raise ParseError(
                        f"{name} WITHIN GROUP (… DESC) is not supported "
                        "(discrete rank is not symmetric)")
                if not isinstance(p, A.Literal):
                    raise ParseError(
                        "WITHIN GROUP … DESC needs a literal fraction")
                p = A.Literal(1.0 - float(p.value))
            args = (target,) if name == "MEDIAN" else (target, p)
            return A.FuncCall(name, args, distinct=call.distinct)
        if name in ("STRING_AGG", "ARRAY_AGG"):
            return A.FuncCall(name, call.args, distinct=call.distinct,
                              order_by=(A.OrderItem(target, not desc),))
        raise ParseError(f"{name} does not take WITHIN GROUP")

    def _parse_frame_bound(self, low: bool):
        if self.accept("UNBOUNDED"):
            word = self.next().upper
            if word not in ("PRECEDING", "FOLLOWING"):
                raise ParseError(f"expected PRECEDING/FOLLOWING, got {word}")
            return None
        if self.accept("CURRENT"):
            self.expect("ROW")
            return 0
        if self.accept("INTERVAL"):
            # time offset for RANGE frames over timestamp ORDER BY keys;
            # normalized to SECONDS (the compiler scales to the key's
            # physical resolution)
            tok = self.next()
            n = None
            if tok.kind == "STR":
                iv = parse_interval_text(unquote_string(tok.text))
                if iv is not None:
                    if iv.months:
                        raise ParseError(
                            "RANGE frame INTERVAL must be a fixed-width "
                            "unit (not months/years)")
                    n = iv.seconds
            if n is None:
                qty = float(unquote_string(tok.text)) if tok.kind == "STR" \
                    else float(tok.text)
                unit = self.next().upper.rstrip("S")
                mult = {"SECOND": 1.0, "MINUTE": 60.0, "HOUR": 3600.0,
                        "DAY": 86400.0}.get(unit)
                if mult is None:
                    raise ParseError(f"unsupported INTERVAL unit {unit}")
                n = qty * mult
            word = self.next().upper
            if word == "PRECEDING":
                return -n
            if word == "FOLLOWING":
                return n
            raise ParseError(f"expected PRECEDING/FOLLOWING, got {word}")
        text = self.next().text
        n = float(text) if "." in text else int(text)  # RANGE allows values
        word = self.next().upper
        if word == "PRECEDING":
            return -n
        if word == "FOLLOWING":
            return n
        raise ParseError(f"expected PRECEDING/FOLLOWING, got {word}")

    def parse_case(self) -> A.CaseWhen:
        self.expect("CASE")
        subject = None
        if not self.at("WHEN"):
            subject = self.parse_expr()
        branches = []
        while self.accept("WHEN"):
            if subject is not None:
                # simple CASE desugars to EQ (reference ExpressionParser.scala:246-282)
                val = self.parse_expr()
                cond: A.Cond = A.Comparison("=", subject, val)
            else:
                cond = self.parse_cond()
            self.expect("THEN")
            # THEN/ELSE results may be boolean-valued (comparisons, AND/OR,
            # nested predicates — `THEN c_acctbal > 0`): parse at condition
            # level; parse_predicate falls through to the bare scalar when
            # no predicate operator follows, so plain expressions still
            # parse exactly as before
            branches.append((cond, self.parse_cond()))
        else_expr = None
        if self.accept("ELSE"):
            else_expr = self.parse_cond()
        self.expect("END")
        return A.CaseWhen(tuple(branches), else_expr)


class _ScalarSubquery(A.Expr):
    """Scalar subquery — first column of first row (Executable.scala:27-32)."""

    def __init__(self, query):
        self.query = query


def pivot_to_select(table: A.Source, on: str, values, agg: A.FuncCall,
                    group_by) -> A.Select:
    """The PIVOT rewrite: one CASE-filtered aggregate column per pivot value
    (DuckDB semantics — COUNT(*) pivots count matching rows, so empty cells
    are 0 for COUNT and NULL for other aggregates)."""
    items = [A.SelectItem(A.ColumnRef(g), None) for g in group_by]
    for v in values:
        cond = A.Comparison("=", A.ColumnRef(on), A.Literal(v))
        inner = A.Literal(1) if agg.is_star or not agg.args else agg.args[0]
        case = A.CaseWhen(branches=((cond, inner),))
        call = A.FuncCall("COUNT" if agg.is_star else agg.name, (case,),
                          distinct=agg.distinct)
        items.append(A.SelectItem(call, str(v)))
    return A.Select(items=tuple(items), source=table,
                    group_by=tuple(A.ColumnRef(g) for g in group_by))


def _resolve_named_windows(select: "A.Select", windows: dict):
    """Substitute `OVER w` references with the WINDOW clause's spec.
    Scope is the single SELECT: recursion stops at nested query nodes
    (subqueries define their own WINDOW clauses)."""
    import dataclasses

    def rewrite(node):
        if isinstance(node, (A.Select, A.Union, A.SetOp, A.WithCtes)) \
                and node is not select:
            return node  # window-name scope boundary
        if isinstance(node, A.WindowCall) and node.named is not None:
            spec = windows.get(node.named.lower())
            if spec is None:
                raise ParseError(f"unknown window name {node.named!r}")
            pb, ob, frame, kind, excl = spec
            node = A.WindowCall(node.func, pb, ob, frame, kind, exclude=excl)
        def rew_any(v):
            if isinstance(v, tuple):
                return tuple(rew_any(x) for x in v)
            if dataclasses.is_dataclass(v) and not isinstance(v, type):
                return rewrite(v)
            return v

        if dataclasses.is_dataclass(node) and not isinstance(node, type):
            changes = {}
            for f in dataclasses.fields(node):
                v = getattr(node, f.name)
                nv = rew_any(v)
                if nv != v:
                    changes[f.name] = nv
            if changes:
                node = dataclasses.replace(node, **changes)
        return node

    return rewrite(select)


def parse(sql: str) -> list[A.Statement]:
    return Parser(sql).parse_statements()


def parse_one(sql: str) -> A.Statement:
    stmts = parse(sql)
    if len(stmts) != 1:
        raise ParseError(f"expected one statement, got {len(stmts)}")
    return stmts[0]
