"""Decompiler round-trip: parse → to_sql → parse must be a fixed point
(reference: QweryDecompilerTest.scala golden round-trips)."""

import pytest

from qwery_ray.sqlc.decompiler import to_sql
from qwery_ray.sqlc.parser import parse_one

STATEMENTS = [
    "SELECT 1 + 2 AS total",
    "SELECT * FROM lineitem",
    "SELECT Symbol, Name FROM 'companylist.csv' WHERE Sector = 'Finance'",
    "SELECT TOP 5 * FROM orders ORDER BY o_totalprice DESC",
    "SELECT a, COUNT(*) AS n FROM t GROUP BY a HAVING COUNT(*) > 3",
    "SELECT CASE WHEN x > 1 THEN 'hi' ELSE 'lo' END AS c FROM t",
    "SELECT CAST(x AS DOUBLE) AS d FROM t WHERE y IS NOT NULL",
    "SELECT x FROM t WHERE a LIKE 'A%' AND b MATCHES '\\d+'",
    "SELECT x FROM t WHERE a IN (1, 2, 3) OR b BETWEEN 0 AND 9",
    "SELECT x FROM t WHERE EXISTS (SELECT 1 FROM u WHERE u.k = t.k)",
    "SELECT x FROM t WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.k = t.k)",
    "SELECT c.name, o.total FROM orders o INNER JOIN customer c ON o.cid = c.id",
    "SELECT l.k FROM a l LEFT JOIN b r ON l.k = r.k",
    "SELECT x FROM a UNION ALL SELECT y FROM b",
    "SELECT DISTINCT sector FROM companies",
    "INSERT INTO 'out.csv' (a, b) SELECT a, b FROM t",
    "INSERT OVERWRITE target (a) VALUES (1) VALUES (2)",
    "UPSERT INTO lake (k, v) SELECT k, v FROM src KEYED ON k",
    "UPDATE tgt SET v = (v * 2) FROM SELECT * FROM src KEYED ON k",
    "DECLARE @x DOUBLE",
    "SET @x = 5",
    "SET @x = (SELECT MAX(v) AS m FROM t)",
    "CREATE VIEW v AS SELECT * FROM t WHERE x > 1",
    "CREATE FUNCTION f(a, b) AS RETURN (a + b)",
    "CREATE PROCEDURE p(x) AS BEGIN SELECT * FROM t END",
    "CALL p(1, 'two')",
    "DESCRIBE orders LIMIT 3",
    "SHOW VIEWS",
    "SELECT `ADR TSO`, `Summary Quote` FROM 'companylist.csv'",
]


@pytest.mark.parametrize("sql", STATEMENTS)
def test_round_trip(sql):
    ast1 = parse_one(sql)
    rendered = to_sql(ast1)
    ast2 = parse_one(rendered)
    assert to_sql(ast2) == rendered  # fixed point
    assert type(ast1) is type(ast2)


WINDOW_STATEMENTS = [
    "SELECT a, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC) AS rn FROM t",
    "SELECT a FROM t QUALIFY RANK() OVER (ORDER BY v) <= 3",
    "SELECT x FROM t WHERE k IN (SELECT k FROM dims WHERE region = 2)",
    "NATIVE SQL 'SELECT 1' FROM 'duckdb:mem.db'",
    "SELECT a FROM t EXCEPT SELECT b FROM u",
    "SELECT a FROM t INTERSECT SELECT b FROM u",
    "SELECT n FROM (SELECT a AS n FROM t UNION ALL SELECT b AS n FROM u)",
]


@pytest.mark.parametrize("sql", WINDOW_STATEMENTS)
def test_round_trip_extended(sql):
    ast1 = parse_one(sql)
    rendered = to_sql(ast1)
    ast2 = parse_one(rendered)
    assert to_sql(ast2) == rendered


def test_round_trip_all_gate_queries():
    """Every engine-side gate query in __ray_entry__ parses, decompiles,
    and re-parses to a rendering fixed point — the decompiler keeps pace
    with whatever SQL surface the correctness gate exercises."""
    import __ray_entry__ as em

    for name, (sql, _oracle) in em._SQL_QUERIES.items():
        ast1 = parse_one(sql)
        rendered = to_sql(ast1)
        ast2 = parse_one(rendered)
        assert to_sql(ast2) == rendered, name


class TestDecompilerFuzz:
    """Hypothesis round-trip: random Select ASTs → SQL → parse → SQL must
    reach a fixpoint (and the reparse must round-trip to an identical AST).
    Exercises string-literal escaping, operator rendering, NULLS FIRST/LAST,
    IN/BETWEEN/IS NULL nesting and LIMIT/OFFSET combinations."""

    def test_random_selects_fixpoint(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from qwery_ray.sqlc import ast as A
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse

        cols = st.sampled_from(["a", "b", "c", "total", "x1"])
        col = st.builds(A.ColumnRef, cols)
        # non-negative ints only: the parser canonicalizes "-1" to
        # UnaryOp('-', Literal(1)), never Literal(-1)
        lit = st.one_of(
            st.integers(0, 1000).map(A.Literal),
            st.text(alphabet="ab'c%_\\ ", max_size=6).map(A.Literal),
            st.just(A.Literal(None)),
        )
        expr = st.one_of(col, lit)
        # parser-canonical ops only: '<>' normalizes to '!=' at parse, so a
        # hand-built '<>' AST is not a fixpoint (and never occurs in practice)
        cmp_ = st.builds(A.Comparison,
                         st.sampled_from(["=", "!=", ">", ">=", "<", "<="]),
                         col, expr)
        isnull = st.builds(A.IsNull, col, st.booleans())
        inlist = st.builds(
            A.InList, col,
            st.tuples(st.integers(0, 9).map(A.Literal),
                      st.integers(0, 9).map(A.Literal)),
            st.booleans())
        between = st.builds(A.Between, col,
                            st.integers(0, 5).map(A.Literal),
                            st.integers(6, 9).map(A.Literal))
        atom = st.one_of(cmp_, isnull, inlist, between)
        cond = st.recursive(
            atom,
            lambda inner: st.one_of(
                st.builds(A.And, inner, inner),
                st.builds(A.Or, inner, inner),
                st.builds(A.Not, inner)),
            max_leaves=6)
        order = st.builds(A.OrderItem, col, st.booleans(),
                          st.sampled_from([None, True, False]))
        items = st.one_of(
            st.just((A.Star(),)),
            st.lists(st.builds(A.SelectItem, col,
                               st.sampled_from([None, "out1", "out2"])),
                     min_size=1, max_size=3, unique_by=lambda s:
                     (s.expr.name, s.alias)).map(tuple))
        sel = st.builds(
            A.Select,
            items=items,
            source=st.just(A.TableRef("t")),
            where=st.one_of(st.none(), cond),
            order_by=st.lists(order, max_size=2).map(tuple),
            limit=st.sampled_from([None, 5, 100]),
            offset=st.sampled_from([None, 3]),
            distinct=st.booleans(),
        )

        @settings(max_examples=150, deadline=None)
        @given(sel)
        def check(ast):
            sql1 = to_sql(ast)
            ast2 = parse(sql1)[0]
            sql2 = to_sql(ast2)
            assert sql1 == sql2
            assert parse(sql2)[0] == ast2

        check()
