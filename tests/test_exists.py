"""[NOT] EXISTS subqueries — decorrelated to semi/anti joins (correlated
equality) or a single limit(1) probe (uncorrelated); verified against
DuckDB on the same parquet. Reference has no subqueries at all (SURVEY
§2.5) — this is part of the superset surface alongside IN (SELECT) and
correlated scalar subqueries."""

import pandas as pd


def _run(eng, duck, sql):
    mine = eng.sql(sql)
    mine = mine.to_pandas() if not isinstance(mine, pd.DataFrame) else mine
    oracle = duck.execute(sql).fetch_df()
    return mine, oracle


class TestExists:
    def test_correlated_exists_semi(self, engine, duck):
        sql = ("SELECT c_custkey, c_name FROM customer c WHERE EXISTS "
               "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
               "AND o.o_totalprice > 100000) ORDER BY c_custkey")
        mine, oracle = _run(engine, duck, sql)
        assert mine["c_custkey"].tolist() == oracle["c_custkey"].tolist()
        assert len(mine) > 0

    def test_correlated_not_exists_anti(self, engine, duck):
        sql = ("SELECT c_custkey FROM customer c WHERE NOT EXISTS "
               "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
               "AND o.o_totalprice > 400000) ORDER BY c_custkey")
        mine, oracle = _run(engine, duck, sql)
        assert mine["c_custkey"].tolist() == oracle["c_custkey"].tolist()
        assert len(mine) > 0  # non-empty guards the schema-compare path

    def test_exists_with_other_predicates(self, engine, duck):
        sql = ("SELECT s_suppkey FROM supplier s WHERE s_acctbal > 0 AND "
               "EXISTS (SELECT 1 FROM nation n WHERE "
               "n.n_nationkey = s.s_nationkey AND n.n_regionkey = 2) "
               "ORDER BY s_suppkey")
        mine, oracle = _run(engine, duck, sql)
        assert mine["s_suppkey"].tolist() == oracle["s_suppkey"].tolist()

    def test_uncorrelated_exists_true(self, engine, duck):
        sql = ("SELECT COUNT(*) AS n FROM customer WHERE EXISTS "
               "(SELECT 1 FROM nation WHERE n_regionkey = 0)")
        mine, oracle = _run(engine, duck, sql)
        assert mine["n"].tolist() == oracle["n"].tolist()

    def test_uncorrelated_exists_false_empty(self, engine, duck):
        sql = ("SELECT COUNT(*) AS n FROM customer WHERE EXISTS "
               "(SELECT 1 FROM nation WHERE n_nationkey < 0)")
        mine, oracle = _run(engine, duck, sql)
        assert mine["n"].tolist() == oracle["n"].tolist() == [0]

    def test_uncorrelated_not_exists_keeps_all(self, engine, duck):
        sql = ("SELECT COUNT(*) AS n FROM customer WHERE NOT EXISTS "
               "(SELECT 1 FROM nation WHERE n_nationkey < 0)")
        mine, oracle = _run(engine, duck, sql)
        assert mine["n"].tolist() == oracle["n"].tolist()
        assert mine["n"].iloc[0] > 0

    def test_exists_self_join_aliases(self, engine, duck):
        # same table inner and outer: alias binding must disambiguate
        sql = ("SELECT o1.o_orderkey FROM orders o1 WHERE EXISTS "
               "(SELECT 1 FROM orders o2 WHERE o2.o_custkey = o1.o_custkey "
               "AND o2.o_totalprice > 200000) ORDER BY o1.o_orderkey")
        mine, oracle = _run(engine, duck, sql)
        assert mine["o_orderkey"].tolist() == oracle["o_orderkey"].tolist()

    def test_decompiler_round_trip(self):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse_one

        sql = ("SELECT c_custkey FROM customer c WHERE NOT EXISTS "
               "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)")
        stmt = parse_one(sql)
        text = to_sql(stmt)
        assert "NOT EXISTS (" in text
        # re-parse of the decompiled text yields the same AST
        assert parse_one(text) == stmt


class TestExistsResidual:
    """EXISTS with NON-EQUI correlated conjuncts (TPC-H Q21 shape): the
    residual cannot become a join key — it is applied per candidate pair
    before the semi/anti decision."""

    def test_exists_nonequi_residual(self, engine, duck):
        # another lineitem of the SAME order from a DIFFERENT supplier
        sql = ("SELECT l1.l_orderkey, l1.l_linenumber FROM lineitem l1 "
               "WHERE l1.l_orderkey < 300 AND EXISTS "
               "(SELECT 1 FROM lineitem l2 WHERE "
               "l2.l_orderkey = l1.l_orderkey AND "
               "l2.l_suppkey != l1.l_suppkey) "
               "ORDER BY l1.l_orderkey, l1.l_linenumber")
        mine, oracle = _run(engine, duck, sql)
        assert mine["l_orderkey"].tolist() == oracle["l_orderkey"].tolist()
        assert mine["l_linenumber"].tolist() == oracle["l_linenumber"].tolist()
        assert len(mine) > 0

    def test_not_exists_nonequi_residual(self, engine, duck):
        sql = ("SELECT l1.l_orderkey, l1.l_linenumber FROM lineitem l1 "
               "WHERE l1.l_orderkey < 300 AND NOT EXISTS "
               "(SELECT 1 FROM lineitem l2 WHERE "
               "l2.l_orderkey = l1.l_orderkey AND "
               "l2.l_quantity > l1.l_quantity) "
               "ORDER BY l1.l_orderkey, l1.l_linenumber")
        mine, oracle = _run(engine, duck, sql)
        assert mine["l_linenumber"].tolist() == oracle["l_linenumber"].tolist()
        assert len(mine) > 0

    def test_exists_outer_only_predicate_hoists(self, engine, duck):
        # conjunct referencing ONLY outer columns is constant per outer
        # row — must behave like a hoisted AND
        sql = ("SELECT c_custkey FROM customer c WHERE EXISTS "
               "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
               "AND c.c_acctbal > 5000) ORDER BY c_custkey")
        mine, oracle = _run(engine, duck, sql)
        assert mine["c_custkey"].tolist() == oracle["c_custkey"].tolist()

    def test_exists_pure_nonequi_cartesian(self, engine, duck):
        # no equality correlation at all: candidate set is the whole
        # (broadcast-sized) subquery per outer row
        sql = ("SELECT n_nationkey FROM nation n WHERE EXISTS "
               "(SELECT 1 FROM region r WHERE r.r_regionkey > n.n_nationkey) "
               "ORDER BY n_nationkey")
        mine, oracle = _run(engine, duck, sql)
        assert mine["n_nationkey"].tolist() == oracle["n_nationkey"].tolist()


class TestEmptyResultSchema:
    def test_filtered_to_empty_keeps_columns(self, engine):
        df = engine.sql("SELECT c_custkey, c_name FROM customer "
                        "WHERE c_acctbal > 1e18").to_pandas()
        assert len(df) == 0
        assert list(df.columns) == ["c_custkey", "c_name"]

    def test_empty_aggregate_keeps_columns(self, engine):
        df = engine.sql(
            "SELECT c_mktsegment, COUNT(*) AS n FROM customer "
            "WHERE c_acctbal > 1e18 GROUP BY c_mktsegment").to_pandas()
        assert len(df) == 0
        assert sorted(df.columns) == ["c_mktsegment", "n"]


class TestExistsResidualFuzz:
    """Seeded sweep over operators × correlation forms for the residual
    decorrelation (a 30-case version of this ran clean; the committed
    sweep keeps a representative 8 to bound suite time)."""

    CASES = [
        # (form, op): forms as in the generator below
        (0, "<"), (0, "!="), (1, ">"), (1, "<="),
        (2, ">="), (2, "="), (3, "<"), (3, ">"),
    ]

    def _sql(self, form, op, neg):
        if form == 0:
            return (f"SELECT l1.l_orderkey, l1.l_linenumber FROM lineitem l1 "
                    f"WHERE l1.l_orderkey < 200 AND {neg}EXISTS "
                    f"(SELECT 1 FROM lineitem l2 "
                    f"WHERE l2.l_orderkey = l1.l_orderkey "
                    f"AND l2.l_quantity {op} l1.l_quantity "
                    f"AND l2.l_linenumber != l1.l_linenumber) "
                    f"ORDER BY l1.l_orderkey, l1.l_linenumber")
        if form == 1:
            return (f"SELECT c.c_custkey FROM customer c WHERE {neg}EXISTS "
                    f"(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
                    f"AND o.o_totalprice {op} c.c_acctbal * 40) "
                    f"ORDER BY c.c_custkey")
        if form == 2:
            return (f"SELECT n.n_nationkey FROM nation n WHERE {neg}EXISTS "
                    f"(SELECT 1 FROM region r "
                    f"WHERE r.r_regionkey {op} n.n_nationkey - 2) "
                    f"ORDER BY n.n_nationkey")
        return (f"SELECT s.s_suppkey FROM supplier s WHERE {neg}EXISTS "
                f"(SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey "
                f"AND l.l_quantity {op} 25 AND s.s_acctbal > 100 "
                f"AND l.l_returnflag = 'R') ORDER BY s.s_suppkey")

    def test_sweep(self, engine, duck):
        for i, (form, op) in enumerate(self.CASES):
            sql = self._sql(form, op, "" if i % 2 else "NOT ")
            mine, oracle = _run(engine, duck, sql)
            assert len(mine) == len(oracle), sql
            for c in oracle.columns:
                assert mine[c].tolist() == oracle[c].tolist(), (sql, c)


class TestUncorrelatedExistsInExpressions:
    """Uncorrelated [NOT] EXISTS in CASE arms / select items resolves to a
    boolean literal at prepare time (limit-1 probe); correlated EXISTS
    keeps the semi/anti-join decorrelation."""

    def test_case_and_select_item(self, engine, duck):
        for sql in [
            "SELECT CASE WHEN EXISTS (SELECT 1 FROM region WHERE "
            "r_name = 'ASIA') THEN 'yes' ELSE 'no' END AS e",
            "SELECT CASE WHEN NOT EXISTS (SELECT 1 FROM region WHERE "
            "r_name = 'NOPE') THEN 'clean' END AS e",
            "SELECT EXISTS (SELECT 1 FROM region WHERE r_name = 'NOPE') "
            "AS e",
        ]:
            mine = engine.sql(sql).to_pandas()
            orc = duck.execute(sql).fetch_df()
            assert mine.e.astype(str).tolist() == \
                orc.e.astype(str).tolist(), sql
