"""GENERATE_SERIES / RANGE table functions + SQL-92 implicit (comma) joins.

The series sources compile to a lazy distributed ray.data.range (blocks of
a counter — a 10^9-row series never materializes a driver list); implicit
comma joins promote WHERE equality conjuncts into real equi-joins
(Compiler._promote_cross_equi) so `FROM a, b WHERE a.k = b.k` shuffles
O(|a|+|b|), not O(|a|·|b|).
"""

from conftest import assert_frames_match, to_pandas


def run_both(engine, duck, sql, sort_by=None):
    mine = engine.sql(sql)
    oracle = duck.execute(sql).fetch_df()
    assert_frames_match(mine, oracle, sort_by=sort_by)


class TestSeriesFunctions:
    def test_generate_series_two_arg(self, engine, duck):
        run_both(engine, duck,
                 "SELECT * FROM generate_series(1, 10) "
                 "ORDER BY generate_series")

    def test_generate_series_step_and_negative(self, engine, duck):
        run_both(engine, duck,
                 "SELECT * FROM generate_series(1, 10, 3) "
                 "ORDER BY generate_series")
        run_both(engine, duck,
                 "SELECT * FROM generate_series(10, 1, -4) "
                 "ORDER BY generate_series")

    def test_range_exclusive(self, engine, duck):
        run_both(engine, duck, "SELECT * FROM range(5) ORDER BY range")
        run_both(engine, duck,
                 "SELECT * FROM range(1, 10, 3) ORDER BY range")
        run_both(engine, duck,
                 "SELECT * FROM range(10, 0, -3) ORDER BY range")

    def test_single_point(self, engine, duck):
        run_both(engine, duck,
                 "SELECT * FROM generate_series(7, 7) ORDER BY generate_series")

    def test_column_alias_and_exprs(self, engine, duck):
        run_both(engine, duck,
                 "SELECT g.x, g.x * 2 AS dbl FROM generate_series(1, 5) "
                 "AS g(x) ORDER BY x")

    def test_aggregate_over_series(self, engine, duck):
        run_both(engine, duck,
                 "SELECT SUM(x) AS s, COUNT(*) AS n FROM range(1, 1001) t(x)")

    def test_sign_mismatch_raises(self, engine):
        import pytest

        with pytest.raises(ValueError):
            engine.sql("SELECT * FROM generate_series(5, 1)")

    def test_series_join_table(self, engine, duck):
        run_both(engine, duck,
                 "SELECT r_regionkey, x FROM region, generate_series(1, 2) "
                 "t(x) ORDER BY r_regionkey, x")


class TestImplicitJoins:
    def test_qualified_equi(self, engine, duck):
        run_both(engine, duck,
                 "SELECT r.r_name, n.n_name FROM region r, nation n "
                 "WHERE n.n_regionkey = r.r_regionkey "
                 "ORDER BY r.r_name, n.n_name")

    def test_unqualified_equi(self, engine, duck):
        # unqualified refs resolve via parquet footer schemas
        run_both(engine, duck,
                 "SELECT r_name, n_name FROM region, nation "
                 "WHERE n_regionkey = r_regionkey ORDER BY r_name, n_name")

    def test_three_way_with_filter(self, engine, duck):
        run_both(engine, duck,
                 "SELECT n_name, COUNT(*) AS n FROM customer c, orders o, "
                 "nation n WHERE o.o_custkey = c.c_custkey "
                 "AND c.c_nationkey = n.n_nationkey "
                 "AND o_totalprice > 150000 GROUP BY n_name",
                 sort_by=["n_name"])

    def test_promotion_yields_equi_plan(self, engine):
        # the compiled plan must not contain a cross-join stage
        out = to_pandas(engine.sql(
            "EXPLAIN SELECT r.r_name, n.n_name FROM region r, nation n "
            "WHERE n.n_regionkey = r.r_regionkey"))
        assert "Cross" not in str(out.values)

    def test_pure_cartesian_still_works(self, engine, duck):
        run_both(engine, duck, "SELECT COUNT(*) AS n FROM region, nation")


class TestLateralUnnest:
    def test_comma_unnest_with_alias(self, engine, duck):
        run_both(engine, duck,
                 "SELECT id, tag FROM (VALUES (1, [10, 20]), (2, []), "
                 "(3, NULL), (4, [30])) t(id, tags), UNNEST(t.tags) AS "
                 "u(tag) ORDER BY id, tag")

    def test_cross_join_unnest(self, engine, duck):
        # (list columns themselves are unhashable for the frame sorter —
        # compare the scalar projection)
        run_both(engine, duck,
                 "SELECT id, tag FROM (VALUES (1, [10, 20]), "
                 "(4, [30])) t(id, tags) CROSS JOIN UNNEST(t.tags) AS "
                 "u(tag) ORDER BY id, tag")

    def test_constant_unnest_source(self, engine, duck):
        run_both(engine, duck,
                 "SELECT * FROM UNNEST([1, 2, 3]) AS q(x) ORDER BY x")

    def test_default_name_dedup(self, engine):
        # unnamed lateral unnest of `tags` dedups to tags_1 (DuckDB style)
        out = to_pandas(engine.sql(
            "SELECT * FROM (VALUES (1, [10, 20])) t(id, tags), "
            "UNNEST(t.tags)"))
        assert list(out.columns) == ["id", "tags", "tags_1"]
        assert sorted(out["tags_1"].tolist()) == [10, 20]

    def test_unnest_embeddings_aggregate(self, engine, duck):
        # real list<float> column; read prunes to (vec_id, embedding) only
        run_both(engine, duck,
                 "SELECT vec_id, COUNT(*) AS n, "
                 "ROUND(CAST(MIN(v) AS DOUBLE), 5) AS mn "
                 "FROM embeddings, UNNEST(embedding) AS u(v) "
                 "GROUP BY vec_id ORDER BY vec_id LIMIT 10")


class TestBooleanSelectItems:
    def test_comparisons_as_items(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_orderkey, o_totalprice > 200000 AS big, "
                 "o_orderstatus = 'O' AS open_o, "
                 "o_totalprice BETWEEN 1000 AND 2000 AS mid, "
                 "o_orderpriority IS NULL AS nop "
                 "FROM orders ORDER BY o_orderkey LIMIT 20")

    def test_and_or_as_item(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_orderkey, o_totalprice > 100000 AND "
                 "o_orderstatus = 'O' AS both "
                 "FROM orders ORDER BY o_orderkey LIMIT 10")

    def test_in_list_as_item(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_orderkey, o_orderstatus IN ('O', 'P') AS live "
                 "FROM orders ORDER BY o_orderkey LIMIT 10")
