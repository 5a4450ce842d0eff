"""Window functions (OVER) vs DuckDB — superset of the reference (§2.5:
no windows there), needed for keyed-dedup idioms in training pipelines."""

import pytest

from conftest import assert_frames_match, to_pandas


def run_both(engine, duck, my_sql, duck_sql=None):
    mine = engine.sql(my_sql)
    oracle = duck.execute(duck_sql or my_sql).fetch_df()
    assert_frames_match(mine, oracle)


class TestWindows:
    def test_row_number_latest_per_key(self, engine, duck):
        sql = ("SELECT o_custkey, o_orderkey, rn FROM ("
               "SELECT o_custkey, o_orderkey, "
               "ROW_NUMBER() OVER (PARTITION BY o_custkey "
               "ORDER BY o_orderdate DESC, o_orderkey) AS rn FROM orders"
               ") WHERE rn = 1")
        duck_sql = sql.replace(") WHERE rn = 1", ") t WHERE rn = 1")
        run_both(engine, duck, sql, duck_sql)

    def test_rank_dense_rank(self, engine, duck):
        run_both(engine, duck,
                 "SELECT l_orderkey, l_linenumber, "
                 "RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity) AS r, "
                 "DENSE_RANK() OVER (PARTITION BY l_orderkey "
                 "ORDER BY l_quantity) AS dr "
                 "FROM lineitem WHERE l_orderkey < 100")

    def test_cumulative_sum(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_custkey, o_orderkey, "
                 "SUM(o_totalprice) OVER (PARTITION BY o_custkey "
                 "ORDER BY o_orderkey) AS running_total "
                 "FROM orders WHERE o_custkey < 30")

    def test_partition_aggregate_no_order(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_orderkey, o_orderstatus, "
                 "COUNT(*) OVER (PARTITION BY o_orderstatus) AS n_in_status "
                 "FROM orders WHERE o_orderkey < 200")

    def test_lag(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_custkey, o_orderkey, "
                 "LAG(o_totalprice) OVER (PARTITION BY o_custkey "
                 "ORDER BY o_orderkey) AS prev_price "
                 "FROM orders WHERE o_custkey < 20")

    def test_global_window(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_orderkey, "
                 "ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn "
                 "FROM orders WHERE o_totalprice > 400000")

    def test_qualify(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_custkey, o_orderkey FROM orders "
                 "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey "
                 "ORDER BY o_orderdate DESC, o_orderkey) = 1")

    def test_qualify_alias(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_custkey, o_orderkey, "
                 "RANK() OVER (PARTITION BY o_custkey "
                 "ORDER BY o_totalprice DESC) AS r "
                 "FROM orders WHERE o_custkey < 50 QUALIFY r <= 2")

    def test_window_over_aggregate_and_subquery_form_agree(self, engine,
                                                           duck):
        # one-SELECT form (internally rewritten to the two-level plan)
        run_both(engine, duck,
                 "SELECT o_orderstatus, COUNT(*) AS n, "
                 "RANK() OVER (ORDER BY COUNT(*)) AS r "
                 "FROM orders GROUP BY o_orderstatus",
                 "SELECT o_orderstatus, COUNT(*) AS n, "
                 "RANK() OVER (ORDER BY COUNT(*)) AS r "
                 "FROM orders GROUP BY o_orderstatus")
        # the explicit subquery form
        run_both(engine, duck,
                 "SELECT s, n, RANK() OVER (ORDER BY n DESC) AS r FROM ("
                 "SELECT o_orderstatus AS s, COUNT(*) AS n FROM orders "
                 "GROUP BY o_orderstatus)",
                 "SELECT s, n, RANK() OVER (ORDER BY n DESC) AS r FROM ("
                 "SELECT o_orderstatus AS s, COUNT(*) AS n FROM orders "
                 "GROUP BY o_orderstatus) t")


class TestLagLeadArgs:
    def test_lag_offset_and_default(self, engine, duck):
        sql = ("SELECT o_orderkey, "
               "LAG(o_totalprice, 2, 0.0) OVER (ORDER BY o_orderkey) AS p2, "
               "LEAD(o_totalprice, 3) OVER (ORDER BY o_orderkey) AS n3 "
               "FROM orders WHERE o_custkey < 20")
        from conftest import assert_frames_match, to_pandas

        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["o_orderkey"])


class TestMoreWindowFns:
    def test_first_last_value(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT o_orderkey, "
               "FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey "
               "ORDER BY o_orderkey) AS fv, "
               "LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey "
               "ORDER BY o_orderkey) AS lv "
               "FROM orders WHERE o_custkey < 30")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["o_orderkey"])

    def test_ntile(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT o_orderkey, "
               "CAST(NTILE(4) OVER (PARTITION BY o_orderstatus "
               "ORDER BY o_orderkey) AS BIGINT) AS q "
               "FROM orders WHERE o_custkey < 50")
        mine = to_pandas(engine.sql(sql))
        mine["q"] = mine["q"].astype("int64")
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["o_orderkey"])


class TestRowsFrames:
    def test_moving_average(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT o_orderkey, "
               "AVG(o_totalprice) OVER (PARTITION BY o_orderstatus "
               "ORDER BY o_orderkey "
               "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS ma "
               "FROM orders WHERE o_custkey < 40")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["o_orderkey"])

    def test_rows_running_no_peer_sharing(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        # ROWS running sum: tied order keys do NOT share values
        sql = ("SELECT o_orderkey, "
               "SUM(o_totalprice) OVER (ORDER BY o_orderdate, o_orderkey "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rt "
               "FROM orders WHERE o_custkey < 10")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["o_orderkey"])

    def test_reverse_running_and_full_frame(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT o_orderkey, "
               "COUNT(o_orderkey) OVER (PARTITION BY o_orderstatus "
               "ORDER BY o_orderkey "
               "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rem, "
               "LAST_VALUE(o_totalprice) OVER (PARTITION BY o_orderstatus "
               "ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND "
               "UNBOUNDED FOLLOWING) AS lastp "
               "FROM orders WHERE o_custkey < 25")
        mine = to_pandas(engine.sql(sql))
        mine["rem"] = mine["rem"].astype("int64")
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["o_orderkey"])

    def test_frame_decompiles(self):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse

        sql = ("SELECT SUM(x) OVER (ORDER BY y ROWS BETWEEN 2 PRECEDING "
               "AND CURRENT ROW) AS s FROM t")
        stmt = parse(sql)[0]
        assert to_sql(parse(to_sql(stmt))[0]) == to_sql(stmt)


class TestPercentRankCumeDist:
    def test_parity(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT o_orderkey, "
               "PERCENT_RANK() OVER (PARTITION BY o_orderstatus "
               "ORDER BY o_totalprice) AS pr, "
               "CUME_DIST() OVER (PARTITION BY o_orderstatus "
               "ORDER BY o_totalprice) AS cd "
               "FROM orders WHERE o_custkey < 40")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["o_orderkey"])


class TestWindowsOverAggregates:
    """Windows combined with GROUP BY in one SELECT (ANSI: windows evaluate
    AFTER aggregation) — rewritten internally to the two-level form."""

    def test_rank_over_grouped_sum(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT o_orderstatus, "
               "ROUND(SUM(o_totalprice) * 100, 0) / 100 AS spend, "
               "RANK() OVER (ORDER BY SUM(o_totalprice) DESC) AS r "
               "FROM orders GROUP BY o_orderstatus")
        mine = to_pandas(engine.sql(sql))
        mine["r"] = mine["r"].astype("int64")
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["o_orderstatus"])

    def test_share_of_total_window(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT c_mktsegment, COUNT(*) AS n, "
               "ROUND(100.0 * COUNT(*) / "
               "SUM(COUNT(*)) OVER (), 4) AS pct "
               "FROM customer GROUP BY c_mktsegment")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["c_mktsegment"])

    def test_qualify_over_grouped(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT o_custkey, COUNT(*) AS n FROM orders "
               "GROUP BY o_custkey "
               "QUALIFY RANK() OVER (ORDER BY COUNT(*) DESC) <= 3")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["o_custkey"])


class TestRangeFrames:
    """RANGE offset frames: VALUE offsets on the single numeric ORDER BY
    key — frame = rows with key in [key_i + lo, key_i + hi] (peers always
    share frames). Vectorized: searchsorted frame edges + prefix sums
    (SUM/COUNT/AVG) or an O(n log n) sparse table (MIN/MAX)."""

    def test_range_trailing_sum(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT l_orderkey, l_linenumber, "
               "SUM(l_quantity) OVER (PARTITION BY l_orderkey "
               "ORDER BY l_quantity "
               "RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS s "
               "FROM lineitem WHERE l_orderkey < 200")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle,
                            sort_by=["l_orderkey", "l_linenumber"])

    def test_range_symmetric_count_and_avg(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT l_orderkey, l_linenumber, "
               "COUNT(l_quantity) OVER (PARTITION BY l_orderkey "
               "ORDER BY l_quantity "
               "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS c, "
               "AVG(l_quantity) OVER (PARTITION BY l_orderkey "
               "ORDER BY l_quantity "
               "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS a "
               "FROM lineitem WHERE l_orderkey < 200")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle,
                            sort_by=["l_orderkey", "l_linenumber"])

    def test_range_min_max_desc(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT l_orderkey, l_linenumber, "
               "MIN(l_extendedprice) OVER (PARTITION BY l_orderkey "
               "ORDER BY l_quantity "
               "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS mn, "
               "MAX(l_quantity) OVER (PARTITION BY l_orderkey "
               "ORDER BY l_quantity DESC "
               "RANGE BETWEEN 4 PRECEDING AND CURRENT ROW) AS mx "
               "FROM lineitem WHERE l_orderkey < 200")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle,
                            sort_by=["l_orderkey", "l_linenumber"])

    def test_range_unbounded_following(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT l_orderkey, l_linenumber, "
               "SUM(l_quantity) OVER (PARTITION BY l_orderkey "
               "ORDER BY l_quantity "
               "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s "
               "FROM lineitem WHERE l_orderkey < 200")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle,
                            sort_by=["l_orderkey", "l_linenumber"])

    def test_range_default_frame_still_default(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        # explicit ANSI-default RANGE frame == no frame clause at all
        sql = ("SELECT o_orderkey, "
               "SUM(o_totalprice) OVER (ORDER BY o_orderdate "
               "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rt "
               "FROM orders WHERE o_custkey < 10")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["o_orderkey"])

    def test_range_interval_trailing_hour(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        # INTERVAL offsets over a timestamp ORDER BY key (DuckDB accepts
        # the same syntax, so the oracle runs the identical string)
        sql = ("SELECT event_id, "
               "SUM(value) OVER (PARTITION BY user_id ORDER BY ts "
               "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
               "AS s, "
               "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
               "RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING "
               "AND INTERVAL 30 MINUTE FOLLOWING) AS c "
               "FROM events WHERE user_id < 40")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["event_id"])

    def test_range_interval_day_minmax(self, engine, duck):
        from conftest import assert_frames_match, to_pandas

        sql = ("SELECT event_id, "
               "MAX(value) OVER (PARTITION BY user_id ORDER BY ts "
               "RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW) "
               "AS mx "
               "FROM events WHERE user_id < 40")
        mine = to_pandas(engine.sql(sql))
        oracle = duck.execute(sql).fetch_df()
        assert_frames_match(mine, oracle, sort_by=["event_id"])

    def test_range_frame_decompiles(self):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse

        sql = ("SELECT SUM(x) OVER (ORDER BY y RANGE BETWEEN 2 PRECEDING "
               "AND 2 FOLLOWING) AS s FROM t")
        stmt = parse(sql)[0]
        assert "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING" in to_sql(stmt)
        assert to_sql(parse(to_sql(stmt))[0]) == to_sql(stmt)


class TestGeneralRowsFrames:
    """Arbitrary ROWS frame bounds (any PRECEDING/FOLLOWING combination)
    via the shared range-aggregate core; ties fully broken in ORDER BY
    (ROWS framing under ties is order-nondeterministic on any engine)."""

    FRAMES = [
        "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING",
        "ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING",
        "ROWS BETWEEN 4 PRECEDING AND 2 PRECEDING",
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING",
        "ROWS BETWEEN 2 FOLLOWING AND 1 FOLLOWING",  # inverted → empty
    ]

    def test_all_shapes_vs_duckdb(self, engine, duck):
        import numpy as np

        over = ("PARTITION BY l_orderkey ORDER BY l_linenumber, "
                "l_extendedprice, l_quantity")
        keys = ["l_orderkey", "l_linenumber", "l_extendedprice"]
        for frame in self.FRAMES:
            sql = (f"SELECT l_orderkey, l_linenumber, l_extendedprice, "
                   f"SUM(l_quantity) OVER ({over} {frame}) AS w, "
                   f"COUNT(l_quantity) OVER ({over} {frame}) AS c, "
                   f"MIN(l_quantity) OVER ({over} {frame}) AS mn "
                   f"FROM lineitem WHERE l_orderkey < 60")
            mine = engine.sql(sql).to_pandas().sort_values(
                keys, ignore_index=True)
            oracle = duck.execute(sql).fetch_df().sort_values(
                keys, ignore_index=True)
            for c in ("w", "c", "mn"):
                a = mine[c].to_numpy().astype(float)
                b = oracle[c].to_numpy().astype(float)
                assert np.array_equal(a, b, equal_nan=True), (frame, c)


class TestWindowPathEquivalence:
    """The no-shuffle small path and the coarse-bucket shuffle path must
    produce identical window results (same function, different plan)."""

    def test_paths_identical(self, engine):
        from qwery_ray.sqlc.compiler import Compiler

        sql = ("SELECT o_custkey, o_orderkey, "
               "ROW_NUMBER() OVER (PARTITION BY o_custkey "
               "ORDER BY o_orderdate DESC, o_orderkey) AS rn, "
               "SUM(o_totalprice) OVER (PARTITION BY o_custkey "
               "ORDER BY o_orderkey) AS rt "
               "FROM orders WHERE o_custkey < 200")
        keys = ["o_custkey", "o_orderkey"]
        small = engine.sql(sql).to_pandas().sort_values(
            keys, ignore_index=True)
        orig = Compiler.SMALL_PARTIALS_LIMIT
        Compiler.SMALL_PARTIALS_LIMIT = 0  # force the bucket shuffle
        try:
            big = engine.sql(sql).to_pandas().sort_values(
                keys, ignore_index=True)
        finally:
            Compiler.SMALL_PARTIALS_LIMIT = orig
        import numpy as np

        assert small["rn"].tolist() == big["rn"].tolist()
        assert np.array_equal(small["rt"].to_numpy(), big["rt"].to_numpy())


class TestNthValue:
    def test_nth_value_default_frame(self, engine, duck):
        import pandas as pd

        sql = ("SELECT o_orderkey, NTH_VALUE(o_totalprice, 2) OVER "
               "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) "
               "AS nv FROM orders")
        a = engine.sql(sql).to_pandas().sort_values("o_orderkey",
                                                    ignore_index=True)
        b = duck.execute(sql).fetch_df().sort_values("o_orderkey",
                                                     ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-12)

    def test_nth_value_requires_literal(self, engine):
        import pytest

        with pytest.raises(Exception, match="NTH_VALUE"):
            engine.sql("SELECT NTH_VALUE(o_totalprice, o_custkey) OVER "
                       "(ORDER BY o_orderkey) AS x FROM orders").to_pandas()


class TestIgnoreNulls:
    """fn(x IGNORE NULLS) for FIRST_VALUE/LAST_VALUE/LAG/LEAD — the
    gap-filling workhorses (LAST_VALUE IGNORE NULLS = forward fill)."""

    @pytest.fixture(scope="class")
    def gap_table(self, ray_session, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("gaps")
        pq.write_table(
            pa.table({"k": [1] * 6 + [2] * 4, "rid": list(range(10)),
                      "x": [None, 5.0, None, 7.0, None, None,
                            1.0, None, 2.0, None]}),
            str(d / "w.parquet"))
        return str(d)

    @pytest.mark.parametrize("fn", [
        "LAST_VALUE(x IGNORE NULLS)", "FIRST_VALUE(x IGNORE NULLS)",
        "LAG(x IGNORE NULLS)", "LEAD(x IGNORE NULLS)"])
    def test_vs_duckdb(self, gap_table, fn):
        import duckdb
        import pandas as pd

        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root=gap_table)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW w AS SELECT * FROM '{gap_table}/w.parquet'")
        sql = (f"SELECT rid, {fn} OVER (PARTITION BY k ORDER BY rid) AS v "
               f"FROM w")
        a = eng.sql(sql).to_pandas().sort_values("rid", ignore_index=True)
        b = con.execute(sql).df().sort_values("rid", ignore_index=True)
        con.close()
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_round_trip(self):
        from qwery_ray.sqlc import parser as P
        from qwery_ray.sqlc.decompiler import to_sql

        sql = ("SELECT LAST_VALUE(x IGNORE NULLS) OVER (ORDER BY rid) "
               "AS v FROM w")
        stmt = P.parse(sql)[0]
        assert P.parse(to_sql(stmt))[0] == stmt


class TestNamedWindows:
    """ANSI WINDOW clause: `fn() OVER w … WINDOW w AS (…)` resolves at
    parse time (parser._resolve_named_windows); scope is the single
    SELECT — subqueries keep their own namespaces."""

    def test_two_refs_one_window(self, engine, duck):
        q = ("SELECT event_id, user_id, ROW_NUMBER() OVER w AS rn, "
             "RANK() OVER w AS rk FROM events "
             "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
             "ORDER BY event_id LIMIT 50")
        run_both(engine, duck, q)

    def test_multiple_windows_with_frames(self, engine, duck):
        q = ("SELECT event_id, SUM(value) OVER w1 AS cum, "
             "AVG(value) OVER w2 AS m3 FROM events "
             "WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id), "
             "w2 AS (PARTITION BY user_id ORDER BY ts, event_id "
             "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) "
             "ORDER BY event_id LIMIT 50")
        run_both(engine, duck, q)

    def test_dangling_name_raises(self, engine):
        import pytest

        from qwery_ray.sqlc.parser import ParseError

        with pytest.raises(ParseError):
            engine.sql("SELECT ROW_NUMBER() OVER w AS rn FROM events "
                       "LIMIT 1")


class TestGroupsFramesAndExclude:
    """ANSI frame completeness: GROUPS mode (peer-group offsets — a RANGE
    frame over the group index) and the EXCLUDE clause (CURRENT ROW /
    GROUP / TIES split each frame into two sub-ranges around the
    exclusion; _WindowGroupFn._frame_agg/_agg_multi). The container's
    DuckDB predates GROUPS support, so GROUPS is golden-tested by hand;
    EXCLUDE verifies against DuckDB directly."""

    def test_exclude_current_row_rows_frame(self, engine, duck):
        run_both(engine, duck,
                 "SELECT event_id, "
                 "SUM(value) OVER (PARTITION BY user_id ORDER BY ts, "
                 "event_id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING "
                 "EXCLUDE CURRENT ROW) AS s1, "
                 "MIN(value) OVER (PARTITION BY user_id ORDER BY ts, "
                 "event_id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING "
                 "EXCLUDE CURRENT ROW) AS m1 "
                 "FROM events WHERE user_id < 30 ORDER BY event_id")

    def test_exclude_group_and_ties_with_peers(self, engine, duck):
        # duplicate order keys make real peer groups
        run_both(engine, duck,
                 "SELECT g, v, "
                 "SUM(v) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING "
                 "AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS xg, "
                 "AVG(v) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING "
                 "AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS xt, "
                 "COUNT(*) OVER (ORDER BY g RANGE BETWEEN 1 PRECEDING AND "
                 "1 FOLLOWING EXCLUDE GROUP) AS cg "
                 "FROM (VALUES (1, 10), (1, 20), (2, 30), (2, 40), (3, 50)"
                 ") t(g, v) ORDER BY g, v")

    def test_exclude_ties_keeps_self_only_when_in_frame(self, engine, duck):
        run_both(engine, duck,
                 "SELECT g, v, "
                 "MAX(v) OVER (ORDER BY g ROWS BETWEEN 1 PRECEDING AND "
                 "1 FOLLOWING EXCLUDE TIES) AS mt "
                 "FROM (VALUES (1, 10), (1, 20), (1, 30), (2, 40), (3, 50)"
                 ") t(g, v) ORDER BY g, v")

    def test_groups_frame_golden(self, engine):
        # peer groups by g: [1,1], [2,2], [3]; values 10,20 | 30,40 | 50
        # GROUPS 1 PRECEDING..CURRENT: row's group + previous group
        out = to_pandas(engine.sql(
            "SELECT g, v, "
            "SUM(v) OVER (ORDER BY g GROUPS BETWEEN 1 PRECEDING AND "
            "CURRENT ROW) AS s, "
            "COUNT(*) OVER (ORDER BY g GROUPS BETWEEN UNBOUNDED PRECEDING "
            "AND 1 FOLLOWING) AS c "
            "FROM (VALUES (1, 10), (1, 20), (2, 30), (2, 40), (3, 50)"
            ") t(g, v) ORDER BY g, v"))
        assert out["s"].tolist() == [30, 30, 100, 100, 120]
        assert out["c"].tolist() == [4, 4, 5, 5, 5]

    def test_groups_frame_with_exclude_golden(self, engine):
        out = to_pandas(engine.sql(
            "SELECT g, v, "
            "SUM(v) OVER (ORDER BY g GROUPS BETWEEN 1 PRECEDING AND "
            "1 FOLLOWING EXCLUDE GROUP) AS sx "
            "FROM (VALUES (1, 10), (1, 20), (2, 30), (2, 40), (3, 50)"
            ") t(g, v) ORDER BY g, v"))
        # frames: g=1 → groups {1,2} minus own group = 70; g=2 → groups
        # {1,2,3} minus own = 80; g=3 → groups {2,3} minus own = 70
        assert out["sx"].tolist() == [70, 70, 80, 80, 70]

    def test_named_window_with_exclude(self, engine, duck):
        run_both(engine, duck,
                 "SELECT g, v, AVG(v) OVER w AS a FROM (VALUES "
                 "(1, 10), (1, 20), (2, 30), (3, 40)) t(g, v) "
                 "WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING "
                 "AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) "
                 "ORDER BY g, v")


class TestWithinGroupAndShortFrames:
    def test_percentiles_within_group(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_orderstatus, PERCENTILE_CONT(0.5) WITHIN GROUP "
                 "(ORDER BY o_totalprice) AS med, PERCENTILE_DISC(0.25) "
                 "WITHIN GROUP (ORDER BY o_totalprice) AS q1 FROM orders "
                 "GROUP BY o_orderstatus ORDER BY o_orderstatus")

    def test_within_group_desc_cont(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o_orderstatus, PERCENTILE_CONT(0.25) WITHIN GROUP "
                 "(ORDER BY o_totalprice DESC) AS q3d FROM orders "
                 "GROUP BY o_orderstatus ORDER BY o_orderstatus")

    def test_string_agg_within_group(self, engine, duck):
        # DuckDB's grammar takes STRING_AGG order inline, not WITHIN GROUP
        run_both(engine, duck,
                 "SELECT o_orderstatus, STRING_AGG(o_orderpriority, ',') "
                 "WITHIN GROUP (ORDER BY o_orderkey) AS sa FROM orders "
                 "WHERE o_orderkey < 50 GROUP BY o_orderstatus "
                 "ORDER BY o_orderstatus",
                 "SELECT o_orderstatus, STRING_AGG(o_orderpriority, ',' "
                 "ORDER BY o_orderkey) AS sa FROM orders "
                 "WHERE o_orderkey < 50 GROUP BY o_orderstatus "
                 "ORDER BY o_orderstatus")

    def test_single_bound_frame_shorthand(self, engine, duck):
        run_both(engine, duck,
                 "SELECT user_id, SUM(value) OVER (PARTITION BY user_id "
                 "ORDER BY ts ROWS 3 PRECEDING) AS s3, "
                 "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
                 "ROWS UNBOUNDED PRECEDING) AS rc "
                 "FROM events WHERE user_id < 10 ORDER BY user_id, ts")
