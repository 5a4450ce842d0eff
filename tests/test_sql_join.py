"""Join parity vs DuckDB (reference has INNER only — Join.scala:10-37;
LEFT/RIGHT/FULL are sane supersets)."""

from conftest import assert_frames_match, to_pandas


def run_both(engine, duck, my_sql, duck_sql=None, sort_by=None):
    mine = engine.sql(my_sql)
    oracle = duck.execute(duck_sql or my_sql).fetch_df()
    assert_frames_match(mine, oracle, sort_by=sort_by)


class TestJoins:
    def test_inner_broadcast(self, engine, duck):
        run_both(engine, duck,
                 "SELECT n.n_name, r.r_name FROM nation n "
                 "INNER JOIN region r ON n.n_regionkey = r.r_regionkey")

    def test_inner_with_filter(self, engine, duck):
        run_both(engine, duck,
                 "SELECT c.c_name, o.o_orderkey, o.o_totalprice "
                 "FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey "
                 "WHERE o.o_totalprice > 300000")

    def test_three_way(self, engine, duck):
        run_both(engine, duck,
                 "SELECT r.r_name, n.n_name, s.s_name FROM supplier s "
                 "INNER JOIN nation n ON s.s_nationkey = n.n_nationkey "
                 "INNER JOIN region r ON n.n_regionkey = r.r_regionkey")

    def test_join_aggregate(self, engine, duck):
        run_both(engine, duck,
                 "SELECT c.c_mktsegment, COUNT(*) AS n, SUM(o.o_totalprice) AS total "
                 "FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey "
                 "GROUP BY c.c_mktsegment")

    def test_left_join(self, engine, duck):
        run_both(engine, duck,
                 "SELECT c.c_custkey, o.o_orderkey FROM customer c "
                 "LEFT JOIN orders o ON o.o_custkey = c.c_custkey")

    def test_join_collision_columns(self, engine, duck):
        # both sides expose *_nationkey-style names; qualified refs disambiguate
        run_both(engine, duck,
                 "SELECT s.s_name, c.c_name FROM supplier s "
                 "INNER JOIN customer c ON s.s_nationkey = c.c_nationkey "
                 "WHERE c.c_acctbal > 9000")

    def test_join_residual_condition(self, engine, duck):
        run_both(engine, duck,
                 "SELECT s.s_name, c.c_name FROM supplier s "
                 "INNER JOIN customer c ON s.s_nationkey = c.c_nationkey "
                 "AND c.c_acctbal > s.s_acctbal")

    def test_lineitem_orders_large(self, engine, duck):
        run_both(engine, duck,
                 "SELECT l.l_orderkey, l.l_quantity, o.o_orderdate FROM lineitem l "
                 "INNER JOIN orders o ON l.l_orderkey = o.o_orderkey "
                 "WHERE o.o_orderstatus = 'F' AND l.l_quantity > 48")

    def test_cross_join(self, engine, duck):
        run_both(engine, duck,
                 "SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
                 "SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n")

    def test_self_join(self, engine, duck):
        run_both(engine, duck,
                 "SELECT o1.o_orderkey AS a, o2.o_orderkey AS b FROM orders o1 "
                 "INNER JOIN orders o2 ON o1.o_custkey = o2.o_custkey "
                 "WHERE o1.o_orderkey < o2.o_orderkey AND o1.o_custkey = 7")

    def test_join_subquery_mixed_key_widths(self, engine, duck):
        # nation.n_nationkey is int32; the aggregated subquery key widens to
        # int64 — join keys must harmonize
        run_both(engine, duck,
                 "SELECT n.n_name, x.cnt FROM nation n INNER JOIN "
                 "(SELECT s_nationkey, COUNT(*) AS cnt FROM supplier "
                 "GROUP BY s_nationkey) x ON n.n_nationkey = x.s_nationkey",
                 "SELECT n.n_name, x.cnt FROM nation n JOIN "
                 "(SELECT s_nationkey, COUNT(*) AS cnt FROM supplier "
                 "GROUP BY s_nationkey) x ON n.n_nationkey = x.s_nationkey")


class TestJoinKeyNamesSurvive:
    """Equi-INNER joins coalesce both keys under the left name; the right
    key name must stay addressable for later predicates (DuckDB parity)."""

    def test_right_key_name_in_where(self, engine, duck):
        sql = ("SELECT COUNT(*) AS n FROM supplier s INNER JOIN lineitem l "
               "ON s.s_suppkey = l.l_suppkey WHERE l.l_suppkey = 3")
        mine = engine.sql(sql).to_pandas()
        oracle = duck.execute(
            "SELECT COUNT(*) AS n FROM supplier s JOIN lineitem l "
            "ON s.s_suppkey = l.l_suppkey WHERE l.l_suppkey = 3").fetch_df()
        assert mine["n"].tolist() == oracle["n"].tolist()
        assert mine["n"].iloc[0] > 0

    def test_right_key_name_projected(self, engine, duck):
        sql = ("SELECT n.n_nationkey, COUNT(*) AS n_cust "
               "FROM customer c INNER JOIN nation n "
               "ON c.c_nationkey = n.n_nationkey "
               "GROUP BY n.n_nationkey ORDER BY n.n_nationkey")
        mine = engine.sql(sql).to_pandas()
        oracle = duck.execute(
            "SELECT n.n_nationkey, COUNT(*) AS n_cust "
            "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n.n_nationkey ORDER BY n.n_nationkey").fetch_df()
        assert mine["n_nationkey"].tolist() == oracle["n_nationkey"].tolist()
        assert mine["n_cust"].tolist() == oracle["n_cust"].tolist()


class TestThetaJoin:
    """Keyless non-equi (theta) joins — broadcast right side, chunked
    pair-slice evaluation (ThetaJoinBatch). Reference is equi-only."""

    def test_inner_inequality(self, engine, duck):
        run_both(engine, duck,
                 "SELECT c.c_name, n.n_name FROM customer c "
                 "INNER JOIN nation n ON c.c_acctbal < n.n_nationkey * 100 "
                 "WHERE c.c_custkey <= 40")

    def test_between_band(self, engine, duck, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        bands = pa.table({
            "lo": [0.0, 50000.0, 150000.0, 100000.0],
            "hi": [50000.0, 150000.0, 600000.0, 200000.0],  # overlapping
            "label": ["low", "mid", "high", "wide"],
        })
        pq.write_table(bands, str(tmp_path / "bands.parquet"))
        duck.execute(
            f"CREATE VIEW bands AS SELECT * FROM '{tmp_path}/bands.parquet'")
        run_both(engine, duck,
                 f"SELECT o.o_orderkey, b.label FROM orders o "
                 f"INNER JOIN '{tmp_path}/bands.parquet' b "
                 f"ON o.o_totalprice BETWEEN b.lo AND b.hi "
                 f"WHERE o.o_orderkey <= 200",
                 "SELECT o.o_orderkey, b.label FROM orders o "
                 "INNER JOIN bands b ON o.o_totalprice BETWEEN b.lo AND b.hi "
                 "WHERE o.o_orderkey <= 200")

    def test_left_theta_null_extension(self, engine, duck, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        bands = pa.table({"lo": [500000.0], "hi": [900000.0],
                          "label": ["unreachable"]})
        pq.write_table(bands, str(tmp_path / "b2.parquet"))
        duck.execute(
            f"CREATE VIEW b2 AS SELECT * FROM '{tmp_path}/b2.parquet'")
        run_both(engine, duck,
                 f"SELECT o.o_orderkey, b.label FROM orders o "
                 f"LEFT JOIN '{tmp_path}/b2.parquet' b "
                 f"ON o.o_totalprice BETWEEN b.lo AND b.hi "
                 f"WHERE o.o_orderkey <= 100",
                 "SELECT o.o_orderkey, b.label FROM orders o "
                 "LEFT JOIN b2 b ON o.o_totalprice BETWEEN b.lo AND b.hi "
                 "WHERE o.o_orderkey <= 100")

    def test_large_right_rejected(self, engine, monkeypatch):
        import pytest

        from qwery_ray.sqlc import compiler as C

        monkeypatch.setattr(C, "BROADCAST_ROW_LIMIT", 0)
        monkeypatch.setattr(C, "BROADCAST_ROW_HARD_CAP", 0)
        with pytest.raises(Exception, match="(?i)broadcast|equi-key"):
            engine.sql(
                "SELECT * FROM orders o INNER JOIN "
                "(SELECT * FROM lineitem) l ON o.o_totalprice < l.l_quantity"
            ).to_pandas()


class TestJoinPushdown:
    """Scan-pushdown correctness around joins: a qualified WHERE ref must
    only ever filter the table its alias names (regression: `WHERE b.value
    > 5` used to push onto base table `a` when `a` also had a `value`
    column and silently dropped matching pairs)."""

    @staticmethod
    def _tables(tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"k": [1, 2, 3], "value": [1.0, 2.0, 3.0]}),
                       str(tmp_path / "a.parquet"))
        pq.write_table(pa.table({"k": [1, 2, 3], "value": [30.0, 2.0, 1.0]}),
                       str(tmp_path / "b.parquet"))
        return str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")

    def test_qualified_ref_same_named_columns(self, engine, tmp_path):
        a, b = self._tables(tmp_path)
        out = engine.sql(
            f"SELECT a.k, a.value AS av, b.value AS bv FROM '{a}' a "
            f"INNER JOIN '{b}' b ON a.k = b.k WHERE b.value > 5"
        ).to_pandas()
        assert out.to_dict("records") == [{"k": 1, "av": 1.0, "bv": 30.0}]

    def test_left_join_right_filter_not_pushed(self, engine, tmp_path):
        # LEFT JOIN: WHERE on the right side runs POST-join (null-extended
        # rows must evaluate it as NULL → dropped), never pre-join
        a, b = self._tables(tmp_path)
        out = engine.sql(
            f"SELECT a.k, b.value AS bv FROM '{a}' a "
            f"LEFT JOIN '{b}' b ON a.k = b.k WHERE b.value IS NULL"
        ).to_pandas()
        assert out.empty  # every a-row matches a b-row, so none null-extend

    def test_inner_join_side_pushdown(self, engine, duck, tmp_path):
        # both-side filters with same-named columns, vs DuckDB
        a, b = self._tables(tmp_path)
        duck.execute(f"CREATE VIEW ja AS SELECT * FROM '{a}'")
        duck.execute(f"CREATE VIEW jb AS SELECT * FROM '{b}'")
        mine = engine.sql(
            f"SELECT a.k FROM '{a}' a INNER JOIN '{b}' b ON a.k = b.k "
            f"WHERE b.value >= 1 AND a.value <= 2").to_pandas()
        oracle = duck.execute(
            "SELECT a.k FROM ja a INNER JOIN jb b ON a.k = b.k "
            "WHERE b.value >= 1 AND a.value <= 2").df()
        assert_frames_match(mine, oracle)


class TestSemiAntiJoin:
    """SEMI / ANTI JOIN (DuckDB + Spark `LEFT SEMI|ANTI` syntax): keep/drop
    left rows by match existence; right columns never surface. Key-only ON
    ships only the probe side's KEY columns; residual ON uses the EXISTS
    machinery (broadcast) or a tagged winner-id shuffle (large)."""

    def test_semi_basic(self, engine, duck):
        run_both(engine, duck,
                 "SELECT c.c_custkey, c.c_name FROM customer c "
                 "SEMI JOIN orders o ON o.o_custkey = c.c_custkey")

    def test_anti_basic(self, engine, duck):
        run_both(engine, duck,
                 "SELECT c.c_custkey FROM customer c "
                 "ANTI JOIN orders o ON o.o_custkey = c.c_custkey")

    def test_left_semi_spark_syntax(self, engine, duck):
        run_both(engine, duck,
                 "SELECT n.n_name FROM nation n "
                 "LEFT SEMI JOIN supplier s ON s.s_nationkey = n.n_nationkey",
                 "SELECT n.n_name FROM nation n "
                 "SEMI JOIN supplier s ON s.s_nationkey = n.n_nationkey")

    def test_semi_with_residual(self, engine, duck):
        run_both(engine, duck,
                 "SELECT c.c_custkey FROM customer c SEMI JOIN orders o "
                 "ON o.o_custkey = c.c_custkey AND o.o_totalprice > 300000")

    def test_anti_with_residual_large_path(self, engine, duck, monkeypatch):
        from qwery_ray.sqlc import compiler as C

        monkeypatch.setattr(C, "BROADCAST_ROW_LIMIT", 0)
        monkeypatch.setattr(C, "BROADCAST_ROW_HARD_CAP", 0)
        run_both(engine, duck,
                 "SELECT c.c_custkey FROM customer c ANTI JOIN orders o "
                 "ON o.o_custkey = c.c_custkey AND o.o_totalprice > 300000")

    def test_semi_aggregate_downstream(self, engine, duck):
        run_both(engine, duck,
                 "SELECT n.n_name, COUNT(*) AS n_cust FROM customer c "
                 "SEMI JOIN orders o ON o.o_custkey = c.c_custkey "
                 "INNER JOIN nation n ON c.c_nationkey = n.n_nationkey "
                 "GROUP BY n.n_name")

    def test_decompile_round_trip(self):
        from qwery_ray.sqlc import parser as P
        from qwery_ray.sqlc.decompiler import to_sql

        for jt in ("SEMI", "ANTI"):
            sql = (f"SELECT c.c_custkey FROM customer c {jt} JOIN orders o "
                   f"ON o.o_custkey = c.c_custkey")
            stmt = P.parse(sql)[0]
            assert P.parse(to_sql(stmt))[0] == stmt


class TestShuffleJoinGuard:
    """Ray 2.49 deadlocks with two live hash-shuffle join operators in one
    streaming plan; _shuffle_join materializes pending-join inputs so at
    most one runs per execution (integration coverage: the semi_anti_join
    driver query chains two shuffle joins and completes in-suite)."""

    def test_pending_join_detection(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from qwery_ray.sqlc.compiler import (_has_pending_shuffle_join,
                                             _shuffle_join)

        a = rd.from_arrow(pa.table({"k": [1, 2], "v": [10, 20]}))
        b = rd.from_arrow(pa.table({"k": [1, 3], "w": [1.0, 3.0]}))
        assert not _has_pending_shuffle_join(a)
        j = a.join(b, join_type="inner", num_partitions=4, on=("k",))
        assert _has_pending_shuffle_join(j)
        assert not _has_pending_shuffle_join(j.materialize())
        # derived (map_batches) datasets still expose the pending join
        assert _has_pending_shuffle_join(
            j.map_batches(lambda t: t, batch_format="pyarrow"))
        # _shuffle_join breaks the chain: result contains ONE pending join
        c = rd.from_arrow(pa.table({"k": [1], "z": [9]}))
        jj = _shuffle_join(j, c, join_type="inner", num_partitions=4,
                           on=("k",))
        assert int(jj.count()) == 1  # completes (would deadlock unchained)


class TestJoinPartitionMemoryCap:
    """Regression: Ray 2.49 join aggregators reserve 7×block_size of the
    `memory` resource per partition; 64 partitions on a memory-squeezed VM
    (observed: stale tmpfs scratch) can exceed the cluster's memory
    resource and the join PENDS FOREVER. _join_partitions caps the count
    so the total reservation stays under half the memory resource."""

    def test_cap_tracks_cluster_memory(self, ray_session, monkeypatch):
        import ray as _ray

        from qwery_ray.sqlc import compiler as C

        blk = (C.rd.DataContext.get_current().target_max_block_size
               or 128 * 1024 * 1024)
        # plenty of memory → the 2-per-core default stands
        monkeypatch.setattr(_ray, "cluster_resources",
                            lambda: {"memory": 1000 * 7 * blk})
        assert C._join_partitions(32) == 64
        # squeezed memory → capped at 0.5 × mem / (7 × block)
        monkeypatch.setattr(_ray, "cluster_resources",
                            lambda: {"memory": 60 * 7 * blk})
        assert C._join_partitions(32) == 30
        # degenerate (cap < 4) → leave the default; Ray's own warning fires
        monkeypatch.setattr(_ray, "cluster_resources",
                            lambda: {"memory": 2 * 7 * blk})
        assert C._join_partitions(32) == 64


class TestUsingAndNaturalJoin:
    """JOIN … USING (cols) and NATURAL JOIN: keys resolved by shared name,
    ONE key column in the output (ANSI), DuckDB parity."""

    def _cmp(self, engine, duck, sql):
        import pandas as pd
        mine = engine.sql(sql).to_pandas()
        orc = duck.execute(sql).fetch_df()
        cols = sorted(mine.columns)
        pd.testing.assert_frame_equal(
            mine.reindex(cols, axis=1).sort_values(cols, ignore_index=True),
            orc.reindex(cols, axis=1).sort_values(cols, ignore_index=True),
            check_dtype=False)

    def test_using_inner(self, engine, duck):
        self._cmp(engine, duck,
                  "SELECT rk, COUNT(*) AS n FROM "
                  "(SELECT n_regionkey AS rk FROM nation) a JOIN "
                  "(SELECT r_regionkey AS rk, r_name FROM region) b "
                  "USING (rk) GROUP BY 1")

    def test_using_left_join_star_schema(self, engine, duck):
        self._cmp(engine, duck,
                  "SELECT * FROM (SELECT 1 AS k UNION ALL SELECT 99) a "
                  "LEFT JOIN (SELECT 1 AS k, 'x' AS v) b USING (k)")

    def test_natural_join(self, engine, duck):
        self._cmp(engine, duck,
                  "SELECT COUNT(*) AS n FROM "
                  "(SELECT n_regionkey AS rk FROM nation) a NATURAL JOIN "
                  "(SELECT r_regionkey AS rk, r_name FROM region) b")

    def test_using_missing_column_errors(self, engine):
        import pytest

        with pytest.raises(Exception, match="USING column"):
            engine.sql("SELECT COUNT(*) AS n FROM nation JOIN region "
                       "USING (nosuchcol)").to_pandas()

    def test_roundtrip(self):
        from qwery_ray.sqlc import parser as P
        from qwery_ray.sqlc.decompiler import to_sql

        for sql in ["SELECT a.x FROM t AS a INNER JOIN u AS b USING (k, j)",
                    "SELECT x FROM t NATURAL INNER JOIN u"]:
            stmt = P.parse(sql)[0]
            assert P.parse(to_sql(stmt))[0] == stmt
