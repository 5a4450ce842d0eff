"""Regression pins for bugs found by scripts/fuzz_vs_duckdb.py (the
grammar-based random-query differ vs DuckDB). Each test is the minimal
reproduction of a once-crashing / once-wrong shape.
"""
import duckdb
import pandas as pd
import pytest

from qwery_ray.engine.session import QweryEngine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sess(ray_session):
    return QweryEngine(table_root=SF)


def _df(res) -> pd.DataFrame:
    return res.to_pandas() if hasattr(res, "to_pandas") else res


class TestFuzzRegressions:
    def test_distinct_over_empty_filter_result(self, sess):
        # was: AttributeError 'NoneType' object has no attribute 'names' —
        # _distinct read schema() of a lazy pipeline whose filter removed
        # every row
        df = _df(sess.sql(
            "SELECT DISTINCT c_name AS c0 FROM customer "
            "WHERE c_name IN ('A', 'O')"))
        assert len(df) == 0 and list(df.columns) == ["c0"]

    def test_group_by_same_column_twice(self, sess):
        # was: pandas 'cannot insert c_mktsegment, already exists' — the
        # duplicated group key produced two identical key column names
        df = _df(sess.sql(
            "SELECT c_mktsegment AS k0, c_mktsegment AS k1, COUNT(*) AS n "
            "FROM customer GROUP BY 1, 2")).sort_values("k0",
                                                        ignore_index=True)
        ora = duckdb.sql(
            f"SELECT c_mktsegment AS k0, c_mktsegment AS k1, COUNT(*) AS n "
            f"FROM read_parquet('{SF}/customer.parquet') GROUP BY 1, 2 "
            f"ORDER BY k0").df()
        assert list(df.columns) == ["k0", "k1", "n"]
        assert (df["k0"] == df["k1"]).all()
        assert df["k0"].tolist() == ora["k0"].tolist()
        assert df["n"].astype("int64").tolist() == \
            ora["n"].astype("int64").tolist()

    def test_group_by_same_column_twice_distinct_aggs(self, sess):
        # duplicate keys AND duplicate COUNT(DISTINCT) aggregates together
        df = _df(sess.sql(
            "SELECT event_type AS k0, event_type AS k1, "
            "COUNT(DISTINCT user_id) AS a0, COUNT(DISTINCT user_id) AS a1, "
            "AVG(value) AS a2 FROM events GROUP BY 1, 2"))
        ora = duckdb.sql(
            f"SELECT event_type AS k0, COUNT(DISTINCT user_id) AS a0, "
            f"AVG(value) AS a2 "
            f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1").df()
        assert len(df) == len(ora)
        m = df.set_index("k0").sort_index()
        o = ora.set_index("k0").sort_index()
        assert (m["a0"].astype("int64") == m["a1"].astype("int64")).all()
        assert m["a0"].astype("int64").tolist() == \
            o["a0"].astype("int64").tolist()
        assert (m["a2"] - o["a2"]).abs().max() < 1e-9

    def test_group_by_duplicate_expression_key(self, sess):
        # same computed expression appearing as two keys
        df = _df(sess.sql(
            "SELECT CAST(user_id % 3 AS BIGINT) AS k0, "
            "CAST(user_id % 3 AS BIGINT) AS k1, COUNT(*) AS n "
            "FROM events GROUP BY 1, 2"))
        assert len(df) == 3 and (df["k0"] == df["k1"]).all()

    def test_rollup_with_repeated_key_still_works(self, sess):
        # dedup is skipped under grouping sets (masks are positional);
        # the plain ROLLUP path must stay intact
        df = _df(sess.sql(
            "SELECT c_mktsegment AS k0, COUNT(*) AS n "
            "FROM customer GROUP BY ROLLUP(1)"))
        assert len(df) == 6  # 5 segments + grand total

    def test_setop_empty_result_keeps_schema(self, sess):
        # was: EXCEPT/INTERSECT whose result is empty returned a frame with
        # NO columns (Ray drops zero-row blocks at materialize; the join's
        # anti-side emits zero-column blocks when everything matches)
        for q in (
            "SELECT o_orderstatus AS c0 FROM orders "
            "EXCEPT SELECT o_orderstatus AS c0 FROM orders",
            "SELECT c_mktsegment AS c0 FROM customer "
            "INTERSECT SELECT c_name AS c0 FROM customer",
        ):
            df = _df(sess.sql(q))
            assert len(df) == 0 and list(df.columns) == ["c0"], q

    def test_setop_empty_side_no_crash(self, sess):
        # was: an EMPTY side crashed Ray 2.49's hash-shuffle join
        # (HashShuffleAggregator.finalize ArrowInvalid)
        df = _df(sess.sql(
            "SELECT c_name AS c0 FROM customer WHERE c_nationkey IS NULL "
            "INTERSECT SELECT c_name AS c0 FROM customer"))
        assert len(df) == 0 and list(df.columns) == ["c0"]
        df = _df(sess.sql(
            "SELECT c_name AS c0 FROM customer WHERE c_nationkey IS NULL "
            "EXCEPT SELECT c_name AS c0 FROM customer"))
        assert len(df) == 0 and list(df.columns) == ["c0"]
        # empty RIGHT side: EXCEPT degenerates to DISTINCT(left)
        df = _df(sess.sql(
            "SELECT c_mktsegment AS c0 FROM customer EXCEPT "
            "SELECT c_name AS c0 FROM customer WHERE c_nationkey IS NULL"))
        assert len(df) == 5 and list(df.columns) == ["c0"]

    def test_setop_nonempty_still_correct(self, sess):
        df = _df(sess.sql(
            "SELECT o_orderstatus AS c0 FROM orders INTERSECT "
            "SELECT o_orderstatus AS c0 FROM orders WHERE o_orderkey < 50"))
        ora = duckdb.sql(
            f"SELECT o_orderstatus AS c0 FROM "
            f"read_parquet('{SF}/orders.parquet') INTERSECT "
            f"SELECT o_orderstatus AS c0 FROM "
            f"read_parquet('{SF}/orders.parquet') WHERE o_orderkey < 50").df()
        assert sorted(df["c0"]) == sorted(ora["c0"])

    def test_rollup_over_empty_input(self, sess):
        # was: AttributeError 'NoneType' has no attribute 'names' —
        # _compile_grouping_sets read schema() of an empty finest agg.
        # DuckDB parity: keyed sets emit 0 rows; each () set (present in
        # ROLLUP/CUBE) emits ONE grand-total row with COUNT=0 / SUM NULL.
        df = _df(sess.sql(
            "SELECT o_orderstatus AS k0, CAST(o_orderkey % 3 AS BIGINT) AS "
            "k1, COUNT(*) AS a0, SUM(CAST(o_totalprice AS DOUBLE)) AS a1 "
            "FROM orders WHERE o_orderkey < 0 "
            "GROUP BY ROLLUP(o_orderstatus, CAST(o_orderkey % 3 AS BIGINT))"))
        assert len(df) == 1
        assert df["k0"].isna().all() and df["k1"].isna().all()
        assert df["a0"].iloc[0] == 0 and pd.isna(df["a1"].iloc[0])
        # GROUPING SETS without a () set stays fully empty
        df = _df(sess.sql(
            "SELECT o_orderstatus AS k0, COUNT(*) AS a0 FROM orders "
            "WHERE o_orderkey < 0 GROUP BY GROUPING SETS((o_orderstatus))"))
        assert len(df) == 0 and list(df.columns) == ["k0", "a0"]

    def test_lpad_rpad_truncate(self, sess):
        # was: LPAD/RPAD only padded; DuckDB/Postgres truncate to the LEFT
        # w chars when the input is longer (lpad('3-MEDIUM',6)='3-MEDI')
        df = _df(sess.sql(
            "SELECT LPAD(o_orderpriority, 6, ' ') AS c0, "
            "RPAD(o_orderpriority, 3, '.') AS c1, "
            "LPAD('ab', 5, 'xy') AS c2, RPAD('ab', 5, 'xy') AS c3, "
            "LPAD('ab', 0, ' ') AS c4 "
            "FROM orders WHERE o_orderpriority = '3-MEDIUM' LIMIT 1"))
        assert list(df.iloc[0]) == ["3-MEDI", "3-M", "xyxab", "abxyx", ""]

    def test_var_samp_null_for_single_row_groups(self, sess):
        # was: CombinePartials clamped FP-negative variances with
        # pc.max_element_wise(var, 0.0), which SKIPS nulls — so the n==1
        # group's NULL VAR_SAMP/STDDEV_SAMP silently became 0.0
        df = _df(sess.sql(
            "SELECT o_orderstatus AS k0, VAR_SAMP(o_totalprice) AS v, "
            "STDDEV_SAMP(o_totalprice) AS s "
            "FROM (SELECT * FROM orders LIMIT 1) GROUP BY 1"))
        assert len(df) == 1
        assert pd.isna(df["v"].iloc[0]) and pd.isna(df["s"].iloc[0])
        # population variants of a single row are 0, not NULL
        df2 = _df(sess.sql(
            "SELECT VAR_POP(o_totalprice) AS v "
            "FROM (SELECT * FROM orders LIMIT 1)"))
        assert df2["v"].iloc[0] == 0.0

    def test_lag_lead_signed_literal_args(self, sess):
        # was: LAG(x, 2, -1) rejected — the -1 parses as UnaryOp(-, Literal)
        # and the compiler demanded a bare Literal for offset/default
        df = _df(sess.sql(
            "SELECT o_orderkey AS k, "
            "LAG(o_orderkey, 2, -1) OVER (ORDER BY o_orderkey) AS lg, "
            "LEAD(o_orderkey, +1, -7) OVER (ORDER BY o_orderkey) AS ld "
            "FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 3)"))
        df = df.sort_values("k", ignore_index=True)
        assert df["lg"].tolist()[:2] == [-1, -1]
        assert df["ld"].iloc[-1] == -7

    def test_rows_frame_exact_over_unique_key(self, sess):
        # pin: ROWS BETWEEN frames match DuckDB exactly when the ORDER BY
        # is a true total order (a fuzz "mismatch" on lineitem turned out
        # to be duplicate (l_orderkey, l_linenumber) sort keys — frames
        # over ties are legitimately nondeterministic, see UNIQUE_ORDER
        # note in scripts/fuzz_vs_duckdb.py)
        q = ("SELECT o_orderkey AS k, AVG(o_totalprice) OVER "
             "(PARTITION BY o_orderstatus ORDER BY o_orderkey "
             "ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING) AS w FROM orders")
        mine = _df(sess.sql(q)).sort_values("k", ignore_index=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{SF}/orders.parquet'")
        ora = con.execute(q + " ORDER BY k").df()
        assert len(mine) == len(ora)
        pd.testing.assert_series_equal(
            mine["w"].astype(float), ora["w"].astype(float),
            check_names=False, rtol=1e-9)

    def test_in_list_with_null_three_valued(self, sess):
        # was: NOT IN ('A','O',NULL) returned every row — the NULL item was
        # dropped from the value set and the result inverted; ANSI says the
        # predicate is never TRUE (match→FALSE, non-match→NULL)
        df = _df(sess.sql(
            "SELECT COUNT(*) AS a0 FROM orders "
            "WHERE o_orderpriority NOT IN ('A', 'O', NULL)"))
        assert df["a0"].iloc[0] == 0
        # positive IN with a NULL item still matches normally
        df2 = _df(sess.sql(
            "SELECT COUNT(*) AS a0 FROM orders "
            "WHERE o_orderpriority IN ('3-MEDIUM', NULL)"))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{SF}/orders.parquet'")
        exp = con.execute("SELECT COUNT(*) FROM orders WHERE "
                          "o_orderpriority IN ('3-MEDIUM', NULL)").fetchone()
        assert df2["a0"].iloc[0] == exp[0] > 0
        # projection position: non-match with NULL item projects NULL
        df3 = _df(sess.sql(
            "SELECT (o_orderpriority IN ('NOPE', NULL)) AS p, "
            "(o_orderpriority NOT IN ('NOPE', NULL)) AS np "
            "FROM orders LIMIT 1"))
        assert pd.isna(df3["p"].iloc[0]) and pd.isna(df3["np"].iloc[0])

    def test_correlated_scalar_subquery_in_select(self, sess):
        # was: EvalError "scalar subquery must be resolved by the compiler"
        # — correlated scalar subqueries in the SELECT list now decorrelate
        # into a LEFT JOIN against the grouped subquery, with COUNT's
        # empty-group 0 restored via COALESCE
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{SF}/orders.parquet'")
        con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                    f"'{SF}/customer.parquet'")
        for q in [
            "SELECT c_custkey AS k0, (SELECT MAX(o_orderkey) FROM orders "
            "WHERE o_custkey = c_custkey) AS s0 FROM customer "
            "WHERE c_custkey < 61 ORDER BY k0",
            # COUNT over an empty group is 0, and arithmetic on top works
            "SELECT c_custkey AS k0, (SELECT COUNT(*) + 1 FROM orders "
            "WHERE o_custkey = c_custkey AND o_orderkey % 7 = 0) AS s0 "
            "FROM customer WHERE c_custkey < 74 ORDER BY k0",
            # SUM over an empty group stays NULL
            "SELECT c_custkey AS k0, (SELECT SUM(CAST(o_totalprice AS "
            "DOUBLE)) FROM orders WHERE o_custkey = c_custkey) AS s0 "
            "FROM customer WHERE c_custkey < 40 ORDER BY k0",
            # two independent subqueries in one item list
            "SELECT c_custkey AS k0, (SELECT COUNT(*) FROM orders WHERE "
            "o_custkey = c_custkey) AS s0, (SELECT MIN(o_orderkey) FROM "
            "orders WHERE o_custkey = c_custkey) AS s1 FROM customer "
            "WHERE c_custkey < 40 ORDER BY k0",
        ]:
            mine = _df(sess.sql(q)).reset_index(drop=True)
            ora = con.execute(q).df()
            assert len(mine) == len(ora), q
            for c in mine.columns:
                a = mine[c].astype(float)
                b = ora[c].astype(float)
                pd.testing.assert_series_equal(
                    a, b, check_names=False, rtol=1e-9), q

    def test_setop_with_empty_union_arm(self, sess):
        # was: ArrowInvalid "No match or multiple matches for key field
        # __nf0" — a union arm whose filter dropped every row leaves
        # ZERO-COLUMN empty blocks (Ray 2.49 skips map UDFs on empty
        # blocks), which crashed the hash-shuffle join behind EXCEPT;
        # _drop_empty_blocks now strips them from materialized join inputs
        df = _df(sess.sql(
            "SELECT c0 FROM (SELECT o_orderstatus AS c0 FROM orders "
            "WHERE o_orderkey < 0 UNION ALL SELECT o_orderstatus AS c0 "
            "FROM orders) u EXCEPT SELECT o_orderstatus AS c0 FROM orders"))
        assert len(df) == 0 and list(df.columns) == ["c0"]
        df2 = _df(sess.sql(
            "SELECT c0 FROM (SELECT o_orderstatus AS c0 FROM orders "
            "WHERE o_orderkey < 0 UNION ALL SELECT o_orderstatus AS c0 "
            "FROM orders) u INTERSECT SELECT o_orderstatus AS c0 "
            "FROM orders"))
        assert sorted(df2["c0"]) == ["F", "O", "P"]

    def test_date_part_extended_parts(self, sess):
        # was: EvalError "unsupported DATE_PART part 'doy'" — week/doy/
        # quarter/isodow/decade/century/millennium now implemented with
        # DuckDB/Postgres semantics (week = ISO-8601, century of 2026 = 21)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{SF}/orders.parquet'")
        q = ("SELECT DATE_PART('doy', o_orderdate) AS c0, "
             "EXTRACT(week FROM o_orderdate) AS c1, "
             "DATE_PART('quarter', o_orderdate) AS c2, "
             "DATE_PART('isodow', o_orderdate) AS c3, "
             "DATE_PART('decade', o_orderdate) AS c4, "
             "DATE_PART('century', o_orderdate) AS c5, "
             "DATE_PART('millennium', o_orderdate) AS c6, "
             "EXTRACT(dow FROM o_orderdate) AS c7, COUNT(*) AS a0 "
             "FROM orders GROUP BY 1,2,3,4,5,6,7,8 "
             "ORDER BY 1,2,3,4,5,6,7,8")
        mine = _df(sess.sql(q)).reset_index(drop=True)
        ora = con.execute(q).df()
        assert len(mine) == len(ora)
        for c in mine.columns:
            assert (mine[c].astype(float).to_numpy()
                    == ora[c].astype(float).to_numpy()).all(), c

    def test_dml_preserves_int_column_type_with_nulls(self, sess, tmp_path):
        # was: UPSERT/keyed-UPDATE round-tripped the target through plain
        # to_pandas(), so an int64 column containing any NULL came back
        # float64 and the rewrite silently flipped the FILE's column type
        # to double — the next INSERT append then failed schema unification
        # (found by scripts/fuzz_dml_vs_duckdb.py)
        import pyarrow as pa
        import pyarrow.parquet as pq
        p = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({
            "k": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([10, None, 30], pa.int64()),
        }), p)
        sess.sql(f"UPSERT INTO '{p}' (k, v) VALUES (2, 20) VALUES (4, 40) "
                 "KEYED ON k")
        assert pq.read_schema(p).field("v").type == pa.int64()
        # append against the original schema must still work
        sess.sql(f"INSERT INTO '{p}' (k, v) VALUES (5, NULL)")
        t = pq.read_table(p)
        assert t.schema.field("v").type == pa.int64()
        got = dict(zip(t.column("k").to_pylist(), t.column("v").to_pylist()))
        assert got == {1: 10, 2: 20, 3: 30, 4: 40, 5: None}

    def test_insert_additive_schema_evolution(self, sess, tmp_path):
        # was: INSERT with a column the target lacks failed Table.cast
        # ("field names are not matching"); appends now null-backfill new
        # columns on either side (lake-engine additive-evolution parity)
        import pyarrow as pa
        import pyarrow.parquet as pq
        p = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "v": pa.array([10, 20], pa.int64())}), p)
        sess.sql(f"INSERT INTO '{p}' (k, v, w) VALUES (3, 30, 'new')")
        t = pq.read_table(p)
        assert t.column_names == ["k", "v", "w"]
        assert t.column("w").to_pylist() == [None, None, "new"]
        sess.sql(f"INSERT INTO '{p}' (k) VALUES (4)")
        t = pq.read_table(p)
        assert t.column("v").to_pylist() == [10, 20, 30, None]
        assert t.schema.field("v").type == pa.int64()

    def test_covar_constant_column_exact_zero(self, sess):
        # was: COVAR_POP over a constant x leaked ~1e-9 cancellation
        # residue from the raw-moment formula; a zero-variance side now
        # forces covariance to exactly 0 (DuckDB Welford parity)
        df = _df(sess.sql(
            "SELECT o_orderpriority AS k0, "
            "COVAR_POP(CAST(o_totalprice AS DOUBLE), "
            "CAST(o_custkey AS DOUBLE)) AS a0 "
            "FROM orders WHERE o_custkey BETWEEN 47 AND 47 GROUP BY 1"))
        assert (df["a0"].dropna() == 0.0).all()

    def test_insert_numeric_widening_append(self, sess, tmp_path):
        # int32/float32 file + int64/double insert: the append widens the
        # file's columns (permissive promotion) instead of failing
        import pyarrow as pa
        import pyarrow.parquet as pq
        p = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({
            "k": pa.array([1, 2], pa.int32()),
            "v": pa.array([1.5, 2.5], pa.float32())}), p)
        sess.sql(f"INSERT INTO '{p}' (k, v) VALUES (3, 3.5)")
        t = pq.read_table(p)
        assert t.schema.field("k").type == pa.int64()
        assert t.schema.field("v").type == pa.float64()
        assert t.column("k").to_pylist() == [1, 2, 3]


class TestNestedExistsAndBooleanCase:
    """r5 fuzz finds (extended grammar, r4 verdict item 5): CASE THEN/ELSE
    results could not be boolean-valued, and correlated [NOT] EXISTS
    nested inside CASE (SELECT list or WHERE) failed to compile."""

    def _duck(self):
        con = duckdb.connect()
        for t in ("customer", "orders"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        return con

    def _both(self, sess, q):
        mine = _df(sess.sql(q)).reset_index(drop=True)
        ora = self._duck().execute(q).df().reset_index(drop=True)
        ora.columns = [c.lower() for c in ora.columns]
        assert len(mine) == len(ora)
        for c in mine.columns:
            a = mine[c].where(mine[c].notna(), None).astype(object)
            e = ora[c].where(ora[c].notna(), None).astype(object)
            assert (a.to_numpy() == e.to_numpy()).all() or \
                all((x is None and y is None) or x == y
                    for x, y in zip(a, e)), f"col {c}"
        return mine

    def test_boolean_then_result(self, sess):
        # was: ParseError "expected 'END' ... got '>'"
        self._both(sess, (
            "SELECT c_custkey AS c0, CASE WHEN c_nationkey % 2 = 0 "
            "THEN c_acctbal > 0 ELSE c_acctbal < 0 END AS c1 "
            "FROM customer ORDER BY c0"))

    def test_correlated_exists_in_select_case(self, sess):
        # was: EvalError via ProjectBatch (Exists unresolved in projection)
        out = self._both(sess, (
            "SELECT c_custkey AS c0, CASE WHEN EXISTS (SELECT 1 FROM "
            "orders WHERE o_custkey = c_custkey AND o_totalprice > 450000) "
            "THEN 1 ELSE 0 END AS c1 FROM customer ORDER BY c0"))
        assert set(out.c1.unique()) == {0, 1}  # both branches exercised

    def test_not_exists_multiarm_case_in_select(self, sess):
        self._both(sess, (
            "SELECT c_custkey AS c0, CASE WHEN NOT EXISTS (SELECT 1 FROM "
            "orders WHERE o_custkey = c_custkey AND o_totalprice > 55022) "
            "THEN 1 WHEN c_acctbal < -168 THEN 2 ELSE 0 END AS c1 "
            "FROM customer ORDER BY c0"))

    def test_exists_inside_where_case(self, sess):
        # was: ParseError (boolean THEN) + unresolved Exists in FilterBatch
        self._both(sess, (
            "SELECT c_custkey AS c0, c_nationkey AS c1 FROM customer "
            "WHERE CASE WHEN NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey AND o_totalprice > 28259) "
            "THEN c_acctbal > 1083 ELSE c_nationkey % 2 = 0 END "
            "ORDER BY c0"))

    def test_exists_under_or_in_where(self, sess):
        # EXISTS below a top-level OR (not a conjunct): same rewrite path
        self._both(sess, (
            "SELECT c_custkey AS c0 FROM customer WHERE c_acctbal < -900 "
            "OR EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_totalprice > 300000) ORDER BY c0"))

    def test_uncorrelated_exists_in_case_folds(self, sess):
        # uncorrelated nested EXISTS folds to a literal, not an error
        out = self._both(sess, (
            "SELECT c_custkey AS c0, CASE WHEN EXISTS (SELECT 1 FROM "
            "orders WHERE o_totalprice > 1000000000) THEN 1 ELSE 0 END "
            "AS c1 FROM customer ORDER BY c0"))
        assert (out.c1 == 0).all()

    def test_setop_over_window_outputs(self, sess):
        # set ops whose arms are window outputs (extended grammar shape)
        arm = ("SELECT CAST(o_custkey AS BIGINT) AS a, "
               "CAST(row_number() OVER (PARTITION BY o_orderstatus "
               "ORDER BY o_orderkey) AS BIGINT) AS b FROM orders "
               "WHERE o_totalprice > {th}")
        mine = _df(sess.sql(
            f"SELECT * FROM ({arm.format(th=50000)}) x INTERSECT "
            f"SELECT * FROM ({arm.format(th=100000)}) y"))
        ora = self._duck().execute(
            f"SELECT * FROM ({arm.format(th=50000)}) x INTERSECT "
            f"SELECT * FROM ({arm.format(th=100000)}) y").df()
        a = mine.sort_values(["a", "b"], ignore_index=True)
        e = ora.sort_values(["a", "b"], ignore_index=True)
        assert a.a.tolist() == e.a.tolist()
        assert a.b.tolist() == e.b.tolist()


class TestUpsertKeepsEvolvedColumns:
    """r5 DML-fuzz find: an UPSERT whose incoming keys replace EVERY
    surviving row must still keep the file's evolved columns (the
    empty-survivor frame contributes schema, not rows)."""

    def test_full_replacement_keeps_columns(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from qwery_ray import QweryEngine

        p = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({"k": [1, 2], "v": [10, 20],
                                 "x1": [7, 8]}), p)
        eng = QweryEngine(table_root=str(tmp_path))
        eng.sql(f"UPSERT INTO '{p}' (k, v) VALUES (1, 100) VALUES (2, 200) "
                f"KEYED ON k")
        back = pq.read_table(p).to_pandas().sort_values("k")
        assert list(back.columns) == ["k", "v", "x1"]
        assert back.v.tolist() == [100, 200]
        assert back.x1.isna().all()  # replaced rows never had x1

    def test_empty_target_merge_keeps_schema(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from qwery_ray import QweryEngine

        p = str(tmp_path / "e.parquet")
        pq.write_table(pa.table({"k": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.string())}), p)
        eng = QweryEngine(table_root=str(tmp_path))
        eng.sql(f"MERGE INTO '{p}' AS tg USING (SELECT * FROM (VALUES "
                f"(5, 50)) s(k, v)) AS sr ON tg.k = sr.k "
                f"WHEN NOT MATCHED THEN INSERT (k, v) VALUES (sr.k, sr.v)")
        back = pq.read_table(p).to_pandas()
        assert list(back.columns) == ["k", "v", "w"]
        assert back.k.tolist() == [5]
        assert back.w.isna().all()


class TestHavingExists:
    """r5: [NOT] EXISTS / subquery-bearing CASE in HAVING — deferred past
    PostAgg and decorrelated against the aggregated frame; standard-form
    correlation (… = c_nationkey) rebinds to the output alias."""

    def _both(self, sess, q):
        con = duckdb.connect()
        for t in ("customer", "nation"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        mine = _df(sess.sql(q)).reset_index(drop=True)
        ora = con.execute(q).df().reset_index(drop=True)
        ora.columns = [c.lower() for c in ora.columns]
        assert list(mine.columns) == list(ora.columns)
        for c in mine.columns:
            assert mine[c].tolist() == ora[c].tolist(), c
        return mine

    def test_having_exists_std_correlation(self, sess):
        out = self._both(sess, (
            "SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM customer GROUP BY 1 HAVING EXISTS (SELECT 1 FROM nation "
            "WHERE n_nationkey = c_nationkey AND n_regionkey = 0) "
            "ORDER BY k"))
        assert len(out) > 0

    def test_having_not_exists(self, sess):
        self._both(sess, (
            "SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM customer GROUP BY 1 HAVING NOT EXISTS (SELECT 1 FROM "
            "nation WHERE n_nationkey = c_nationkey AND n_regionkey <= 1) "
            "ORDER BY k"))

    def test_having_case_exists_with_agg(self, sess):
        # CASE mixing an EXISTS branch with aggregate comparisons: the
        # raw result columns survive the projection for the deferred
        # filter, then drop (schema must stay clean)
        out = self._both(sess, (
            "SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM customer GROUP BY 1 HAVING CASE WHEN EXISTS "
            "(SELECT 1 FROM nation WHERE n_nationkey = c_nationkey AND "
            "n_regionkey = 0) THEN COUNT(*) > 2 ELSE COUNT(*) > 5 END "
            "ORDER BY k"))
        assert list(out.columns) == ["k", "n"]

    def test_having_exists_alias_correlation_superset(self, sess):
        # correlation via the OUTPUT alias — a superset DuckDB rejects
        # ("cannot reference alias in correlated subquery"); equals the
        # standard form's result
        a = _df(sess.sql(
            "SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM customer GROUP BY 1 HAVING EXISTS (SELECT 1 FROM nation "
            "WHERE n_nationkey = k AND n_regionkey = 0) ORDER BY k"))
        b = _df(sess.sql(
            "SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM customer GROUP BY 1 HAVING EXISTS (SELECT 1 FROM nation "
            "WHERE n_nationkey = c_nationkey AND n_regionkey = 0) "
            "ORDER BY k"))
        assert a.k.tolist() == b.k.tolist()
        assert a.n.tolist() == b.n.tolist()

    def test_having_exists_group_col_not_in_output(self, sess):
        # GROUP BY column absent from the SELECT list: the raw key column
        # rides PostAgg keep_cols for the decorrelation, then drops
        out = self._both(sess, (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer "
            "GROUP BY c_nationkey HAVING EXISTS (SELECT 1 FROM nation "
            "WHERE n_nationkey = c_nationkey AND n_regionkey = 0) "
            "ORDER BY n"))
        assert list(out.columns) == ["n"]

    def test_having_exists_qualified_correlation(self, sess):
        # ANSI-valid table-qualified outer ref inside the HAVING subquery
        out = self._both(sess, (
            "SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM customer GROUP BY 1 HAVING EXISTS (SELECT 1 FROM nation "
            "WHERE n_nationkey = customer.c_nationkey AND "
            "n_regionkey = 0) ORDER BY k"))
        assert len(out) > 0
