"""ASOF [LEFT] JOIN parity vs DuckDB (reference has equi-INNER only,
Join.scala:10-37 — ASOF is a time-series/training-pipeline superset,
SURVEY.md §2.5). DuckDB's ASOF JOIN is the semantics oracle."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import assert_frames_match


def run_both(engine, duck, my_sql, duck_sql=None):
    mine = engine.sql(my_sql)
    oracle = duck.execute(duck_sql or my_sql).fetch_df()
    assert_frames_match(mine, oracle)
    return mine


@pytest.fixture(scope="module")
def asof_files(tmp_path_factory):
    """trades/quotes with null keys and an unmatched symbol on each side.
    NULL ordering values are exercised in test_null_ordering_semantics
    WITHOUT the oracle: DuckDB 1.0.0's ASOF gives contradictory matches for
    NULL inequality operands (inner and left variants disagree); this engine
    pins SQL comparison semantics — a NULL ordering value never matches."""
    d = tmp_path_factory.mktemp("asof")
    trades = pa.table({
        "sym": ["a", "a", "a", "b", "b", "c", None],
        "t": [3, 10, 1, 5, 1, 7, 4],
        "qty": [1, 2, 3, 4, 5, 6, 7],
    })
    quotes = pa.table({
        "sym": ["a", "a", "b", "x", None],
        "qt": [2, 9, 6, 1, 3],
        "px": [1.5, 2.5, 3.5, 9.9, 0.1],
    })
    pq.write_table(trades, str(d / "trades.parquet"))
    pq.write_table(quotes, str(d / "quotes.parquet"))
    return str(d / "trades.parquet"), str(d / "quotes.parquet")


@pytest.fixture()
def duck2(asof_files):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW trades AS SELECT * FROM '{asof_files[0]}'")
    con.execute(f"CREATE VIEW quotes AS SELECT * FROM '{asof_files[1]}'")
    yield con
    con.close()


class TestAsofJoin:
    @pytest.mark.parametrize("op", [">=", ">", "<=", "<"])
    def test_inner_all_ops(self, engine, duck2, asof_files, op):
        tr, q = asof_files
        run_both(engine, duck2,
                 f"SELECT tr.sym, tr.t, tr.qty, q.qt, q.px FROM '{tr}' tr "
                 f"ASOF JOIN '{q}' q ON tr.sym = q.sym AND tr.t {op} q.qt",
                 f"SELECT tr.sym, tr.t, tr.qty, q.qt, q.px FROM trades tr "
                 f"ASOF JOIN quotes q ON tr.sym = q.sym AND tr.t {op} q.qt")

    @pytest.mark.parametrize("op", [">=", "<"])
    def test_left_null_extension(self, engine, duck2, asof_files, op):
        tr, q = asof_files
        run_both(engine, duck2,
                 f"SELECT tr.sym, tr.t, tr.qty, q.qt, q.px FROM '{tr}' tr "
                 f"ASOF LEFT JOIN '{q}' q ON tr.sym = q.sym AND tr.t {op} q.qt",
                 f"SELECT tr.sym, tr.t, tr.qty, q.qt, q.px FROM trades tr "
                 f"ASOF LEFT JOIN quotes q ON tr.sym = q.sym AND tr.t {op} q.qt")

    def test_flipped_inequality(self, engine, duck2, asof_files):
        # written right-side-first: q.qt <= tr.t ≡ tr.t >= q.qt
        tr, q = asof_files
        run_both(engine, duck2,
                 f"SELECT tr.sym, tr.t, q.px FROM '{tr}' tr "
                 f"ASOF JOIN '{q}' q ON tr.sym = q.sym AND q.qt <= tr.t",
                 "SELECT tr.sym, tr.t, q.px FROM trades tr "
                 "ASOF JOIN quotes q ON tr.sym = q.sym AND q.qt <= tr.t")

    def test_select_star_collisions(self, engine, duck2, asof_files):
        # every right column survives (both ordering columns in the output)
        tr, q = asof_files
        mine = engine.sql(
            f"SELECT * FROM '{tr}' tr ASOF JOIN '{q}' q "
            f"ON tr.sym = q.sym AND tr.t >= q.qt").to_pandas()
        oracle = duck2.execute(
            "SELECT tr.*, q.sym AS \"q.sym\", q.qt, q.px FROM trades tr "
            "ASOF JOIN quotes q ON tr.sym = q.sym AND tr.t >= q.qt").df()
        assert_frames_match(mine, oracle)

    def test_timestamp_ordering_broadcast(self, engine, duck):
        # plain table right side → known row count → broadcast path;
        # date32 left ordering vs timestamp[us] right ordering
        run_both(engine, duck,
                 "SELECT o.o_orderkey, o.o_custkey, e.event_id, e.ts "
                 "FROM orders o ASOF JOIN events e "
                 "ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts")

    def test_subquery_sides_shuffle_path(self, engine, duck):
        # subquery right side → unknown row estimate → bucket-shuffle path
        run_both(engine, duck,
                 "SELECT p.event_id, p.user_id, p.ts, "
                 "c.event_id AS click_id, c.ts AS click_ts "
                 "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
                 "ASOF LEFT JOIN "
                 "(SELECT * FROM events WHERE event_type = 'click') c "
                 "ON p.user_id = c.user_id AND p.ts >= c.ts")

    def test_multi_key(self, engine, duck):
        run_both(engine, duck,
                 "SELECT a.event_id, a.ts, b.event_id AS prev_id "
                 "FROM events a ASOF JOIN events b "
                 "ON a.user_id = b.user_id AND a.event_type = b.event_type "
                 "AND a.ts > b.ts")

    def test_downstream_aggregate(self, engine, duck):
        # ASOF output feeds a GROUP BY (empty bucket blocks must not poison
        # the downstream schema)
        run_both(engine, duck,
                 "SELECT e.event_type, COUNT(*) AS n, SUM(o.o_totalprice) AS total "
                 "FROM orders o ASOF JOIN events e "
                 "ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts "
                 "GROUP BY e.event_type")

    def test_null_ordering_semantics(self, engine, tmp_path):
        # engine-defined (no oracle): NULL ordering values never match —
        # dropped by ASOF JOIN, null-extended by ASOF LEFT JOIN
        lt = pa.table({"k": ["a", "a"], "t": [5, None], "v": [1, 2]})
        rt = pa.table({"k": ["a", "a"], "rt": [3, None], "px": [1.0, 9.0]})
        pq.write_table(lt, str(tmp_path / "l.parquet"))
        pq.write_table(rt, str(tmp_path / "r.parquet"))
        inner = engine.sql(
            f"SELECT l.v, r.px FROM '{tmp_path}/l.parquet' l ASOF JOIN "
            f"'{tmp_path}/r.parquet' r ON l.k = r.k AND l.t >= r.rt"
        ).to_pandas()
        assert inner.to_dict("records") == [{"v": 1, "px": 1.0}]
        left = engine.sql(
            f"SELECT l.v, r.px FROM '{tmp_path}/l.parquet' l ASOF LEFT JOIN "
            f"'{tmp_path}/r.parquet' r ON l.k = r.k AND l.t >= r.rt"
        ).to_pandas().sort_values("v", ignore_index=True)
        assert left["v"].tolist() == [1, 2]
        assert left["px"].tolist()[0] == 1.0
        assert left["px"].isna().tolist() == [False, True]

    def test_requires_inequality(self, engine, asof_files):
        tr, q = asof_files
        with pytest.raises(Exception, match="(?i)asof"):
            engine.sql(f"SELECT * FROM '{tr}' tr ASOF JOIN '{q}' q "
                       f"ON tr.sym = q.sym")

    def test_rejects_two_inequalities(self, engine, asof_files):
        tr, q = asof_files
        with pytest.raises(Exception, match="(?i)asof"):
            engine.sql(f"SELECT * FROM '{tr}' tr ASOF JOIN '{q}' q "
                       f"ON tr.sym = q.sym AND tr.t >= q.qt AND tr.t < q.px")

    def test_decompile_round_trip(self, engine):
        from qwery_ray.sqlc import parser as P
        from qwery_ray.sqlc.decompiler import to_sql

        sql = ("SELECT tr.sym FROM 'x.parquet' tr ASOF LEFT JOIN "
               "'y.parquet' q ON tr.sym = q.sym AND tr.t >= q.qt")
        stmt = P.parse(sql)[0]
        again = P.parse(to_sql(stmt))[0]
        assert stmt == again


class TestAsofFuzz:
    """Random-table ASOF parity vs DuckDB (non-null, duplicate-free ordering
    values per key — the domain where DuckDB 1.0 ASOF is well-defined)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(op=st.sampled_from([">=", ">", "<=", "<"]),
           left_variant=st.booleans(),
           seed=st.integers(0, 10_000))
    def test_random_tables(self, engine, tmp_path_factory, op,
                           left_variant, seed):
        import duckdb
        import numpy as np

        rng = np.random.default_rng(seed)
        nl, nr = int(rng.integers(1, 120)), int(rng.integers(1, 80))
        d = tmp_path_factory.mktemp("asoffuzz")
        # unique ordering values per side avoid DuckDB tie-pick ambiguity
        lt = pa.table({
            "k": rng.integers(0, 5, nl),
            "t": rng.choice(np.arange(500), nl, replace=False),
            "v": rng.integers(0, 1000, nl),
        })
        rt = pa.table({
            "k": rng.integers(0, 6, nr),
            "rt": rng.choice(np.arange(500), nr, replace=False),
            "px": np.round(rng.standard_normal(nr), 3),
        })
        pq.write_table(lt, str(d / "l.parquet"))
        pq.write_table(rt, str(d / "r.parquet"))
        jt = "ASOF LEFT JOIN" if left_variant else "ASOF JOIN"
        sql = (f"SELECT l.k, l.t, l.v, r.rt, r.px FROM '{d}/l.parquet' l "
               f"{jt} '{d}/r.parquet' r ON l.k = r.k AND l.t {op} r.rt")
        mine = engine.sql(sql)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW l AS SELECT * FROM '{d}/l.parquet'")
        con.execute(f"CREATE VIEW r AS SELECT * FROM '{d}/r.parquet'")
        oracle = con.execute(
            f"SELECT l.k, l.t, l.v, r.rt, r.px FROM l {jt} r "
            f"ON l.k = r.k AND l.t {op} r.rt").df()
        con.close()
        assert_frames_match(mine, oracle)
