"""Property-based WHOLE-QUERY parity: random filters/aggregations compiled by
the engine must match DuckDB on the same parquet table (includes NULLs)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conftest import assert_frames_match


@pytest.fixture(scope="module")
def fuzz_table(ray_session, tmp_path_factory):
    """Seeded table with ints, floats, strings, NULLs and a low-card key."""
    rng = np.random.default_rng(123)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),
        "i": rng.integers(-100, 100, n).astype("float64"),
        "f": np.round(rng.standard_normal(n) * 50, 3),
        "s": rng.choice(["alpha", "beta", "gamma", "delta", None], n,
                        p=[0.3, 0.3, 0.2, 0.15, 0.05]),
    })
    df.loc[rng.choice(n, 100, replace=False), "i"] = None
    d = tmp_path_factory.mktemp("fuzz")
    path = os.path.join(str(d), "fuzz.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    return str(d), path


NUM_COLS = ["i", "f", "k"]
OPS = ["<", "<=", ">", ">=", "=", "!="]


@st.composite
def where_clause(draw, depth=0):
    col = draw(st.sampled_from(NUM_COLS))
    op = draw(st.sampled_from(OPS))
    val = draw(st.integers(min_value=-60, max_value=60))
    base = f"{col} {op} {val}"
    if depth < 2 and draw(st.booleans()):
        conj = draw(st.sampled_from(["AND", "OR"]))
        return f"({base} {conj} {draw(where_clause(depth=depth + 1))})"
    return base


class TestQueryFuzz:
    @settings(max_examples=25, deadline=None)
    @given(where_clause())
    def test_filter_count_parity(self, wc):
        sf_dir, path = self._fixture
        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root=sf_dir)
        sql = f"SELECT COUNT(*) AS n, SUM(k) AS sk FROM fuzz WHERE {wc}"
        mine = eng.sql(sql).to_pandas()
        oracle = duckdb.sql(
            f"SELECT COUNT(*) AS n, CAST(SUM(k) AS DOUBLE) AS sk FROM "
            f"'{path}' WHERE {wc}").df()
        mine["sk"] = mine["sk"].astype("float64")
        assert_frames_match(mine, oracle)

    @settings(max_examples=15, deadline=None)
    @given(where_clause(), st.sampled_from(["i", "f"]))
    def test_grouped_agg_parity(self, wc, agg_col):
        sf_dir, path = self._fixture
        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root=sf_dir)
        sql = (f"SELECT k, COUNT(*) AS n, AVG({agg_col}) AS avg_v, "
               f"MIN({agg_col}) AS min_v, MAX({agg_col}) AS max_v "
               f"FROM fuzz WHERE {wc} GROUP BY k")
        mine = eng.sql(sql).to_pandas()
        oracle = duckdb.sql(sql.replace("FROM fuzz", f"FROM '{path}'")).df()
        assert_frames_match(mine, oracle)

    @pytest.fixture(autouse=True)
    def _bind(self, fuzz_table):
        type(self)._fixture = fuzz_table


@pytest.fixture(scope="module")
def fuzz_table_rid(ray_session, tmp_path_factory):
    """Fuzz table with a unique row id (deterministic window ordering)."""
    rng = np.random.default_rng(321)
    n = 1500
    df = pd.DataFrame({
        "rid": np.arange(n),
        "k": rng.integers(0, 6, n),
        "i": rng.integers(-50, 50, n).astype("float64"),
        "f": np.round(rng.standard_normal(n) * 20, 2),
    })
    df.loc[rng.choice(n, 80, replace=False), "i"] = None
    d = tmp_path_factory.mktemp("wfuzz")
    path = os.path.join(str(d), "wf.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    return str(d), path


WIN_FNS = ["ROW_NUMBER()", "RANK()", "DENSE_RANK()", "SUM(f)", "AVG(f)",
           "MIN(i)", "MAX(i)", "COUNT(i)", "LAG(f)", "LEAD(f, 2)",
           "NTILE(3)", "PERCENT_RANK()", "CUME_DIST()"]


class TestWindowFuzz:
    @settings(max_examples=20, deadline=None)
    @given(st.sampled_from(WIN_FNS), st.booleans(), st.booleans(),
           st.sampled_from(["rid", "f, rid", "i, rid"]))
    def test_window_parity(self, fn, partition, desc, okeys):
        sf_dir, path = self._fixture
        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root=sf_dir)
        over = []
        if partition:
            over.append("PARTITION BY k")
        direction = " DESC" if desc else ""
        ob = ", ".join(c + direction for c in okeys.split(", "))
        over.append(f"ORDER BY {ob}")
        sql = (f"SELECT rid, {fn} OVER ({' '.join(over)}) AS w "
               f"FROM wf")
        mine = eng.sql(sql).to_pandas()
        oracle = duckdb.sql(sql.replace("FROM wf", f"FROM '{path}'")).df()
        mine = mine.sort_values("rid", ignore_index=True)
        oracle = oracle.sort_values("rid", ignore_index=True)
        a = mine["w"].to_numpy(dtype="float64", na_value=np.nan)
        b = oracle["w"].to_numpy(dtype="float64", na_value=np.nan)
        assert np.allclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True), \
            sql

    @pytest.fixture(autouse=True)
    def _bind_w(self, fuzz_table_rid):
        type(self)._fixture = fuzz_table_rid


class TestRangeFrameFuzz:
    """RANGE offset frames vs DuckDB: random aggregate x bounds x direction
    over a numeric order key with ties and NULL keys (nulls form one peer
    group; peers share frames)."""

    @settings(max_examples=20, deadline=None)
    @given(st.sampled_from(["SUM(f)", "AVG(f)", "MIN(f)", "MAX(f)",
                            "COUNT(f)"]),
           st.booleans(),
           st.sampled_from([(-3, 0), (-5, 5), (0, None), (None, 2),
                            (-2, -1), (1, 4)]),
           st.booleans())
    def test_range_frame_parity(self, fn, partition, bounds, desc):
        sf_dir, path = self._fixture
        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root=sf_dir)
        lo, hi = bounds

        def b(v, low):
            if v is None:
                return "UNBOUNDED PRECEDING" if low else \
                    "UNBOUNDED FOLLOWING"
            if v == 0:
                return "CURRENT ROW"
            return f"{-v} PRECEDING" if v < 0 else f"{v} FOLLOWING"

        over = (["PARTITION BY k"] if partition else []) + [
            f"ORDER BY i{' DESC' if desc else ''}",
            f"RANGE BETWEEN {b(lo, True)} AND {b(hi, False)}"]
        sql = (f"SELECT rid, {fn} OVER ({' '.join(over)}) AS w FROM wf")
        mine = eng.sql(sql).to_pandas()
        oracle = duckdb.sql(sql.replace("FROM wf", f"FROM '{path}'")).df()
        mine = mine.sort_values("rid", ignore_index=True)
        oracle = oracle.sort_values("rid", ignore_index=True)
        a = mine["w"].to_numpy(dtype="float64", na_value=np.nan)
        b_ = oracle["w"].to_numpy(dtype="float64", na_value=np.nan)
        assert np.allclose(a, b_, rtol=1e-9, atol=1e-12, equal_nan=True), \
            sql

    @pytest.fixture(autouse=True)
    def _bind_rf(self, fuzz_table_rid):
        type(self)._fixture = fuzz_table_rid


@pytest.fixture(scope="module")
def join_tables(ray_session, tmp_path_factory):
    rng = np.random.default_rng(77)
    d = tmp_path_factory.mktemp("jfuzz")
    lt = pd.DataFrame({
        "k": rng.choice([1, 2, 3, 4, 5, 6, None], 120,
                        p=[.2, .2, .15, .15, .1, .1, .1]),
        "a": rng.integers(0, 100, 120).astype("float64"),
    })
    rt = pd.DataFrame({
        "k": rng.choice([2, 3, 4, 7, 8, None], 90,
                        p=[.25, .2, .2, .15, .1, .1]),
        "v": rng.integers(0, 100, 90).astype("float64"),
    })
    pq.write_table(pa.Table.from_pandas(lt, preserve_index=False),
                   os.path.join(str(d), "lt.parquet"))
    pq.write_table(pa.Table.from_pandas(rt, preserve_index=False),
                   os.path.join(str(d), "rt.parquet"))
    return str(d)


class TestJoinFuzz:
    """Randomized join parity vs DuckDB: all join types, NULL keys, and
    non-equi ON residuals (residual-before-null-extension semantics)."""

    @settings(max_examples=26, deadline=None)
    @given(st.sampled_from(["INNER", "LEFT", "RIGHT", "FULL",
                            "SEMI", "ANTI"]),
           st.integers(min_value=0, max_value=90),
           st.booleans())
    def test_join_parity(self, jt, cut, with_residual):
        d = self._fixture
        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root=d)
        residual = f" AND r.v > {cut}" if with_residual else ""
        proj = "l.a" if jt in ("SEMI", "ANTI") else "l.a, r.v"
        sql = (f"SELECT {proj} FROM lt l {jt} JOIN rt r "
               f"ON l.k = r.k{residual}")
        mine = eng.sql(sql).to_pandas()
        oracle = duckdb.sql(
            sql.replace("FROM lt l", f"FROM '{d}/lt.parquet' l")
               .replace("JOIN rt r", f"JOIN '{d}/rt.parquet' r")).df()
        assert len(mine) == len(oracle), sql
        key = lambda df: sorted(  # noqa: E731
            map(tuple, df.fillna(-9e9).to_numpy().tolist()))
        assert key(mine) == key(oracle), sql

    @pytest.fixture(autouse=True)
    def _bind_j(self, join_tables):
        type(self)._fixture = join_tables


class TestRowsFrameFuzz:
    """General ROWS frames vs DuckDB: random aggregate x arbitrary
    PRECEDING/FOLLOWING bounds x direction, ordered by the unique rid
    (ROWS framing under ties is engine-order-dependent, so the order key
    must be unique)."""

    @settings(max_examples=20, deadline=None)
    @given(st.sampled_from(["SUM(f)", "AVG(f)", "MIN(i)", "MAX(i)",
                            "COUNT(i)"]),
           st.booleans(),
           st.sampled_from([(-2, 2), (1, 3), (-4, -2), (1, None),
                            (None, -1), (2, 1), (0, 2), (-3, 0)]),
           st.booleans())
    def test_rows_frame_parity(self, fn, partition, bounds, desc):
        sf_dir, path = self._fixture
        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root=sf_dir)
        lo, hi = bounds

        def b(v, low):
            if v is None:
                return "UNBOUNDED PRECEDING" if low else \
                    "UNBOUNDED FOLLOWING"
            if v == 0:
                return "CURRENT ROW"
            return f"{-v} PRECEDING" if v < 0 else f"{v} FOLLOWING"

        over = (["PARTITION BY k"] if partition else []) + [
            f"ORDER BY rid{' DESC' if desc else ''}",
            f"ROWS BETWEEN {b(lo, True)} AND {b(hi, False)}"]
        sql = (f"SELECT rid, {fn} OVER ({' '.join(over)}) AS w FROM wf")
        mine = eng.sql(sql).to_pandas()
        oracle = duckdb.sql(sql.replace("FROM wf", f"FROM '{path}'")).df()
        mine = mine.sort_values("rid", ignore_index=True)
        oracle = oracle.sort_values("rid", ignore_index=True)
        a = mine["w"].to_numpy(dtype="float64", na_value=np.nan)
        b_ = oracle["w"].to_numpy(dtype="float64", na_value=np.nan)
        assert np.allclose(a, b_, rtol=1e-9, atol=1e-12, equal_nan=True), \
            sql

    @pytest.fixture(autouse=True)
    def _bind_rf(self, fuzz_table_rid):
        type(self)._fixture = fuzz_table_rid
