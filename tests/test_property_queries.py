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
