"""PIVOT / UNPIVOT (DuckDB simplified syntax) parity vs DuckDB.

PIVOT with an explicit IN list rewrites at parse time to CASE-filtered
aggregates; the dynamic form discovers values (sorted ascending) at exec.
UNPIVOT streams wide→long per batch, excluding NULL values."""

import pandas as pd
import pytest

from conftest import assert_frames_match, to_pandas


def run_both(engine, duck, sql, sort):
    mine = to_pandas(engine.sql(sql))
    oracle = duck.execute(sql).fetch_df()
    assert_frames_match(mine, oracle, sort_by=sort)
    return mine


class TestPivot:
    def test_dynamic_pivot_sum(self, engine, duck):
        run_both(engine, duck,
                 "PIVOT events ON event_type USING SUM(value) "
                 "GROUP BY user_id", ["user_id"])

    def test_explicit_in_count_star(self, engine, duck):
        run_both(engine, duck,
                 "PIVOT events ON event_type IN ('click', 'purchase') "
                 "USING COUNT(*) GROUP BY user_id", ["user_id"])

    def test_pivot_subquery_source(self, engine, duck):
        run_both(engine, duck,
                 "PIVOT (SELECT * FROM events WHERE value > 5) ON event_type "
                 "USING AVG(value) GROUP BY user_id", ["user_id"])

    def test_pivot_two_group_keys(self, engine, duck):
        run_both(engine, duck,
                 "PIVOT orders ON o_orderstatus USING COUNT(*) "
                 "GROUP BY o_orderpriority", ["o_orderpriority"])

    def test_dynamic_value_cap(self, engine):
        from qwery_ray.sqlc import parser as P

        stmt = P.parse("PIVOT events ON ts USING COUNT(*) "
                       "GROUP BY user_id")[0]
        # 1000 events at sf0.001 → ts has ~1000 distinct values, under the
        # cap; just assert the statement shape survives parse
        import qwery_ray.sqlc.ast as A
        assert isinstance(stmt, A.Pivot)


class TestUnpivot:
    def test_unpivot_basic(self, engine, duck):
        run_both(engine, duck,
                 "UNPIVOT (SELECT user_id, event_id, value FROM events "
                 "WHERE event_id < 50) ON event_id, value "
                 "INTO NAME metric VALUE v", ["user_id", "metric", "v"])

    def test_unpivot_excludes_nulls(self, engine, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"id": [1, 2], "a": [10, None],
                                 "b": [None, 20]}),
                       str(tmp_path / "w.parquet"))
        out = to_pandas(engine.sql(
            f"UNPIVOT '{tmp_path}/w.parquet' ON a, b "
            f"INTO NAME m VALUE v")).sort_values("id", ignore_index=True)
        assert out.to_dict("records") == [
            {"id": 1, "m": "a", "v": 10}, {"id": 2, "m": "b", "v": 20}]

    def test_unpivot_type_promotion(self, engine, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"id": [1], "i": pa.array([7], pa.int32()),
                                 "f": [1.5]}), str(tmp_path / "t.parquet"))
        out = to_pandas(engine.sql(
            f"UNPIVOT '{tmp_path}/t.parquet' ON i, f INTO NAME m VALUE v"))
        assert sorted(out["v"].tolist()) == [1.5, 7.0]

    def test_decompile_round_trip(self):
        from qwery_ray.sqlc import parser as P
        from qwery_ray.sqlc.decompiler import to_sql

        for sql in ("PIVOT events ON event_type USING SUM(value) "
                    "GROUP BY user_id",
                    "UNPIVOT events ON a, b INTO NAME m VALUE v"):
            stmt = P.parse(sql)[0]
            assert P.parse(to_sql(stmt))[0] == stmt
