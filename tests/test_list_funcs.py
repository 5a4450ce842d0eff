"""UNNEST + DuckDB-compatible list/array functions.

The reference engine has no list type (Scala rows are flat maps), so this
whole surface is a superset motivated by the `embeddings` test table
(list<float> vectors) — every result is checked against DuckDB 1.0 on the
same inputs, which is also the driver's oracle engine.
"""
import pandas as pd
import pytest


def _df(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def _same(mine, theirs):
    a = _df(mine).reset_index(drop=True)
    b = theirs.reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a.astype(str), b.astype(str))


PARITY_QUERIES = [
    # UNNEST over a real list<float> column, scalars repeated
    "SELECT vec_id, UNNEST(embedding) AS v FROM embeddings "
    "WHERE vec_id < 3 ORDER BY vec_id, v",
    # explode → re-aggregate round trip (count per vector = dim)
    "SELECT vec_id, COUNT(*) AS n FROM "
    "(SELECT vec_id, UNNEST(embedding) AS v FROM embeddings) "
    "GROUP BY vec_id ORDER BY vec_id LIMIT 20",
    # list literals, indexing (1-based + negative), membership
    "SELECT [1,2,3] AS l, [10,20,30][2] AS e, "
    "list_extract([1,2,3], -1) AS last_e, "
    "list_contains([1,2,3], 2) AS hit, list_contains([1,2,3], 9) AS miss",
    # length / sort / join
    "SELECT array_length([4,5]) AS n, len([7,8,9]) AS n2, "
    "list_sort([3,1,2]) AS so, array_to_string([1,2,3], '-') AS s",
    # vector math on the embeddings table
    "SELECT vec_id, ROUND(list_cosine_similarity(embedding, embedding), 5) "
    "AS self_cos, array_length(embedding) AS dim FROM embeddings "
    "WHERE vec_id < 5 ORDER BY vec_id",
    "SELECT ROUND(list_inner_product([1.0,2.0], [2.0,4.0]), 5) AS ip, "
    "ROUND(list_distance([1.0,2.0], [2.0,4.0]), 5) AS d, "
    "ROUND(list_cosine_similarity([1.0,2.0], [2.0,4.0]), 5) AS c",
    # zipped multi-UNNEST pads the shorter list with NULL
    "SELECT unnest([1,2]) AS a, unnest([7]) AS b",
    # subscript on a column expression
    "SELECT vec_id, ROUND(embedding[1], 5) AS first_dim FROM embeddings "
    "ORDER BY vec_id LIMIT 5",
    # UNNEST output feeding WHERE/ORDER in the outer query
    "SELECT v FROM (SELECT UNNEST([3,1,2]) AS v) WHERE v > 1 ORDER BY v",
    # per-row (column) needle for list_contains
    "SELECT list_contains([2, 3, 5, 7], CAST(vec_id % 10 AS INT)) AS hit, "
    "COUNT(*) AS n FROM embeddings GROUP BY hit ORDER BY hit",
]


class TestListFuncs:
    @pytest.mark.parametrize("q", PARITY_QUERIES)
    def test_duckdb_parity(self, engine, duck, q):
        _same(engine.sql(q), duck.sql(q).df())

    def test_unnest_skips_empty_and_null_lists(self, engine, duck):
        q = ("SELECT unnest(l) AS v FROM (SELECT CASE WHEN vec_id % 3 = 0 "
             "THEN [vec_id] WHEN vec_id % 3 = 1 THEN [] END AS l "
             "FROM embeddings WHERE vec_id < 9) ORDER BY v")
        _same(engine.sql(q), duck.sql(q).df())

    def test_unnest_not_allowed_nested(self, engine):
        with pytest.raises(Exception, match="UNNEST"):
            _df(engine.sql(
                "SELECT unnest(embedding) + 1 AS v FROM embeddings"))

    def test_array_agg_unnest_roundtrip(self, engine, duck):
        # ARRAY_AGG(… ORDER BY) rebuilds the list; UNNEST explodes it back
        q = ("SELECT k, array_to_string(list_sort(arr), ',') AS s FROM "
             "(SELECT vec_id % 4 AS k, ARRAY_AGG(vec_id ORDER BY vec_id) "
             "AS arr FROM embeddings WHERE vec_id < 12 GROUP BY k) "
             "ORDER BY k")
        _same(engine.sql(q), duck.sql(q).df())

    def test_list_distance_mismatched_lengths_raises(self, engine):
        with pytest.raises(Exception, match="lengths differ"):
            engine.sql("SELECT list_distance([1.0,2.0], [1.0]) AS d")
