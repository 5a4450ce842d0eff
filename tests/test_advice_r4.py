"""Regression tests for the round-3 advisor findings (ADVICE.md r3):

1. ANSI UPDATE evaluates every SET source against the PRE-update row
   (``SET a=b, b=a`` swaps) and only over WHERE-selected rows (an
   expression that errors on an excluded row must not fail the statement).
2. stream_window_agg on a fully empty stream returns the empty frame
   instead of crashing in ``pa.concat_tables([])``.
3. Out-of-range positional ORDER BY with an explicit select-item list is
   an error (DuckDB parity), not a silent pre-projection column pick.
4. ``LIKE 'x!' ESCAPE '!'`` (escape char with nothing following) raises.
5. BPEEncode's per-worker memo keys local (non-ObjectRef) merge tables by
   content, not ``id()`` (which can be reused after GC → stale cache).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


class TestAnsiUpdateRowSemantics:
    def _eng(self, tmp_path, tbl):
        from qwery_ray import QweryEngine

        path = os.path.join(str(tmp_path), "t.parquet")
        pq.write_table(tbl, path)
        return QweryEngine(table_root=str(tmp_path)), path

    def test_swap_reads_pre_update_row(self, ray_session, tmp_path):
        eng, path = self._eng(tmp_path, pa.table(
            {"k": [1, 2, 3], "a": [10, 20, 30], "b": [100, 200, 300]}))
        out = eng.sql(f"UPDATE '{path}' SET a = b, b = a "
                      f"WHERE k >= 2").to_pandas()
        assert out.ROWS_UPDATED.iloc[0] == 2
        back = pq.read_table(path).to_pandas().sort_values("k")
        assert back.a.tolist() == [10, 200, 300]
        assert back.b.tolist() == [100, 20, 30]

    def test_set_expr_only_evaluated_on_selected_rows(self, ray_session,
                                                      tmp_path):
        # CAST('bad' AS INT) errors — but that row is excluded by WHERE,
        # so the statement must succeed (SQL row-scoped evaluation).
        eng, path = self._eng(tmp_path, pa.table(
            {"k": [1, 2, 3], "s": ["7", "bad", "9"], "a": [0, 0, 0]}))
        out = eng.sql(f"UPDATE '{path}' SET a = CAST(s AS INT) "
                      f"WHERE s <> 'bad'").to_pandas()
        assert out.ROWS_UPDATED.iloc[0] == 2
        back = pq.read_table(path).to_pandas().sort_values("k")
        assert back.a.tolist() == [7, 0, 9]


class TestEmptyStreamWindowAgg:
    def test_no_chunks(self, ray_session):
        from qwery_ray.ops.streaming import stream_window_agg

        out = stream_window_agg([])
        assert len(out) == 0
        assert "window_start_sec" in out.column_names

    def test_all_empty_chunks(self, ray_session):
        from qwery_ray.ops.streaming import stream_window_agg

        empty = pa.table({"ts": pa.array([], pa.float64()),
                          "value": pa.array([], pa.float64())})
        out = stream_window_agg([empty, empty])
        assert len(out) == 0


class TestPositionalOrderByRange:
    @pytest.fixture(scope="class")
    def eng(self, ray_session):
        from qwery_ray import QweryEngine

        return QweryEngine(table_root="/root/testdata/sf0.001")

    def test_out_of_range_explicit_items_errors(self, eng):
        with pytest.raises(Exception, match="(?i)out of range"):
            eng.sql("SELECT r_name, r_regionkey FROM region ORDER BY 3")

    def test_star_positional_still_resolves(self, eng):
        df = eng.sql("SELECT * FROM region ORDER BY 2").to_pandas()
        assert df.r_name.is_monotonic_increasing

    def test_in_range_positional_still_resolves(self, eng):
        df = eng.sql("SELECT r_name, r_regionkey FROM region "
                     "ORDER BY 2 DESC").to_pandas()
        assert df.r_regionkey.tolist() == [4, 3, 2, 1, 0]


class TestLikeTrailingEscape:
    @pytest.fixture(scope="class")
    def eng(self, ray_session):
        from qwery_ray import QweryEngine

        return QweryEngine(table_root="/root/testdata/sf0.001")

    def test_trailing_escape_raises(self, eng):
        with pytest.raises(Exception, match="(?i)escape"):
            eng.sql("SELECT r_name FROM region WHERE r_name LIKE 'x!' "
                    "ESCAPE '!'").to_pandas()

    def test_normal_escape_still_works(self, eng):
        df = eng.sql("SELECT r_name FROM region "
                     "WHERE r_name LIKE 'A!%RICA' ESCAPE '!'").to_pandas()
        assert len(df) == 0  # literal % never matches, but no error


class TestBpeMemoContentKey:
    def test_distinct_models_distinct_keys(self, ray_session):
        from qwery_ray.ops.bpe import BPEEncode

        r1 = {("l", "o"): 0, ("lo", "w"): 1}
        r2 = {("l", "o"): 0, ("o", "w"): 1}
        e1 = BPEEncode(r1, emit="tokens")
        e2 = BPEEncode(r2, emit="tokens")
        assert e1._local_key != e2._local_key

    def test_equal_content_same_key(self, ray_session):
        from qwery_ray.ops.bpe import BPEEncode

        r1 = {("l", "o"): 0, ("lo", "w"): 1}
        e1 = BPEEncode(dict(r1), emit="tokens")
        e2 = BPEEncode(dict(r1), emit="tokens")  # different object, same content
        assert e1._local_key == e2._local_key

    def test_fresh_model_not_served_stale(self, ray_session):
        from qwery_ray.ops.bpe import BPEEncode, encode_word

        tbl = pa.table({"doc_id": [0], "text": ["low"]})
        r1 = {("l", "o"): 0, ("lo", "w"): 1}
        out1 = BPEEncode(r1, emit="tokens")(tbl)
        assert list(out1.column("tokens")[0].as_py()) == \
            encode_word("low", r1)
        r2 = {("o", "w"): 0, ("l", "ow"): 1}
        out2 = BPEEncode(r2, emit="tokens")(tbl)
        assert list(out2.column("tokens")[0].as_py()) == \
            encode_word("low", r2)
