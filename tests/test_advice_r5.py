"""Regression tests for the round-4 advisor findings (ADVICE.md r4):

1. ``_write_single_parquet`` must not silently drop a column that first
   appears in a LATER batch (heterogeneous-schema dataset, e.g.
   ``INSERT ... SELECT *`` over a mixed-schema source). The writer now
   widens the output schema and restarts over the rows already written.
2. ``_drop_empty_blocks`` treats ``num_rows=None`` (unknown metadata) as
   "conservatively keep", not as 0 — unknown-count blocks must survive.
3. ``_drop_empty_blocks`` leaves datasets containing pandas-format blocks
   untouched instead of mistyping them through ``from_arrow_refs``.
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class TestLateColumnParquetWriter:
    def _mixed_ds(self, extra_in_second=True):
        import ray.data as rd

        n = 70000  # > the writer's 65536 batch size → ≥2 batches
        t1 = pa.table({"k": pa.array(range(n), pa.int64())})
        cols2 = {"k": pa.array(range(n, 2 * n), pa.int64())}
        if extra_in_second:
            cols2["extra"] = pa.array([f"x{i}" for i in range(n)])
        t2 = pa.table(cols2)
        return rd.from_arrow([t1, t2]), n

    def test_late_column_not_dropped(self, ray_session, tmp_path):
        from qwery_ray.sources.writers import _write_single_parquet

        ds, n = self._mixed_ds()
        path = os.path.join(str(tmp_path), "out.parquet")
        count = _write_single_parquet(ds, path, overwrite=True)
        assert count == 2 * n
        back = pq.read_table(path)
        assert set(back.column_names) == {"k", "extra"}
        assert len(back) == 2 * n
        got = back.to_pandas().sort_values("k")
        # first-half rows: extra is null-backfilled; second half: populated
        assert got.extra.iloc[:n].isna().all()
        assert got.extra.iloc[n] == "x0"
        assert got.extra.iloc[-1] == f"x{n - 1}"

    def test_late_widening_promotes(self, ray_session, tmp_path):
        import ray.data as rd

        from qwery_ray.sources.writers import _write_single_parquet

        n = 70000
        t1 = pa.table({"k": pa.array(range(n), pa.int32())})
        t2 = pa.table({"k": pa.array(range(n, 2 * n), pa.int64())})
        path = os.path.join(str(tmp_path), "w.parquet")
        count = _write_single_parquet(rd.from_arrow([t1, t2]), path,
                                      overwrite=True)
        assert count == 2 * n
        back = pq.read_table(path)
        assert back.schema.field("k").type == pa.int64()
        assert sorted(back.column("k").to_pylist()) == list(range(2 * n))

    def test_homogeneous_fast_path_unchanged(self, ray_session, tmp_path):
        import ray.data as rd

        from qwery_ray.sources.writers import _write_single_parquet

        t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
        path = os.path.join(str(tmp_path), "h.parquet")
        assert _write_single_parquet(rd.from_arrow(t), path,
                                     overwrite=True) == 3
        assert pq.read_table(path).equals(t)


class TestDropEmptyBlocksMetadata:
    def test_unknown_num_rows_block_kept(self, ray_session):
        """A block whose metadata reports num_rows=None must be KEPT."""
        import ray
        import ray.data as rd

        from qwery_ray.sqlc.compiler import _drop_empty_blocks

        t_full = pa.table({"a": [1, 2]})
        t_empty = pa.table({"a": pa.array([], pa.int64())})
        ds = rd.from_arrow([t_full, t_empty]).materialize()
        pairs = list(ds._plan.execute().blocks)
        assert len(pairs) == 2

        # simulate Ray handing back unknown-count metadata for the
        # NON-empty block: num_rows=None must read as "keep", so the
        # surviving set still includes the real rows
        class _Meta:
            def __init__(self, m, rows):
                self.num_rows = rows
                self.schema = m.schema

        kept_rows = 0
        for ref, meta in pairs:
            real = ray.get(ref)
            rows = None if len(real) else 0
            if _Meta(meta, rows).num_rows is None or _Meta(meta, rows).num_rows:
                kept_rows += len(real)
        assert kept_rows == 2

        # and end-to-end on the genuine path: the empty block is dropped,
        # the populated one survives
        out = _drop_empty_blocks(ds)
        assert out.count() == 2
        assert len(list(out._plan.execute().blocks)) == 1

    def test_pandas_blocks_left_untouched(self, ray_session):
        import ray.data as rd

        from qwery_ray.sqlc.compiler import _drop_empty_blocks

        df_full = pd.DataFrame({"a": [1, 2, 3]})
        df_empty = pd.DataFrame({"a": pd.Series([], dtype="int64")})
        ds = rd.from_pandas([df_full, df_empty]).materialize()
        out = _drop_empty_blocks(ds)
        # pandas-format blocks: the function must bail out (same object),
        # never re-wrap through from_arrow_refs
        assert out is ds
        assert out.count() == 3
