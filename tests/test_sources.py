"""Source/sink long tail: JSON flattening, gzip CSV, fixed-width write,
delimiter sniffing, MATCHES regex predicate."""

import gzip
import json
import os

from conftest import to_pandas


class TestJsonFlatten:
    def test_nested_objects_dotted(self, ray_session, tmp_path):
        from qwery_ray.sources.readers import read_source

        path = os.path.join(str(tmp_path), "nested.json")
        with open(path, "w") as f:
            f.write(json.dumps({"id": 1, "geo": {"lat": 1.5, "lon": 2.5},
                                "name": "a"}) + "\n")
            f.write(json.dumps({"id": 2, "geo": {"lat": 3.5, "lon": 4.5},
                                "name": "b"}) + "\n")
        df = read_source(path).to_pandas()
        assert "geo.lat" in df.columns and "geo.lon" in df.columns
        assert df["geo.lat"].tolist() == [1.5, 3.5]

    def test_sql_over_flattened_json(self, ray_session, tmp_path):
        from qwery_ray import QweryEngine

        path = os.path.join(str(tmp_path), "ev.json")
        with open(path, "w") as f:
            for i in range(6):
                f.write(json.dumps({"k": i % 2, "m": {"v": i * 10}}) + "\n")
        eng = QweryEngine()
        out = to_pandas(eng.sql(
            f"SELECT k, SUM(`m.v`) AS total FROM '{path}' GROUP BY k"))
        got = dict(zip(out["k"], out["total"]))
        assert got == {0: 60, 1: 90}


class TestGzip:
    def test_gzip_csv_read(self, ray_session, tmp_path):
        from qwery_ray.sources.readers import read_source

        path = os.path.join(str(tmp_path), "data.csv.gz")
        with gzip.open(path, "wt") as f:
            f.write("a,b\n1,x\n2,y\n")
        df = read_source(path).to_pandas()
        assert df["a"].tolist() == ["1", "2"]


class TestDelimiterSniff:
    def test_pipe_detected(self, ray_session, tmp_path):
        from qwery_ray.sources.readers import sniff_delimiter

        path = os.path.join(str(tmp_path), "d.txt")
        with open(path, "w") as f:
            f.write("a|b|c\n1|2|3\n4|5|6\n")
        assert sniff_delimiter(path) == "|"

    def test_tab_detected(self, ray_session, tmp_path):
        from qwery_ray.sources.readers import sniff_delimiter

        path = os.path.join(str(tmp_path), "d.txt")
        with open(path, "w") as f:
            f.write("a\tb\n1\t2\n")
        assert sniff_delimiter(path) == "\t"


class TestFixedWidthWrite:
    def test_round_trip(self, ray_session, tmp_path):
        import ray.data as rd

        from qwery_ray.sources.readers import read_fixed_width
        from qwery_ray.sources.writers import write_fixed_width

        ds = rd.from_items([{"sym": "AAPL", "px": "145"},
                            {"sym": "VERYLONGSYMBOL", "px": "9"}])
        path = os.path.join(str(tmp_path), "fw.txt")
        n = write_fixed_width(ds, path, [("sym", 8), ("px", 5)])
        assert n == 2
        lines = open(path).read().splitlines()
        assert lines[0] == "AAPL    145  "
        assert lines[1] == "VERYLONG9    "  # pad-or-TRUNCATE semantics
        back = read_fixed_width(path, {"widths": [("sym", 8), ("px", 5)]})
        df = back.to_pandas()
        assert df["sym"].tolist() == ["AAPL", "VERYLONG"]


class TestMatches:
    def test_matches_regex_predicate(self, engine, duck):
        mine = to_pandas(engine.sql(
            "SELECT n_name FROM nation WHERE n_name MATCHES '_1?[0-3]$'"))
        oracle = duck.execute(
            "SELECT n_name FROM nation WHERE regexp_matches(n_name, '_1?[0-3]$')"
        ).fetch_df()
        assert sorted(mine["n_name"]) == sorted(oracle["n_name"])


class TestSourceRegistry:
    """Pluggable source factory hook (reference
    core/devices/InputDeviceFactory.scala:24-27 `add(prefix, factory)`) and
    pyarrow.fs-routed path handling for URL sources."""

    def test_registered_scheme_reads_csv(self, ray_session):
        import fsspec
        import pyarrow.csv as pacsv
        import ray.data as rd

        from qwery_ray.sources.readers import (read_source, register_source,
                                               unregister_source)

        mem = fsspec.filesystem("memory")
        with mem.open("/reg/t.csv", "wb") as f:
            f.write(b"a,b\n1,x\n2,y\n")

        def mem_factory(path, hints, *, columns=None, **kw):
            # driver-side read of an in-memory filesystem (per-process, so
            # the factory materializes rather than distributing the read)
            rel = path.split("://", 1)[1]
            with fsspec.filesystem("memory").open("/" + rel, "rb") as f:
                table = pacsv.read_csv(f)
            if columns:
                table = table.select(columns)
            return rd.from_arrow(table)

        register_source("memcsv", mem_factory)
        try:
            ds = read_source("memcsv://reg/t.csv", {})
            df = ds.to_pandas()
            assert df["a"].tolist() == [1, 2]
            assert df["b"].tolist() == ["x", "y"]
        finally:
            unregister_source("memcsv")

    def test_registered_scheme_via_sql(self, ray_session):
        import ray.data as rd

        from qwery_ray import QweryEngine
        from qwery_ray.sources.readers import (register_source,
                                               unregister_source)
        import pyarrow as pa

        register_source("fake", lambda path, hints, *, columns=None, **kw:
                        rd.from_arrow(pa.table({"v": [1, 2, 3]})))
        try:
            eng = QweryEngine(table_root="/tmp")
            df = eng.sql("SELECT SUM(v) AS s FROM 'fake://anything'"
                         ).to_pandas()
            assert df["s"][0] == 6
        finally:
            unregister_source("fake")

    def test_file_url_parquet_roundtrip(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from qwery_ray.sources.readers import read_source, source_exists

        p = os.path.join(str(tmp_path), "t.parquet")
        pq.write_table(pa.table({"x": [1, 2, 3]}), p)
        assert source_exists(f"file://{p}")
        assert not source_exists(f"file://{p}.missing")
        ds = read_source(f"file://{p}", {})
        assert sorted(ds.to_pandas()["x"]) == [1, 2, 3]

    def test_url_csv_sniff_through_fs(self, ray_session):
        import fsspec

        from qwery_ray.sources.readers import sniff_delimiter

        mem = fsspec.filesystem("memory")
        with mem.open("/sniff/p.psv", "wb") as f:
            f.write(b"a|b|c\n1|2|3\n4|5|6\n")
        assert sniff_delimiter("memory://sniff/p.psv") == "|"


class TestDbapi:
    """DBAPI source/sink — JDBC parity (reference JDBCInputSource.scala:14-60,
    JDBCOutputSource.scala:62-104) over sqlite3."""

    @staticmethod
    def _make_db(path, n=500):
        import sqlite3

        conn = sqlite3.connect(path)
        conn.execute("CREATE TABLE trades (id INTEGER PRIMARY KEY, "
                     "sym TEXT, px REAL)")
        conn.executemany("INSERT INTO trades VALUES (?, ?, ?)",
                         [(i, f"S{i % 7}", float(i) / 4) for i in range(n)])
        conn.commit()
        conn.close()

    def test_read_sql(self, ray_session, tmp_path):
        import sqlite3

        from qwery_ray.sources.dbapi import read_sql

        db = str(tmp_path / "t.db")
        self._make_db(db)
        ds = read_sql("SELECT sym, COUNT(*) AS n FROM trades GROUP BY sym",
                      lambda: sqlite3.connect(db))
        df = ds.to_pandas()
        assert df["n"].sum() == 500 and len(df) == 7

    def test_read_sql_partitioned_parallel(self, ray_session, tmp_path):
        import sqlite3

        from qwery_ray.sources.dbapi import read_sql_partitioned

        db = str(tmp_path / "p.db")
        self._make_db(db)
        ds = read_sql_partitioned(
            "trades", lambda: sqlite3.connect(db), partition_col="id",
            num_partitions=8, where="px >= 25.0")
        df = ds.to_pandas()
        assert sorted(df["id"]) == list(range(100, 500))

    def test_write_sql_upsert(self, ray_session, tmp_path):
        import sqlite3

        import ray.data as rd

        from qwery_ray.sources.dbapi import read_sql, write_sql

        db = str(tmp_path / "w.db")
        self._make_db(db, n=10)
        factory = lambda: sqlite3.connect(db)  # noqa: E731
        n = write_sql(
            rd.from_items([{"id": 5, "sym": "NEW", "px": 1.0},
                           {"id": 100, "sym": "ADD", "px": 2.0}]),
            "trades", factory, upsert_keys=["id"])
        assert n == 2
        df = read_sql("SELECT * FROM trades ORDER BY id", factory).to_pandas()
        assert len(df) == 11  # 10 original − 1 replaced + 1 new... = 11 rows
        assert df[df["id"] == 5]["sym"].iloc[0] == "NEW"
        assert df[df["id"] == 100]["sym"].iloc[0] == "ADD"

    def test_sqlite_url_in_sql(self, ray_session, tmp_path):
        from qwery_ray import QweryEngine

        db = str(tmp_path / "u.db")
        self._make_db(db, n=40)
        eng = QweryEngine(table_root=str(tmp_path))
        df = eng.sql(
            f"SELECT sym, COUNT(*) AS n FROM 'sqlite://{db}?table=trades' "
            f"GROUP BY sym ORDER BY sym").to_pandas()
        assert df["n"].sum() == 40


class TestSniffColumnNames:
    """sniff_column_names: the schema fallback for header-only (all-empty)
    delimited sources — Ray reports no schema on empty datasets."""

    def test_csv_and_psv_and_fixed(self, tmp_path):
        from qwery_ray.sources.readers import sniff_column_names

        c = tmp_path / "h.csv"
        c.write_text("A,B,C\n")
        assert sniff_column_names(str(c)) == ["A", "B", "C"]
        p = tmp_path / "h.psv"
        p.write_text("x|y\n")
        assert sniff_column_names(str(p)) == ["x", "y"]
        assert sniff_column_names(str(tmp_path / "f.txt"),
                                  {"format": "fixed",
                                   "widths": [("a", 3), ("b", 5)]}) \
            == ["a", "b"]
        assert sniff_column_names(str(tmp_path / "nope.csv")) == []

    def test_header_only_csv_queryable(self, ray_session, tmp_path):
        from qwery_ray.engine.session import QweryEngine

        f = tmp_path / "empty.csv"
        f.write_text("Symbol,Sector\n")
        df = QweryEngine().sql(
            f"SELECT Symbol FROM '{f}' WHERE Sector = 'x'").to_pandas()
        assert list(df.columns) == ["Symbol"] and len(df) == 0
