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
