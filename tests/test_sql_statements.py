"""Statement-surface parity: INSERT / UPSERT / UPDATE / VALUES / variables /
views / functions / procedures / DESCRIBE / SHOW.

Re-expresses the reference's golden e2e scenarios (coretest/QweryTest.scala:
17-273 — CSV→CSV insert, overwrite-then-append, CSV→JSON, stored procedure
with variables, INSERT VALUES counts) over synthetic fixtures. The reference
counts the header row in ROWS_INSERTED (QweryTest.scala:199-208) — we return
data-row counts (sane-semantics divergence, SURVEY.md §7.3)."""

import json
import os

import pyarrow as pa
import pytest

from conftest import SF_TINY, to_pandas


@pytest.fixture()
def tmp_engine(ray_session, tmp_path):
    from qwery_ray import QweryEngine

    eng = QweryEngine(table_root=SF_TINY)
    eng.workdir = str(tmp_path)
    return eng


def _companylist_csv(tmp_path, rows=10):
    """Tiny analogue of the reference's companylist.csv fixture (FIXTURES.md §1)."""
    path = os.path.join(str(tmp_path), "companylist.csv")
    sectors = ["Finance", "Health Care", "Technology", "n/a"]
    with open(path, "w") as f:
        f.write("Symbol,Name,LastSale,MarketCap,Sector\n")
        for i in range(rows):
            sale = "n/a" if i % 5 == 4 else f"{10 + i * 1.5:.2f}"
            f.write(f"SYM{i},Company {i} Inc.,{sale},{1000 + i},{sectors[i % 4]}\n")
    return path


class TestInsert:
    def test_csv_to_csv(self, tmp_engine, tmp_path):
        src = _companylist_csv(tmp_path)
        out = os.path.join(str(tmp_path), "out.csv")
        res = tmp_engine.sql(
            f"INSERT INTO '{out}' (Symbol, Sector) "
            f"SELECT Symbol, Sector FROM '{src}' WHERE Sector = 'Finance'")
        n = to_pandas(res)["ROWS_INSERTED"][0]
        assert n == 3
        with open(out) as f:
            lines = f.read().strip().splitlines()
        assert lines[0].replace('"', "") == "Symbol,Sector"
        assert len(lines) == 4

    def test_overwrite_then_append(self, tmp_engine, tmp_path):
        # mirrors QweryTest overwrite-then-append (35+6 rows scenario)
        src = _companylist_csv(tmp_path)
        out = os.path.join(str(tmp_path), "oa.csv")
        r1 = tmp_engine.sql(f"INSERT OVERWRITE '{out}' (Symbol) SELECT Symbol FROM '{src}'")
        assert to_pandas(r1)["ROWS_INSERTED"][0] == 10
        r2 = tmp_engine.sql(
            f"INSERT INTO '{out}' (Symbol) SELECT Symbol FROM '{src}' "
            f"WHERE Sector = 'Finance'")
        assert to_pandas(r2)["ROWS_INSERTED"][0] == 3
        with open(out) as f:
            assert len(f.read().strip().splitlines()) == 1 + 10 + 3
        r3 = tmp_engine.sql(f"INSERT OVERWRITE '{out}' (Symbol) SELECT Symbol FROM '{src}'")
        with open(out) as f:
            assert len(f.read().strip().splitlines()) == 1 + 10

    def test_csv_to_json(self, tmp_engine, tmp_path):
        src = _companylist_csv(tmp_path)
        out = os.path.join(str(tmp_path), "out.json")
        tmp_engine.sql(f"INSERT INTO '{out}' (Symbol, Name) SELECT Symbol, Name FROM '{src}'")
        with open(out) as f:
            rows = [json.loads(line) for line in f]
        assert len(rows) == 10
        assert rows[0] == {"Symbol": "SYM0", "Name": "Company 0 Inc."}

    def test_insert_values(self, tmp_engine, tmp_path):
        out = os.path.join(str(tmp_path), "vals.csv")
        res = tmp_engine.sql(
            f"INSERT INTO '{out}' (symbol, price) "
            f"VALUES ('AAPL', 145.5) VALUES ('MSFT', 332.1) VALUES ('AMD', 95.2)")
        assert to_pandas(res)["ROWS_INSERTED"][0] == 3
        back = to_pandas(tmp_engine.sql(f"SELECT * FROM '{out}'"))
        assert back["symbol"].tolist() == ["AAPL", "MSFT", "AMD"]

    def test_select_into_parquet(self, tmp_engine, tmp_path):
        out = os.path.join(str(tmp_path), "into.parquet")
        tmp_engine.sql(
            f"SELECT o_orderkey, o_totalprice FROM orders "
            f"WHERE o_totalprice > 300000 INTO '{out}'")
        back = to_pandas(tmp_engine.sql(f"SELECT COUNT(*) AS n FROM '{out}'"))
        expect = to_pandas(tmp_engine.sql(
            "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > 300000"))
        assert back["n"][0] == expect["n"][0] > 0


class TestUpsert:
    def test_upsert_insert_then_update(self, tmp_engine, tmp_path):
        tgt = os.path.join(str(tmp_path), "tgt.parquet")
        r1 = tmp_engine.sql(
            f"UPSERT INTO '{tgt}' (symbol, price) "
            f"VALUES ('AAPL', 100) VALUES ('MSFT', 200) KEYED ON symbol")
        d1 = to_pandas(r1)
        assert d1["ROWS_INSERTED"][0] == 2 and d1["ROWS_UPDATED"][0] == 0
        r2 = tmp_engine.sql(
            f"UPSERT INTO '{tgt}' (symbol, price) "
            f"VALUES ('AAPL', 111) VALUES ('NVDA', 300) KEYED ON symbol")
        d2 = to_pandas(r2)
        assert d2["ROWS_INSERTED"][0] == 1 and d2["ROWS_UPDATED"][0] == 1
        back = to_pandas(tmp_engine.sql(f"SELECT * FROM '{tgt}'"))
        got = dict(zip(back["symbol"], back["price"]))
        assert got == {"AAPL": 111, "MSFT": 200, "NVDA": 300}

    def test_upsert_last_writer_wins_within_batch(self, tmp_engine, tmp_path):
        tgt = os.path.join(str(tmp_path), "tgt2.parquet")
        tmp_engine.sql(
            f"UPSERT INTO '{tgt}' (k, v) VALUES ('a', 1) VALUES ('a', 2) "
            f"VALUES ('a', 3) KEYED ON k")
        back = to_pandas(tmp_engine.sql(f"SELECT * FROM '{tgt}'"))
        assert back["v"].tolist() == [3]

    def test_update_keyed(self, tmp_engine, tmp_path):
        tgt = os.path.join(str(tmp_path), "tgt3.parquet")
        tmp_engine.sql(
            f"UPSERT INTO '{tgt}' (k, v, w) VALUES ('a', 1, 10) "
            f"VALUES ('b', 2, 20) VALUES ('c', 3, 30) KEYED ON k")
        res = tmp_engine.sql(
            f"UPDATE '{tgt}' SET v = v * 100 FROM "
            f"(SELECT * FROM '{tgt}' WHERE w > 15) KEYED ON k")
        assert to_pandas(res)["ROWS_UPDATED"][0] == 2
        back = to_pandas(tmp_engine.sql(f"SELECT * FROM '{tgt}' ORDER BY k"))
        assert back["v"].tolist() == [1, 200, 300]
        assert back["w"].tolist() == [10, 20, 30]


class TestSessionState:
    def test_declare_set_variable(self, tmp_engine):
        tmp_engine.sql("DECLARE @minPrice DOUBLE")
        tmp_engine.sql("SET @minPrice = 300000")
        out = to_pandas(tmp_engine.sql(
            "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > @minPrice"))
        expect = to_pandas(tmp_engine.sql(
            "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > 300000"))
        assert out["n"][0] == expect["n"][0]

    def test_set_from_subquery(self, tmp_engine):
        tmp_engine.sql("SET @maxKey = (SELECT MAX(o_orderkey) AS m FROM orders)")
        assert tmp_engine.variables["maxKey"] > 0

    def test_handlebars_path_expansion(self, tmp_engine, tmp_path):
        src = _companylist_csv(tmp_path)
        tmp_engine.variables["srcPath"] = src
        out = to_pandas(tmp_engine.sql("SELECT COUNT(*) AS n FROM '{{ srcPath }}'"))
        assert out["n"][0] == 10

    def test_create_view(self, tmp_engine):
        tmp_engine.sql(
            "CREATE VIEW big_orders AS SELECT * FROM orders WHERE o_totalprice > 300000")
        out = to_pandas(tmp_engine.sql(
            "SELECT COUNT(*) AS n FROM big_orders WHERE o_orderstatus = 'O'"))
        expect = to_pandas(tmp_engine.sql(
            "SELECT COUNT(*) AS n FROM orders "
            "WHERE o_totalprice > 300000 AND o_orderstatus = 'O'"))
        assert out["n"][0] == expect["n"][0]

    def test_create_sql_function(self, tmp_engine):
        tmp_engine.sql("CREATE FUNCTION discounted(price, pct) AS "
                       "RETURN price * (1 - pct)")
        out = to_pandas(tmp_engine.sql(
            "SELECT discounted(l_extendedprice, l_discount) AS net "
            "FROM lineitem LIMIT 5"))
        assert (out["net"] > 0).all()

    def test_python_udf(self, tmp_engine):
        import pyarrow.compute as pc

        tmp_engine.register_function(
            "REV", lambda s: pc.utf8_reverse(s), vectorized=True)
        out = to_pandas(tmp_engine.sql("SELECT REV(r_name) AS rev FROM region LIMIT 1"))
        orig = to_pandas(tmp_engine.sql("SELECT r_name FROM region LIMIT 1"))
        assert out["rev"][0] == orig["r_name"][0][::-1]

    def test_procedure(self, tmp_engine, tmp_path):
        out = os.path.join(str(tmp_path), "proc_out.csv")
        tmp_engine.sql(
            f"CREATE PROCEDURE copyFinance(minBal) AS BEGIN "
            f"  INSERT INTO '{out}' (name, bal) "
            f"  SELECT c_name, c_acctbal FROM customer WHERE c_acctbal > @minBal; "
            f"END")
        res = tmp_engine.sql("CALL copyFinance(9900)")
        n = to_pandas(res)["ROWS_INSERTED"][0]
        expect = to_pandas(tmp_engine.sql(
            "SELECT COUNT(*) AS n FROM customer WHERE c_acctbal > 9900"))["n"][0]
        assert n == expect

    def test_describe(self, tmp_engine):
        out = to_pandas(tmp_engine.sql("DESCRIBE region"))
        assert set(out["Column"]) == {"r_regionkey", "r_name"}

    def test_show(self, tmp_engine):
        tmp_engine.sql("CREATE VIEW v1 AS SELECT * FROM region")
        views = to_pandas(tmp_engine.sql("SHOW VIEWS"))
        assert "v1" in views["name"].tolist()
        tables = to_pandas(tmp_engine.sql("SHOW TABLES"))
        assert "lineitem" in tables["name"].tolist()

    def test_union_composable_with_insert(self, tmp_engine, tmp_path):
        out = os.path.join(str(tmp_path), "u.csv")
        res = tmp_engine.sql(
            f"INSERT INTO '{out}' (name) "
            f"SELECT r_name AS name FROM region UNION ALL "
            f"SELECT n_name AS name FROM nation")
        assert to_pandas(res)["ROWS_INSERTED"][0] == 30


class TestFixedWidth:
    def test_fixed_width_read(self, tmp_engine, tmp_path):
        path = os.path.join(str(tmp_path), "fw.txt")
        with open(path, "w") as f:
            f.write("AAPL      000145\n")
            f.write("MSFT      000332\n")
        from qwery_ray.sources.readers import read_fixed_width

        ds = read_fixed_width(path, {"widths": [("symbol", 10), ("price", 6)]})
        df = ds.to_pandas()
        assert df["symbol"].tolist() == ["AAPL", "MSFT"]
        assert df["price"].tolist() == ["000145", "000332"]


class TestExecutableSource:
    """SHOW/DESCRIBE results usable as FROM sources (reference
    core/ops/Executable.scala:10-14, README.md:766-779)."""

    def test_select_from_show_views(self, ray_session, tmp_path):
        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root=str(tmp_path))
        eng.sql("CREATE VIEW alpha AS SELECT 1 AS x")
        eng.sql("CREATE VIEW beta AS SELECT 2 AS x")
        df = eng.sql(
            "SELECT * FROM (SHOW VIEWS) WHERE name LIKE 'a%'").to_pandas()
        assert df["name"].tolist() == ["alpha"]

    def test_select_from_show_tables_with_agg(self, engine):
        df = engine.sql(
            "SELECT COUNT(*) AS n FROM (SHOW TABLES)").to_pandas()
        assert df["n"][0] >= 10  # the sf tables are registered

    def test_select_from_describe(self, engine):
        df = engine.sql(
            "SELECT Column FROM (DESCRIBE nation) ORDER BY Column"
        ).to_pandas()
        assert "n_name" in df["Column"].tolist()

    def test_decompiler_roundtrip(self):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse

        sql = "SELECT * FROM (SHOW VIEWS) WHERE name LIKE 'a%'"
        stmt = parse(sql)[0]
        assert to_sql(parse(to_sql(stmt))[0]) == to_sql(stmt)


class TestExplain:
    def test_explain_shows_operator_chain(self, engine):
        out = engine.sql(
            "EXPLAIN SELECT o_orderstatus, COUNT(*) AS n FROM orders "
            "GROUP BY o_orderstatus").to_pandas()
        text = "\n".join(out["plan"])
        assert "MapBatches" in text          # the lowered Ray Data chain
        # small partial sets finish in one merge task instead of a shuffle
        assert "Aggregate" in text or "Sort" in text \
            or "MergePartialsTask" in text

    def test_explain_decompiles(self):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse

        stmt = parse("EXPLAIN SELECT a FROM t WHERE a > 1")[0]
        assert to_sql(stmt).startswith("EXPLAIN SELECT")


class TestWithCtes:
    """WITH ... AS (...) common table expressions — statement-scoped views."""

    def test_single_cte(self, engine, duck):
        sql = ("WITH big AS (SELECT o_custkey, COUNT(*) AS n FROM orders "
               "GROUP BY o_custkey) SELECT COUNT(*) AS m FROM big "
               "WHERE n > 10")
        mine = engine.sql(sql).to_pandas()
        oracle = duck.execute(sql).fetch_df()
        assert mine["m"].tolist() == oracle["m"].tolist()

    def test_chained_ctes_and_join(self, engine, duck):
        sql = ("WITH co AS (SELECT o_custkey AS k, COUNT(*) AS n "
               "FROM orders GROUP BY o_custkey), "
               "top AS (SELECT k FROM co WHERE n > 12) "
               "SELECT c.c_mktsegment, COUNT(*) AS nc FROM customer c "
               "INNER JOIN top t ON c.c_custkey = t.k "
               "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment")
        mine = engine.sql(sql).to_pandas()
        oracle = duck.execute(sql.replace("INNER JOIN", "JOIN")).fetch_df()
        assert mine["c_mktsegment"].tolist() == oracle["c_mktsegment"].tolist()
        assert mine["nc"].tolist() == oracle["nc"].tolist()

    def test_scalar_subquery_over_cte(self, engine, duck):
        # TPC-H Q15 shape
        sql = ("WITH revenue AS (SELECT l_suppkey, "
               "ROUND(SUM(l_extendedprice * (1 - l_discount)) * 10000, 0) "
               "/ 10000 AS tr FROM lineitem GROUP BY l_suppkey) "
               "SELECT s.s_suppkey FROM supplier s "
               "INNER JOIN revenue r ON s.s_suppkey = r.l_suppkey "
               "WHERE r.tr = (SELECT MAX(r2.tr) FROM revenue r2)")
        mine = engine.sql(sql).to_pandas()
        oracle = duck.execute(sql.replace("INNER JOIN", "JOIN")).fetch_df()
        assert sorted(mine["s_suppkey"]) == sorted(oracle["s_suppkey"])

    def test_cte_shadows_and_restores_view(self, engine):
        engine.sql("CREATE VIEW shadowed AS SELECT 1 AS one")
        df = engine.sql(
            "WITH shadowed AS (SELECT 2 AS two) SELECT * FROM shadowed"
        ).to_pandas()
        assert list(df.columns) == ["two"]
        df2 = engine.sql("SELECT * FROM shadowed").to_pandas()
        assert list(df2.columns) == ["one"]

    def test_with_recursive_non_recursive_body(self, engine):
        # RECURSIVE keyword with a body that never self-references:
        # behaves exactly like a plain CTE (ANSI semantics; the full
        # fixpoint path is covered in tests/test_recursive.py)
        df = engine.sql("WITH RECURSIVE r AS (SELECT 1 AS x) "
                        "SELECT * FROM r").to_pandas()
        assert df["x"].tolist() == [1]

    def test_decompile_round_trip(self):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse_one

        sql = ("WITH a AS (SELECT x FROM t), b AS (SELECT y FROM u) "
               "SELECT a.x FROM a INNER JOIN b ON a.x = b.y")
        ast1 = parse_one(sql)
        rendered = to_sql(ast1)
        assert parse_one(rendered) == ast1


class TestNestedCtes:
    def test_with_in_subquery_source(self, engine, duck):
        sql = ("SELECT COUNT(*) AS n FROM (WITH a AS "
               "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000) "
               "SELECT * FROM a)")
        mine = engine.sql(sql).to_pandas()
        oracle = duck.execute(sql + " t").fetch_df()
        assert mine["n"].tolist() == oracle["n"].tolist()

    def test_with_inside_cte_body(self, engine, duck):
        sql = ("WITH outerx AS (WITH inner1 AS "
               "(SELECT o_custkey AS k FROM orders) "
               "SELECT k, COUNT(*) AS n FROM inner1 GROUP BY k) "
               "SELECT COUNT(*) AS m FROM outerx")
        mine = engine.sql(sql).to_pandas()
        oracle = duck.execute(sql).fetch_df()
        assert mine["m"].tolist() == oracle["m"].tolist()

    def test_with_as_join_source(self, engine, duck):
        sql = ("SELECT COUNT(*) AS n FROM orders o INNER JOIN "
               "(WITH t AS (SELECT o_custkey AS k FROM orders "
               "WHERE o_totalprice > 400000) SELECT DISTINCT k FROM t) d "
               "ON o.o_custkey = d.k")
        mine = engine.sql(sql).to_pandas()
        oracle = duck.execute(sql.replace("INNER JOIN", "JOIN")).fetch_df()
        assert mine["n"].tolist() == oracle["n"].tolist()


class TestPartitionedInsert:
    def test_hive_partitioned_parquet(self, tmp_engine, tmp_path):
        out = os.path.join(str(tmp_path), "part_lake")
        res = tmp_engine.sql(
            f"INSERT INTO '{out}' (o_orderstatus, o_orderkey, o_totalprice) "
            f"WITH PARTITION (o_orderstatus) "
            f"SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders")
        assert to_pandas(res)["ROWS_INSERTED"][0] == 1500
        dirs = sorted(os.listdir(out))
        assert dirs == ["o_orderstatus=F", "o_orderstatus=O",
                        "o_orderstatus=P"]
        back = to_pandas(tmp_engine.sql(
            f"SELECT COUNT(*) AS n FROM '{out}'"))
        assert back["n"][0] == 1500


class TestDrop:
    def test_drop_view(self, tmp_engine):
        tmp_engine.sql("CREATE VIEW dv AS SELECT 1 AS x")
        assert "dv" in tmp_engine.views
        tmp_engine.sql("DROP VIEW dv")
        assert "dv" not in tmp_engine.views
        with pytest.raises(ValueError, match="does not exist"):
            tmp_engine.sql("DROP VIEW dv")
        tmp_engine.sql("DROP VIEW IF EXISTS dv")  # no-op

    def test_drop_function_and_procedure(self, tmp_engine):
        tmp_engine.sql("CREATE FUNCTION df(a) AS RETURN (a + 1)")
        tmp_engine.sql("DROP FUNCTION df")
        assert "DF" not in tmp_engine.sql_functions
        tmp_engine.sql("CREATE PROCEDURE dp() AS BEGIN SELECT 1 AS x END")
        tmp_engine.sql("DROP PROCEDURE IF EXISTS dp")
        assert "dp" not in tmp_engine.procedures

    def test_decompile(self):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse_one

        for sql in ["DROP VIEW v", "DROP FUNCTION IF EXISTS f"]:
            assert parse_one(to_sql(parse_one(sql))) == parse_one(sql)


class TestExplainAnalyze:
    def test_analyze_appends_stage_stats(self, tmp_engine):
        out = to_pandas(tmp_engine.sql(
            "EXPLAIN ANALYZE SELECT o_orderstatus, COUNT(*) AS n "
            "FROM orders GROUP BY o_orderstatus"))
        text = "\n".join(out["plan"])
        assert "--- ANALYZE ---" in text
        assert "Operator" in text  # Ray stage stats present

    def test_decompile(self):
        from qwery_ray.sqlc.decompiler import to_sql
        from qwery_ray.sqlc.parser import parse_one

        sql = "EXPLAIN ANALYZE SELECT a FROM t"
        assert parse_one(to_sql(parse_one(sql))) == parse_one(sql)


class TestDelete:
    """DELETE FROM <file> [WHERE] — atomic rewrite; NULL predicates keep
    the row (SQL semantics); no-WHERE removes everything."""

    def _make(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = str(tmp_path / "d.parquet")
        pq.write_table(pa.table({"k": [1, 2, 3, 4],
                                 "v": [10.0, None, 30.0, 40.0]}), p)
        return p

    def test_delete_where(self, engine, tmp_path):
        p = self._make(tmp_path)
        out = engine.sql(f"DELETE FROM '{p}' WHERE v > 25").to_pandas()
        assert out["ROWS_DELETED"].tolist() == [2]
        rest = engine.sql(f"SELECT k FROM '{p}' ORDER BY k").to_pandas()
        assert rest["k"].tolist() == [1, 2]  # NULL v kept

    def test_delete_all(self, engine, tmp_path):
        p = self._make(tmp_path)
        out = engine.sql(f"DELETE FROM '{p}'").to_pandas()
        assert out["ROWS_DELETED"].tolist() == [4]
        import pyarrow.parquet as pq
        t = pq.read_table(p)
        assert len(t) == 0 and t.column_names == ["k", "v"]

    def test_delete_round_trip(self):
        from qwery_ray.sqlc import parser as P
        from qwery_ray.sqlc.decompiler import to_sql

        stmt = P.parse("DELETE FROM 'x.parquet' WHERE a >= 5")[0]
        assert P.parse(to_sql(stmt))[0] == stmt


class TestCreateTableAs:
    """CTAS sugar: CREATE [OR REPLACE] TABLE t AS q materializes q as
    <root>/t.parquet (bare-name reads resolve to it); plain CREATE errors
    on an existing table."""

    def test_ctas_roundtrip(self, ray_session, tmp_path):
        import shutil

        from qwery_ray import QweryEngine

        from conftest import SF_TINY

        shutil.copy(f"{SF_TINY}/orders.parquet", tmp_path / "orders.parquet")
        eng = QweryEngine(table_root=str(tmp_path))
        eng.sql("CREATE TABLE big AS SELECT o_orderkey, o_totalprice "
                "FROM orders WHERE o_totalprice > 200000")
        assert (tmp_path / "big.parquet").exists()
        out = eng.sql("SELECT COUNT(*) AS n FROM big")
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert int(out["n"][0]) > 0

        import pytest

        with pytest.raises(ValueError):
            eng.sql("CREATE TABLE big AS SELECT 1 AS x")
        eng.sql("CREATE OR REPLACE TABLE big AS SELECT 1 AS x")
        out = eng.sql("SELECT * FROM big")
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert list(out.columns) == ["x"] and len(out) == 1


class TestCopyToAndTopLevelValues:
    """DuckDB-style COPY … TO export sugar (desugars to INSERT OVERWRITE)
    and bare top-level VALUES queries."""

    def test_copy_query_to_parquet(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root="/root/testdata/sf0.001")
        out = str(tmp_path / "r.parquet")
        eng.sql(f"COPY (SELECT r_regionkey, UPPER(r_name) AS name "
                f"FROM region) TO '{out}' (FORMAT PARQUET)")
        t = pq.read_table(out)
        assert t.num_rows == 5 and "name" in t.column_names

    def test_copy_table_to_csv_roundtrip(self, ray_session, tmp_path):
        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root="/root/testdata/sf0.001")
        out = str(tmp_path / "region.csv")
        eng.sql(f"COPY region TO '{out}' (FORMAT CSV, HEADER)")
        back = eng.sql(f"SELECT COUNT(*) AS n FROM '{out}'").to_pandas()
        assert back.n.iloc[0] == 5

    def test_top_level_values(self, ray_session):
        from qwery_ray import QweryEngine

        eng = QweryEngine(table_root="/root/testdata/sf0.001")
        df = eng.sql("VALUES (1, 'a'), (2, 'b'), (3, NULL)").to_pandas()
        assert len(df) == 3
        assert df.iloc[1].tolist() == [2, "b"]


class TestUpdateWhereInPlace:
    """ANSI in-place UPDATE t SET a = e [WHERE cond] (no FROM … KEYED ON):
    matching rows rewritten atomically, SET expressions may reference the
    row's own columns."""

    def _mk(self, tmp_path):
        import shutil

        from qwery_ray import QweryEngine

        shutil.copy("/root/testdata/sf0.001/region.parquet", tmp_path)
        return QweryEngine(table_root=str(tmp_path)), \
            f"{tmp_path}/region.parquet"

    def test_update_where(self, ray_session, tmp_path):
        eng, path = self._mk(tmp_path)
        out = eng.sql(f"UPDATE '{path}' SET r_name = LOWER(r_name) "
                      f"WHERE r_regionkey < 2").to_pandas()
        assert out.ROWS_UPDATED.iloc[0] == 2
        back = eng.sql(f"SELECT r_name FROM '{path}' "
                       f"ORDER BY r_regionkey").to_pandas()
        assert back.r_name.tolist()[:3] == ["africa", "america", "ASIA"]

    def test_update_all_and_null_predicate(self, ray_session, tmp_path):
        eng, path = self._mk(tmp_path)
        out = eng.sql(f"UPDATE '{path}' SET r_name = 'X'").to_pandas()
        assert out.ROWS_UPDATED.iloc[0] == 5
        # NULL predicate skips the row (SQL semantics)
        out2 = eng.sql(f"UPDATE '{path}' SET r_name = 'Y' "
                       f"WHERE NULL").to_pandas()
        assert out2.ROWS_UPDATED.iloc[0] == 0

    def test_reference_form_still_works(self, ray_session, tmp_path):
        eng, path = self._mk(tmp_path)
        eng.sql(f"UPDATE '{path}' SET r_name = 'Z' "
                f"FROM (SELECT 0 AS r_regionkey) KEYED ON r_regionkey")
        back = eng.sql(f"SELECT r_name FROM '{path}' WHERE r_regionkey = 0"
                       ).to_pandas()
        assert back.r_name.tolist() == ["Z"]
