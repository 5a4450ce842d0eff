"""QweryEngine — the session: catalog, variables, views, functions, procedures.

The Ray-Data analogue of the reference's hierarchical ``Scope``
(core/ops/Scope.scala:18-30): variables/views/functions live driver-side in
plain registries; ``{{ var }}`` handlebars expansion of paths
(Scope.scala:127-146) happens before plan build; expressions compile to
vectorized Arrow kernels so no per-row scope exists at run time.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Any, Callable, Optional

import pyarrow as pa
import ray.data as rd

from ..sqlc import ast as A
from ..sqlc.compiler import Compiler, _env, make_evaluator
from ..sqlc.parser import _ScalarSubquery, parse
from ..sqlc.rewrite import substitute_columns, transform_expr

_HANDLEBARS = re.compile(r"\{\{\s*([\w.]+)\s*\}\}")


class QweryEngine:
    def __init__(self, table_root: Optional[str] = None, *,
                 now: Any = None, seed: int = 42):
        self.table_root = table_root
        self.tables: dict[str, str] = {}  # name(lower) → path
        self.views: dict[str, A.Statement] = {}
        self.variables: dict[str, Any] = {"__seed": seed}
        self.udfs: dict[str, tuple[Callable, bool]] = {}  # python UDFs
        self.sql_functions: dict[str, A.CreateFunction] = {}
        self.procedures: dict[str, A.CreateProcedure] = {}
        self.now = now
        self.compiler = Compiler(self)
        if table_root:
            self._auto_register(table_root)

    # ------------------------------------------------------------- catalog
    def _auto_register(self, root: str):
        if not os.path.isdir(root):
            return
        for fname in sorted(os.listdir(root)):
            if fname.endswith(".parquet"):
                self.tables[os.path.splitext(fname)[0].lower()] = \
                    os.path.join(root, fname)

    def register_table(self, name: str, path: str):
        self.tables[name.lower()] = path

    def register_function(self, name: str, fn: Callable, *, vectorized: bool = True):
        """Python scalar UDF — the rebuild's user-extension surface
        (reference: CREATE FUNCTION, core/ops/Function.scala).
        Vectorized fns receive/return pyarrow arrays; non-vectorized are
        mapped per element (slow path)."""
        self.udfs[name.upper()] = (fn, vectorized)

    def resolve_table_path(self, name: str) -> str:
        low = name.lower()
        if low in self.tables:
            return self.tables[low]
        if os.path.exists(name):
            return name
        if self.table_root:
            for ext in (".parquet", ".csv", ".json", ".tsv", ".psv"):
                cand = os.path.join(self.table_root, name + ext)
                if os.path.exists(cand):
                    return cand
            cand = os.path.join(self.table_root, name)
            if os.path.exists(cand):
                return cand
        return name  # let the reader raise on a truly missing path

    def expand_vars(self, text: str) -> str:
        """`{{ var }}` handlebars expansion (Scope.scala:127-146)."""
        return _HANDLEBARS.sub(
            lambda m: str(self.variables.get(m.group(1), m.group(0))), text)

    # ------------------------------------------------------------- execute
    def sql(self, text: str):
        """Parse and execute; returns the last statement's result
        (ray.data.Dataset for queries, pyarrow.Table for DML/utility rows)."""
        result = None
        for stmt in parse(text):
            result = self.execute(stmt)
        return result

    def execute(self, stmt: A.Statement):
        stmt = self._prepare(stmt)
        name = type(stmt).__name__
        handler = getattr(self, f"_exec_{name}", None)
        if handler is None:
            raise ValueError(f"cannot execute {name}")
        return handler(stmt)

    # statement preparation: inline SQL UDFs + resolve scalar subqueries
    def _prepare(self, stmt):
        def fix_expr(expr):
            if expr is None:
                return None
            expr = transform_expr(expr, self._expand_sql_udf)
            expr = transform_expr(expr, self._resolve_expr_exists)
            expr = transform_expr(expr, self._resolve_scalar_subquery)
            expr = transform_expr(expr, self._resolve_quantified)
            expr = transform_expr(expr, self._resolve_in_subquery)
            return expr

        return _map_statement_exprs(stmt, fix_expr)

    def _expand_sql_udf(self, node):
        if isinstance(node, A.FuncCall) and node.name in self.sql_functions:
            fn = self.sql_functions[node.name]
            if len(node.args) != len(fn.params):
                raise ValueError(
                    f"{node.name} expects {len(fn.params)} args, got {len(node.args)}")
            body = fn.body[-1]
            if not isinstance(body, A.Return) or body.value is None:
                raise ValueError(f"SQL function {node.name} must end with RETURN <expr>")
            mapping = {p.lower(): a for p, a in zip(fn.params, node.args)}
            out = substitute_columns(body.value, mapping)
            # params may be referenced again inside nested udf calls
            return transform_expr(out, self._expand_sql_udf)
        return node

    # IN (SELECT …) key sets up to this many rows inline as a broadcast
    # membership test; larger sets stay as InSubquery nodes and compile to a
    # hash semi-join (never millions of literals in the AST)
    IN_BROADCAST_LIMIT = 100_000

    def _resolve_in_subquery(self, node):
        """IN (SELECT …): probe the subquery size. Small key sets collect
        ONCE on the driver and rewrite to a vectorized is_in membership test
        (the guide's broadcast semi-join, no shuffle). Larger sets keep the
        InSubquery node — the compiler turns a top-level WHERE conjunct into
        a hash left_semi/left_anti join.
        NOTE: NOT IN follows the engine's non-null set semantics (null keys
        are dropped), diverging from ANSI's all-NULL poisoning."""
        if isinstance(node, A.InSubquery):
            ds = self.compiler.compile_query(self._prepare(node.query))
            rows = ds.limit(self.IN_BROADCAST_LIMIT + 1).take_all()
            if len(rows) > self.IN_BROADCAST_LIMIT:
                return node  # semi-join path (compiler)
            vals = {next(iter(r.values())) for r in rows}
            vals.discard(None)
            return A.InList(node.operand,
                            tuple(A.Literal(v) for v in sorted(vals)),
                            node.negated)
        return node

    def _resolve_quantified(self, node):
        """x op ANY/ALL (SELECT …): reduce the subquery to one aggregate
        pass (count / non-null count / min / max) and rewrite to a plain
        comparison against the literal bound. = ANY and <> ALL become
        IN / NOT IN and ride the broadcast/semi-join path. WHERE semantics
        (UNKNOWN ≡ FALSE); uncorrelated subqueries only."""
        if not isinstance(node, A.QuantifiedComparison):
            return node
        if self._is_correlated(node.query):
            raise ValueError(
                "correlated ANY/ALL subqueries are not supported "
                "(rewrite as EXISTS / a join)")
        if node.op == "=" and node.quant == "ANY":
            return A.InSubquery(node.left, node.query, False)
        if node.op == "!=" and node.quant == "ALL":
            return A.InSubquery(node.left, node.query, True)
        from ray.data.aggregate import Count, Max, Min

        ds = self.compiler.compile_query(self._prepare(node.query))
        schema = ds.schema(fetch_if_missing=True)
        if schema is None or not schema.names:  # empty result, no schema
            return A.Literal(node.quant == "ALL")
        name = schema.names[0]
        row = ds.aggregate(
            Count(name, ignore_nulls=False, alias_name="ca"),
            Count(name, ignore_nulls=True, alias_name="cn"),
            Min(name, ignore_nulls=True, alias_name="mn"),
            Max(name, ignore_nulls=True, alias_name="mx")) or {}
        ca, cn = row.get("ca") or 0, row.get("cn") or 0
        mn, mx = row.get("mn"), row.get("mx")
        L, op = node.left, node.op
        if node.quant == "ALL":
            if ca == 0:
                return A.Literal(True)
            if cn < ca:  # NULL in the set → never TRUE
                return A.Literal(False)
            if op in (">", ">="):
                return A.Comparison(op, L, A.Literal(mx))
            if op in ("<", "<="):
                return A.Comparison(op, L, A.Literal(mn))
            # op == "=": only satisfiable when the set has one distinct value
            return A.Comparison("=", L, A.Literal(mn)) if mn == mx \
                else A.Literal(False)
        # ANY: an empty or all-NULL set can never make it TRUE
        if cn == 0:
            return A.Literal(False)
        if op in (">", ">="):
            return A.Comparison(op, L, A.Literal(mn))
        if op in ("<", "<="):
            return A.Comparison(op, L, A.Literal(mx))
        # op == "!=": with ≥2 distinct values every non-NULL x differs
        # from at least one of them
        return A.IsNull(L, True) if mn != mx \
            else A.Comparison("!=", L, A.Literal(mn))

    def _resolve_expr_exists(self, node):
        """UNCORRELATED [NOT] EXISTS anywhere in an expression (CASE arms,
        select items, …) resolves to a boolean literal via a limit(1)
        probe; correlated EXISTS stays for the compiler's semi/anti-join
        decorrelation."""
        if isinstance(node, A.Exists) and not self._is_correlated(
                node.query):
            ds = self.compiler.compile_query(self._prepare(node.query))
            got = bool(ds.limit(1).take(1))
            return A.Literal(got != node.negated)
        return node

    def _resolve_scalar_subquery(self, node):
        if isinstance(node, _ScalarSubquery):
            if self._is_correlated(node.query):
                # references an outer column — the compiler decorrelates
                # it into a grouped join (never executed standalone: the
                # lenient by-name resolution would silently un-correlate)
                return node
            ds = self.compiler.compile_query(self._prepare(node.query))
            rows = ds.take(1)
            if not rows:
                return A.Literal(None)
            first = rows[0]
            return A.Literal(next(iter(first.values())))
        return node

    def _is_correlated(self, sub: A.Select) -> bool:
        """True when the subquery references a column outside its own FROM
        (alias-qualified refs to foreign aliases, or unqualified names its
        sources cannot resolve)."""
        if not isinstance(sub, A.Select) or sub.source is None:
            return False
        try:
            inner = self.compiler.compile_source(sub.source)
        except Exception:
            return False
        refs: list[A.ColumnRef] = []

        def walk(expr):
            from ..sqlc.rewrite import transform_expr

            def coll(n):
                if isinstance(n, A.ColumnRef):
                    refs.append(n)
                return n

            if expr is not None:
                transform_expr(expr, coll)

        for it in sub.items:
            if isinstance(it, A.SelectItem):
                walk(it.expr)
        walk(sub.where)
        walk(sub.having)
        for g in sub.group_by:
            walk(g)
        inner_cols = {c.lower() for c in inner.columns} | \
            {c.lower().split(".")[-1] for c in inner.columns}
        inner_aliases = set(inner.aliases)
        for r in refs:
            if r.table_alias:
                if r.table_alias.lower() not in inner_aliases:
                    return True
            elif r.name.lower() not in inner_cols:
                return True
        return False

    # ------------------------------------------------------ query handlers
    def _exec_Select(self, stmt: A.Select):
        return self.compiler.compile_select(stmt)

    def _exec_Union(self, stmt: A.Union):
        return self.compiler.compile_query(stmt)

    def _exec_SetOp(self, stmt: A.SetOp):
        return self.compiler.compile_query(stmt)

    def _exec_Values(self, stmt: A.Values):
        return self.compiler.compile_values(stmt, ())

    def _exec_Pivot(self, stmt: A.Pivot):
        """Dynamic PIVOT (no IN list): discover the pivot values with a
        small DISTINCT scan (sorted ascending — DuckDB's column order),
        then run the same CASE-aggregate rewrite as the explicit form."""
        from ..sqlc.parser import pivot_to_select

        cap = 10_000  # a pivot emits one COLUMN per value; cap hard
        probe = A.Select(
            items=(A.SelectItem(A.ColumnRef(stmt.on), None),),
            source=stmt.table, distinct=True,
            order_by=(A.OrderItem(A.ColumnRef(stmt.on), True),),
            limit=cap + 1)
        rows = self.compiler.compile_select(probe).take(cap + 1)
        key = next(iter(rows[0])) if rows else stmt.on
        vals = [r[key] for r in rows if r[key] is not None]
        if len(rows) > cap:
            raise ValueError(
                f"PIVOT ON {stmt.on} has more than {cap} distinct values; "
                "pass an explicit IN (...) list")
        return self.compiler.compile_select(
            pivot_to_select(stmt.table, stmt.on, vals, stmt.agg,
                            list(stmt.group_by)))

    def _exec_Unpivot(self, stmt: A.Unpivot):
        return self.compiler.compile_unpivot(stmt)

    # -------------------------------------------------------- DML handlers
    def _exec_Insert(self, stmt: A.Insert):
        from ..sources.writers import write_sink

        if isinstance(stmt.source, A.Values):
            ds = self.compiler.compile_values(stmt.source, stmt.columns)
        else:
            ds = self.compiler.compile_query(stmt.source)
            if stmt.columns:
                # positional re-label (reference Insert.scala:19-21)
                ds = ds.map_batches(_PositionalRename(stmt.columns),
                                    batch_format="pyarrow")
        target = self.expand_vars(stmt.target)
        if stmt.hints.get("create_table"):
            # CTAS: a bare table name materializes under the session root
            # so later bare-name reads resolve to it (resolve_table_path
            # only finds EXISTING paths — build the new path explicitly)
            if "://" not in target and not os.path.isabs(target) \
                    and os.sep not in target \
                    and "." not in os.path.basename(target):
                target = os.path.join(self.table_root or ".",
                                      target + ".parquet")
            if os.path.exists(target) and not stmt.hints.get("or_replace"):
                raise ValueError(
                    f"table already exists: {target} "
                    "(use CREATE OR REPLACE TABLE)")
        # relative paths stay relative to cwd, matching the reference
        inserted = write_sink(ds, target, stmt.hints, overwrite=stmt.overwrite)
        return pa.table({"ROWS_INSERTED": [inserted], "ROWS_REJECTED": [0]})

    def _exec_Upsert(self, stmt: A.Upsert):
        """UPSERT INTO target KEYED ON k — last-writer-wins merge (reference
        semantics: ops/sql/Upsert.scala + JDBCOutputSource.scala:62-104,
        insert-else-update).

        Two targets:
        - a parquet FILE → driver-side keyed merge (dimension-table scale)
        - a LAKE directory (``WITH LAKE`` hint or existing manifest.json) →
          the full streaming CDC engine: the source must carry an ``lsn``
          column (per-key ordering authority); ``op`` defaults to upsert."""
        if isinstance(stmt.source, A.Values):
            ds = self.compiler.compile_values(stmt.source, stmt.columns)
        else:
            ds = self.compiler.compile_query(stmt.source)
            if stmt.columns:
                ds = ds.map_batches(_PositionalRename(stmt.columns),
                                    batch_format="pyarrow")
        target = self.expand_vars(stmt.target)
        path = self.resolve_table_path(target)

        is_lake = stmt.hints.get("lake") or os.path.exists(
            os.path.join(path, "manifest.json"))
        if is_lake:
            return self._upsert_into_lake(ds, path, list(stmt.keyed_on))
        from ..cdc.upsert import upsert_into_parquet

        ins, upd = upsert_into_parquet(ds, path, list(stmt.keyed_on))
        return pa.table({"ROWS_INSERTED": [ins], "ROWS_UPDATED": [upd],
                         "ROWS_REJECTED": [0]})

    def _upsert_into_lake(self, ds, lake_dir: str, keys: list[str]):
        """Route a SQL UPSERT through the exactly-once CDC lake engine."""
        import shutil
        import tempfile

        from ..cdc.engine import CDCLakeEngine

        def ensure_op(batch: pa.Table) -> pa.Table:
            if "op" not in batch.column_names:
                batch = batch.append_column(
                    "op", pa.array(["upsert"] * len(batch)))
            return batch

        ds = ds.map_batches(ensure_op, batch_format="pyarrow")
        staging = tempfile.mkdtemp(prefix="qwery_upsert_events_")
        try:
            ds.write_parquet(staging)
            eng = CDCLakeEngine(lake_dir, key_cols=keys)
            before = eng.load_manifest()["watermark_lsn"]
            manifest = eng.replay(staging)
            applied = [t for t in manifest["lineage"]
                       if t["lo"] >= before]
            ins = sum(t["rows_upserted"] for t in applied)
            dels = sum(t["rows_deleted"] for t in applied)
            return pa.table({"ROWS_INSERTED": [ins], "ROWS_UPDATED": [0],
                             "ROWS_DELETED": [dels], "ROWS_REJECTED": [0]})
        except ValueError as exc:
            if "lsn" in str(exc):
                raise ValueError(
                    "UPSERT into a lake target requires an 'lsn' column in "
                    "the source (per-key ordering authority); add one, e.g. "
                    "SELECT ..., event_id AS lsn ...") from exc
            raise
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _exec_Merge(self, stmt: A.Merge):
        """ANSI MERGE INTO — see cdc/merge_stmt.py for the semantics.
        Targets: a parquet file (driver path below / distributed bucket
        path above MERGE_DISTRIBUTED_BYTES, also forced by a big source)
        or a CDC LAKE directory (r5: the arms run against the committed
        LWW snapshot and commit as one exactly-once transaction)."""
        from ..cdc.merge_stmt import merge_into_parquet

        return merge_into_parquet(self, stmt)

    def _exec_Update(self, stmt: A.Update):
        from ..cdc.upsert import update_parquet

        if stmt.source is None:
            # ANSI in-place form: UPDATE t SET a = e [WHERE cond]
            from ..cdc.upsert import update_where_parquet

            path = self.resolve_table_path(self.expand_vars(stmt.target))
            updated = update_where_parquet(
                path, list(stmt.assignments), stmt.where, _env(self))
            return pa.table({"ROWS_UPDATED": [updated],
                             "ROWS_REJECTED": [0]})
        ds = self.compiler.compile_query(stmt.source)
        path = self.resolve_table_path(self.expand_vars(stmt.target))
        env = _env(self)
        updated = update_parquet(ds, path, list(stmt.keyed_on),
                                 list(stmt.assignments), env)
        return pa.table({"ROWS_UPDATED": [updated], "ROWS_REJECTED": [0]})

    def _exec_Delete(self, stmt: A.Delete):
        from ..cdc.upsert import delete_parquet

        path = self.resolve_table_path(self.expand_vars(stmt.target))
        deleted = delete_parquet(path, stmt.where, _env(self))
        return pa.table({"ROWS_DELETED": [deleted]})

    # ---------------------------------------------------- session handlers
    def _exec_Declare(self, stmt: A.Declare):
        self.variables.setdefault(stmt.name, None)
        return None

    def _exec_SetVar(self, stmt: A.SetVar):
        if isinstance(stmt.value, A.Statement) and not isinstance(stmt.value, A.Expr):
            ds = self.compiler.compile_query(stmt.value)
            rows = ds.take(1)
            self.variables[stmt.name] = next(iter(rows[0].values())) if rows else None
        else:
            ev = make_evaluator(_env(self))
            val = ev.eval(stmt.value, pa.table({"__one": [1]}))
            if isinstance(val, (pa.Array, pa.ChunkedArray)):
                val = val.to_pylist()[0]
            self.variables[stmt.name] = val
        return None

    def _exec_CreateView(self, stmt: A.CreateView):
        self.views[stmt.name.lower()] = stmt.query
        return None

    def _exec_Optimize(self, stmt: A.Optimize):
        """OPTIMIZE '<lake>' [PARTITION (...)]: fold merge-on-read deltas
        into partition bases via CDCLakeEngine.compact()."""
        from ..cdc.engine import CDCLakeEngine

        path = self.resolve_table_path(self.expand_vars(stmt.target))
        eng = CDCLakeEngine.open(path)
        before = eng.load_manifest()
        pending = [pid for pid, info in before["partitions"].items()
                   if info.get("deltas")
                   and (not stmt.partitions
                        or int(pid) in stmt.partitions)]
        after = eng.compact(list(stmt.partitions) or None)
        return pa.table({
            "PARTITIONS_COMPACTED": pa.array([len(pending)],
                                             type=pa.int64()),
            "VERSION": pa.array([after["version"]], type=pa.int64()),
        })

    def _exec_Vacuum(self, stmt: A.Vacuum):
        """VACUUM '<lake>' [RETAIN n VERSIONS]: retention GC via
        CDCLakeEngine.vacuum()."""
        from ..cdc.engine import CDCLakeEngine

        path = self.resolve_table_path(self.expand_vars(stmt.target))
        out = CDCLakeEngine.open(path).vacuum(stmt.retain)
        return pa.table({
            "FILES_REMOVED": pa.array([out["files_removed"]],
                                      type=pa.int64()),
            "VERSIONS_DROPPED": pa.array([out["versions_dropped"]],
                                         type=pa.int64()),
            "VERSION": pa.array([out["version"]], type=pa.int64()),
        })

    def _exec_Drop(self, stmt: A.Drop):
        reg, key = {
            "VIEW": (self.views, stmt.name.lower()),
            "FUNCTION": (self.sql_functions, stmt.name.upper()),
            "PROCEDURE": (self.procedures, stmt.name.lower()),
        }[stmt.kind]
        if key not in reg:
            if stmt.if_exists:
                return None
            raise ValueError(f"{stmt.kind.lower()} {stmt.name!r} does not exist")
        del reg[key]
        return None

    def _exec_WithCtes(self, stmt: A.WithCtes):
        """CTEs = statement-scoped views: register, run the body (plans
        lower during execute — lazy Datasets keep working after the scope
        closes), restore any shadowed names. Self-referencing CTEs under
        WITH RECURSIVE run semi-naive fixpoint iteration first
        (sqlc/recursive.py) and register as materialized tables."""
        from ..sqlc.recursive import references_table, run_recursive_cte

        saved: dict[str, A.Statement] = {}
        added: list[str] = []
        try:
            for name, query, cols in stmt.ctes:
                key = name.lower()
                if key in self.views:
                    saved[key] = self.views[key]
                else:
                    added.append(key)
                if stmt.recursive and references_table(query, name):
                    self.views[key] = A.MaterializedTable(
                        run_recursive_cte(self, name, query, cols), name)
                elif cols is not None:
                    raise ValueError(
                        "CTE column lists are supported on recursive CTEs "
                        f"only (add column aliases inside {name!r} instead)")
                else:
                    self.views[key] = query
            return self.execute(stmt.body)
        finally:
            for key in added:
                self.views.pop(key, None)
            self.views.update(saved)

    def _exec_CreateFunction(self, stmt: A.CreateFunction):
        self.sql_functions[stmt.name.upper()] = stmt
        return None

    def _exec_CreateProcedure(self, stmt: A.CreateProcedure):
        self.procedures[stmt.name.lower()] = stmt
        return None

    def _exec_Call(self, stmt: A.Call):
        proc = self.procedures.get(stmt.name.lower())
        if proc is None:
            raise ValueError(f"unknown procedure {stmt.name}")
        ev = make_evaluator(_env(self))
        dummy = pa.table({"__one": [1]})
        saved = dict(self.variables)
        try:
            for p, a in zip(proc.params, stmt.args):
                val = ev.eval(a, dummy)
                if isinstance(val, (pa.Array, pa.ChunkedArray)):
                    val = val.to_pylist()[0]
                self.variables[p] = val
            result = None
            for s in proc.body:
                result = self.execute(s)
            return result
        finally:
            self.variables = saved

    def _exec_CodeBlock(self, stmt: A.CodeBlock):
        result = None
        for s in stmt.statements:
            result = self.execute(s)
        return result

    def _exec_Return(self, stmt: A.Return):
        if stmt.value is None:
            return None
        ev = make_evaluator(_env(self))
        val = ev.eval(stmt.value, pa.table({"__one": [1]}))
        if isinstance(val, (pa.Array, pa.ChunkedArray)):
            val = val.to_pylist()[0]
        return pa.table({"RETURN_VALUE": [val]})

    def _exec_NativeSQL(self, stmt: A.NativeSQL):
        """Escape hatch: raw SQL through DuckDB over the same catalog
        (reference NativeSQL.scala's JDBC passthrough, with {{var}}
        expansion)."""
        import duckdb

        conn_str = stmt.connection or ""
        if conn_str.startswith("duckdb:"):
            con = duckdb.connect(conn_str[len("duckdb:"):])
        else:
            con = duckdb.connect()
        try:
            for name, path in self.tables.items():
                con.execute(
                    f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{path}')")
            return con.execute(self.expand_vars(stmt.query)).fetch_arrow_table()
        finally:
            con.close()

    # ---------------------------------------------------- introspection
    def _exec_Explain(self, stmt: A.Explain):
        """The compiled (lazy, unexecuted) Ray Data operator chain — the
        Dataset repr shows the logical operator DAG the query lowers to."""
        inner = self._prepare(stmt.query)
        result = self.execute(inner) if not isinstance(
            inner, (A.Select, A.Union, A.SetOp)) else \
            self.compiler.compile_query(inner)
        import ray.data as rd

        if not isinstance(result, rd.Dataset):
            lines = [f"(materialized {type(result).__name__})"]
        else:
            lines = [ln.rstrip() for ln in repr(result).splitlines()
                     if ln.strip()]
            if stmt.analyze:
                # execute and append Ray's per-operator stage statistics
                mat = result.materialize()
                lines.append("--- ANALYZE ---")
                lines.extend(ln.rstrip() for ln in mat.stats().splitlines()
                             if ln.strip())
        return pa.table({"plan": pa.array(lines, type=pa.string())})

    def _exec_Describe(self, stmt: A.Describe):
        """One-row sample + runtime types (reference Describe.scala:13-25)."""
        frame = self.compiler.compile_source(stmt.source)
        rows = frame.ds.take(stmt.limit or 1)
        if not rows:
            return pa.table({"Column": [], "Type": [], "Sample": []})
        first = rows[0]
        return pa.table({
            "Column": list(first.keys()),
            "Type": [type(v).__name__ for v in first.values()],
            "Sample": [str(v) for v in first.values()],
        })

    def _exec_Show(self, stmt: A.Show):
        ent = stmt.entity.upper()
        if ent == "TABLES":
            return pa.table({"name": sorted(self.tables),
                             "path": [self.tables[k] for k in sorted(self.tables)]})
        if ent == "VIEWS":
            return pa.table({"name": sorted(self.views)})
        if ent == "FUNCTIONS":
            names = sorted(set(self.sql_functions) | set(self.udfs))
            return pa.table({"name": names})
        if ent == "PROCEDURES":
            return pa.table({"name": sorted(self.procedures)})
        if ent == "VARIABLES":
            keys = sorted(k for k in self.variables if not k.startswith("__"))
            return pa.table({"name": keys,
                             "value": [str(self.variables[k]) for k in keys]})
        if ent == "FILES":
            root = self.table_root or "."
            paths = []
            for dirpath, _, files in os.walk(root):
                for f in files:
                    paths.append(os.path.join(dirpath, f))
            return pa.table({"path": sorted(paths)})
        raise ValueError(f"SHOW {ent} not supported")


class _PositionalRename:
    """INSERT field list re-labels source columns by POSITION
    (reference Insert.scala:19-21: ``fields zip row.columns``)."""

    def __init__(self, columns):
        self.columns = list(columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(self.columns)
        if batch.num_columns < n:
            raise ValueError(
                f"INSERT column list has {n} names but source emits "
                f"{batch.num_columns} columns")
        batch = batch.select(batch.column_names[:n])
        return batch.rename_columns(self.columns)


def _map_statement_exprs(stmt, fix: Callable):
    """Apply ``fix`` to every expression position of a statement tree."""
    if isinstance(stmt, A.Select):
        def fix_item(it):
            if isinstance(it, A.Star):
                if it.replace:
                    return A.Star(it.table_alias, it.exclude,
                                  tuple((fix(ex), n) for ex, n in it.replace))
                return it
            return A.SelectItem(fix(it.expr), it.alias)

        items = tuple(fix_item(it) for it in stmt.items)
        joins = tuple(
            dataclasses.replace(j, right=_map_source(j.right, fix),
                                on=fix(j.on))
            for j in stmt.joins)
        return dataclasses.replace(
            stmt,
            items=items,
            source=_map_source(stmt.source, fix),
            joins=joins,
            where=fix(stmt.where),
            group_by=tuple(fix(g) for g in stmt.group_by),
            having=fix(stmt.having),
            order_by=tuple(A.OrderItem(fix(o.expr), o.ascending,
                                       o.nulls_first)
                           for o in stmt.order_by),
            qualify=fix(stmt.qualify))
    if isinstance(stmt, A.Union):
        return A.Union(_map_statement_exprs(stmt.left, fix),
                       _map_statement_exprs(stmt.right, fix), stmt.distinct,
                       stmt.by_name)
    if isinstance(stmt, A.SetOp):
        return A.SetOp(stmt.op, _map_statement_exprs(stmt.left, fix),
                       _map_statement_exprs(stmt.right, fix), stmt.all)
    if isinstance(stmt, A.Insert):
        return A.Insert(stmt.target, stmt.columns,
                        _map_statement_exprs(stmt.source, fix),
                        stmt.overwrite, stmt.hints)
    if isinstance(stmt, A.Upsert):
        return A.Upsert(stmt.target, stmt.columns,
                        _map_statement_exprs(stmt.source, fix),
                        stmt.keyed_on, stmt.hints)
    if isinstance(stmt, A.Update):
        return A.Update(stmt.target,
                        tuple((n, fix(e)) for n, e in stmt.assignments),
                        _map_statement_exprs(stmt.source, fix)
                        if stmt.source is not None else None,
                        stmt.keyed_on, where=fix(stmt.where))
    if isinstance(stmt, A.Delete):
        return A.Delete(stmt.target, fix(stmt.where))
    if isinstance(stmt, A.Values):
        return A.Values(tuple(tuple(fix(e) for e in row)
                              for row in stmt.rows), stmt.columns)
    if isinstance(stmt, A.SetVar):
        if isinstance(stmt.value, A.Expr):
            return A.SetVar(stmt.name, fix(stmt.value))
        return stmt
    if isinstance(stmt, A.Call):
        return A.Call(stmt.name, tuple(fix(a) for a in stmt.args))
    if isinstance(stmt, A.Return):
        return A.Return(fix(stmt.value) if stmt.value is not None else None)
    return stmt


def _map_source(src, fix):
    if src is None:
        return None
    if isinstance(src, A.SubquerySource):
        return A.SubquerySource(_map_statement_exprs(src.query, fix), src.alias)
    if isinstance(src, A.Select):
        return _map_statement_exprs(src, fix)
    return src
