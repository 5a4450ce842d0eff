"""Logical AST for the qwery SQL dialect, re-expressed for a Ray-Data engine.

The node inventory mirrors the reference's Executable/Expression/Condition
trees (reference: core/ops/Expression.scala:14-22, core/ops/Condition.scala:7-9,
core/ops/Executable.scala:10-14) but is a plain dataclass tree compiled to
Ray Data ``Dataset`` transformations — not an interpreter.

Intentional divergences from the reference (documented in SURVEY.md §7.3):
ORDER BY actually executes (dead in reference Select.scala:19), ``<=`` is
correct (reference Condition.scala:45 bug), GROUP BY supports multiple keys
(reference uses only the first, Select.scala:75-76).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


# ---------------------------------------------------------------- expressions
class Expr:
    """Base class for scalar expressions evaluated per batch."""


@dataclass(frozen=True)
class Literal(Expr):
    value: Any  # None = SQL NULL (reference: Expression.Null)


@dataclass(frozen=True)
class IntervalLit(Expr):
    """INTERVAL n UNIT — calendar months and/or fixed seconds. Exactly one
    of the two is nonzero for parsed literals (YEAR/QUARTER/MONTH → months;
    WEEK/DAY/HOUR/MINUTE/SECOND → seconds)."""

    months: int = 0
    seconds: float = 0.0


@dataclass(frozen=True)
class ColumnRef(Expr):
    name: str
    table_alias: Optional[str] = None  # reference: JoinField (core/ops/Field.scala:87-96)


@dataclass(frozen=True)
class VarRef(Expr):
    name: str  # @var — session variable (reference: core/ops/sql/Declare.scala)


@dataclass(frozen=True)
class BinaryOp(Expr):
    op: str  # + - * / % ** ||
    left: Expr
    right: Expr


@dataclass(frozen=True)
class UnaryOp(Expr):
    op: str  # -, +
    operand: Expr


@dataclass(frozen=True)
class FuncCall(Expr):
    name: str  # upper-cased
    args: tuple[Expr, ...]
    is_star: bool = False  # COUNT(*)
    distinct: bool = False  # COUNT(DISTINCT x) — superset of reference
    ignore_nulls: bool = False  # fn(x IGNORE NULLS) — window nav funcs
    order_by: tuple = ()  # STRING_AGG(x, sep ORDER BY y) — OrderItems


@dataclass(frozen=True)
class WindowCall(Expr):
    """fn(...) OVER (PARTITION BY … ORDER BY …) — superset of the reference
    (which has no window functions, SURVEY.md §2.5); compiled to
    groupby(partition).map_groups with per-group sort. Aggregate functions
    are cumulative when ORDER BY is present (ANSI default frame), else
    whole-partition."""

    func: "FuncCall"
    partition_by: tuple = ()
    order_by: tuple = ()  # of OrderItem
    # explicit frame: (lo, hi) — None = unbounded, 0 = CURRENT ROW,
    # otherwise ROWS: physical row offsets (-n = n PRECEDING) /
    # RANGE: value offsets relative to the single numeric ORDER BY key;
    # () = ANSI default (RANGE unbounded preceding → current row's peers)
    frame: tuple = ()
    frame_kind: str = "ROWS"  # "ROWS" | "RANGE" (only read when frame != ())
    named: Optional[str] = None  # `OVER w` — resolved at parse time against
    # the statement's WINDOW clause; never reaches the compiler
    # ANSI frame exclusion: NO OTHERS | CURRENT ROW | GROUP | TIES
    exclude: str = "NO OTHERS"


@dataclass(frozen=True)
class CaseWhen(Expr):
    """Searched CASE; the simple form is desugared to EQ conditions at parse
    time, mirroring reference ExpressionParser.scala:246-282."""

    branches: tuple[tuple["Cond", Expr], ...]
    else_expr: Optional[Expr] = None


@dataclass(frozen=True)
class Cast(Expr):
    operand: Expr
    type_name: str  # one of the reference's 10-type universe + DECIMAL


# ---------------------------------------------------------------- conditions
class Cond(Expr):
    """Boolean-valued expression (reference keeps Condition separate from
    Expression; here a Cond is just an Expr producing a boolean array)."""


@dataclass(frozen=True)
class Comparison(Cond):
    op: str  # = != <> > >= < <=
    left: Expr
    right: Expr


@dataclass(frozen=True)
class IsDistinctFrom(Cond):
    """a IS [NOT] DISTINCT FROM b — null-safe (in)equality: NULLs compare
    equal to each other, never yield NULL. distinct=True is the inequality
    form (IS DISTINCT FROM)."""

    left: Expr
    right: Expr
    distinct: bool = True


@dataclass(frozen=True)
class Like(Cond):
    operand: Expr
    pattern: Expr
    negated: bool = False
    case_insensitive: bool = False  # ILIKE
    escape: Optional[str] = None    # LIKE … ESCAPE 'c'


@dataclass(frozen=True)
class Matches(Cond):
    operand: Expr
    pattern: Expr  # raw regex (reference: Condition.scala MATCHES)
    anchored: bool = False  # SIMILAR TO: regex must span the whole string


@dataclass(frozen=True)
class IsNull(Cond):
    operand: Expr
    negated: bool = False


@dataclass(frozen=True)
class InList(Cond):
    operand: Expr
    values: tuple[Expr, ...]
    negated: bool = False


@dataclass(frozen=True)
class QuantifiedComparison(Cond):
    """expr op ANY/ALL (SELECT …) — uncorrelated only; the session reduces
    the subquery to min/max/count aggregates and rewrites to a plain
    comparison (= ANY → IN, <> ALL → NOT IN reuse the semi-join path).
    WHERE semantics: UNKNOWN collapses to FALSE."""

    op: str
    left: Expr
    query: Any
    quant: str  # "ANY" | "ALL"


@dataclass(frozen=True)
class InSubquery(Cond):
    """expr IN (SELECT …) — compiled as a broadcast semi-join: the subquery's
    first column is collected once (``ray.put``) and membership is a
    vectorized ``is_in`` mask per batch (ray_guide semi/anti-join pattern).
    The subquery result must be broadcast-sized (dimension keys)."""

    operand: Expr
    query: object  # A.Select | A.Union (untyped to avoid fwd ref)
    negated: bool = False


@dataclass(frozen=True)
class Exists(Cond):
    """[NOT] EXISTS (SELECT …) — compiled as a semi/anti join when the
    subquery is equality-correlated with the outer stream (classic
    decorrelation), or a one-off ``limit(1)`` probe when uncorrelated.
    Only valid as a top-level AND conjunct of WHERE/HAVING."""

    query: object  # A.Select | A.Union
    negated: bool = False


@dataclass(frozen=True)
class Between(Cond):
    operand: Expr
    low: Expr
    high: Expr
    negated: bool = False


@dataclass(frozen=True)
class And(Cond):
    left: Cond
    right: Cond


@dataclass(frozen=True)
class Or(Cond):
    left: Cond
    right: Cond


@dataclass(frozen=True)
class Not(Cond):
    operand: Cond


# ---------------------------------------------------------------- relational
@dataclass(frozen=True)
class SelectItem:
    expr: Expr
    alias: Optional[str] = None


@dataclass(frozen=True)
class Star:
    """SELECT * (optionally alias-qualified), with DuckDB-style modifiers:
    ``* EXCLUDE (a, b)`` drops columns, ``* REPLACE (expr AS c)``
    substitutes an expression for a column in place."""

    table_alias: Optional[str] = None
    exclude: tuple = ()  # column names to drop
    replace: tuple = ()  # (expr, column_name) substitutions


class Source:
    """FROM-clause source."""


@dataclass(frozen=True)
class TableRef(Source):
    name: str  # table name or quoted path ('file.csv')
    alias: Optional[str] = None
    hints: dict = field(default_factory=dict)  # WITH ... hints (format etc.)


@dataclass(frozen=True)
class SubquerySource(Source):
    query: "Select"
    alias: Optional[str] = None


@dataclass(frozen=True)
class SampledSource(Source):
    """`src USING SAMPLE …` / `src TABLESAMPLE …` wrapper.

    Engine semantics are DETERMINISTIC (documented divergence from
    DuckDB's RNG sampling): percent methods keep a row iff the seeded
    xxhash of its full content falls under the rate; ROWS methods keep
    the N smallest content hashes (an exact-N, layout/retry/partition
    independent uniform-ish sample — rerunning a 100 TB job reproduces
    the identical sample)."""

    inner: Source
    method: str = "BERNOULLI"      # BERNOULLI | SYSTEM | RESERVOIR
    value: float = 10.0            # percent (0-100) or row count
    is_percent: bool = True
    seed: int = 42


@dataclass(frozen=True)
class TableFunc(Source):
    """Table-valued function source — GENERATE_SERIES(a, b[, step])
    (inclusive stop, DuckDB) / RANGE(a, b[, step]) (exclusive stop).
    Compiles to a lazy distributed ray.data.range, never a literal list."""

    name: str                      # GENERATE_SERIES | RANGE (upper)
    args: tuple = ()               # scalar Exprs
    alias: Optional[str] = None
    col_alias: Optional[str] = None  # t(x) column rename


@dataclass(frozen=True)
class ExecutableSource(Source):
    """An introspection statement used as a FROM source —
    ``SELECT * FROM (SHOW VIEWS) WHERE ...`` (reference
    core/ops/Executable.scala:10-14: every executable yields a table,
    README.md:766-779)."""

    stmt: "Statement"
    alias: Optional[str] = None


@dataclass(frozen=True)
class JoinClause:
    join_type: str  # INNER LEFT RIGHT FULL (reference has INNER only, Join.scala:10)
    right: Source
    on: Cond
    using: tuple = ()     # JOIN … USING (a, b): equi-keys by shared name
    natural: bool = False  # NATURAL JOIN: USING = all shared column names


@dataclass(frozen=True)
class OrderItem:
    expr: Expr
    ascending: bool = True
    nulls_first: Optional[bool] = None  # None → engine default (NULLS LAST)


class Statement:
    """Base class for executable statements."""


@dataclass(frozen=True)
class Select(Statement, Source):
    items: tuple = ()  # SelectItem | Star
    source: Optional[Source] = None  # None → literal row (Select.scala:40-41)
    joins: tuple[JoinClause, ...] = ()
    where: Optional[Cond] = None
    group_by: tuple[Expr, ...] = ()
    having: Optional[Cond] = None
    order_by: tuple[OrderItem, ...] = ()
    limit: Optional[int] = None
    distinct: bool = False
    qualify: Optional[Cond] = None  # window-aware post-filter (DuckDB-style)
    # ROLLUP/CUBE/GROUPING SETS: tuple of grouping sets, each a tuple of
    # indexes into group_by (the distinct key list). None → plain GROUP BY.
    grouping_sets: Optional[tuple] = None
    offset: Optional[int] = None  # LIMIT n OFFSET m / standalone OFFSET


@dataclass(frozen=True)
class Union(Statement, Source):
    left: Statement
    right: Statement
    distinct: bool = False  # reference UNION == UNION ALL (Union.scala:11-16)
    by_name: bool = False  # UNION [ALL] BY NAME: align columns by name,
    # missing columns null-padded (DuckDB extension)


@dataclass(frozen=True)
class SetOp(Statement, Source):
    """EXCEPT / INTERSECT (ANSI set semantics: DISTINCT output) — superset of
    the reference (§2.5: no set ops besides UNION). Compiled to Ray's
    left_anti / left_semi hash joins on all columns."""

    op: str  # EXCEPT | INTERSECT
    left: Statement
    right: Statement
    all: bool = False  # EXCEPT ALL / INTERSECT ALL: bag (multiset) semantics


@dataclass(frozen=True)
class Insert(Statement):
    target: str
    columns: tuple[str, ...]
    source: Statement  # Select | Union | Values
    overwrite: bool = False  # INSERT OVERWRITE truncates (Hints.scala:44-48)
    hints: dict = field(default_factory=dict)


@dataclass(frozen=True)
class Values(Statement):
    rows: tuple[tuple[Expr, ...], ...]
    columns: tuple = ()  # optional names from `(VALUES …) v(a, b)` sources


@dataclass(frozen=True)
class Upsert(Statement):
    """UPSERT INTO tgt (cols) KEYED ON k — the CDC merge primitive
    (reference: core/ops/sql/Upsert.scala:14-32)."""

    target: str
    columns: tuple[str, ...]
    source: Statement
    keyed_on: tuple[str, ...]
    hints: dict = field(default_factory=dict)


@dataclass(frozen=True)
class MergeWhen:
    """One WHEN arm of a MERGE statement.

    ``matched`` ∈ {'matched', 'not_matched', 'not_matched_by_source'};
    ``action`` ∈ {'update', 'delete', 'insert'}. ``insert_values`` None
    means ``INSERT *`` (source columns mapped to the target by name)."""

    matched: str
    condition: object  # Optional[Cond]
    action: str
    assignments: tuple = ()           # for update: ((name, expr), ...)
    insert_columns: tuple = ()        # for insert with explicit columns
    insert_values: object = None      # tuple[Expr] | None for INSERT *


@dataclass(frozen=True)
class Merge(Statement):
    """MERGE INTO tgt [AS t] USING src [AS s] ON cond WHEN ... — ANSI
    SQL:2003 (superset over the reference's UPSERT/Update row-at-a-time
    semantics, ops/sql/Upsert.scala:14-32). Dimension-table-scale keyed
    merge against a parquet-file target; lake-scale merges flow through
    the CDC engine (UPSERT ... WITH LAKE)."""

    target: str
    target_alias: object  # Optional[str]
    source: Statement
    source_alias: object  # Optional[str]
    on: object            # Cond
    whens: tuple          # tuple[MergeWhen, ...]


@dataclass(frozen=True)
class Update(Statement):
    """UPDATE tgt SET a=expr … FROM src KEYED ON k (reference:
    ops/sql/Update.scala), or the ANSI in-place form
    UPDATE tgt SET a=expr [WHERE cond] (source None, where set)."""

    target: str
    assignments: tuple[tuple[str, Expr], ...]
    source: Optional[Statement] = None
    keyed_on: tuple[str, ...] = ()
    where: Optional[Cond] = None


@dataclass(frozen=True)
class Delete(Statement):
    """DELETE FROM tgt [WHERE cond] — superset (the reference mutates only
    via UPDATE/UPSERT KEYED ON); rows where cond is TRUE are removed (NULL
    keeps the row, SQL semantics), file rewritten atomically."""

    target: str
    where: Optional["Cond"] = None


@dataclass(frozen=True)
class Declare(Statement):
    name: str
    type_name: str


@dataclass(frozen=True)
class SetVar(Statement):
    name: str
    value: Expr | Statement  # scalar expr or scalar subquery (Assignment.scala)


@dataclass(frozen=True)
class CreateView(Statement):
    name: str
    query: Statement


@dataclass(frozen=True)
class CreateFunction(Statement):
    name: str
    params: tuple[str, ...]
    body: tuple[Statement, ...]  # ends with RETURN expr


@dataclass(frozen=True)
class CreateProcedure(Statement):
    name: str
    params: tuple[str, ...]
    body: tuple[Statement, ...]


@dataclass(frozen=True)
class Call(Statement):
    name: str
    args: tuple[Expr, ...]


@dataclass(frozen=True)
class Return(Statement):
    value: Optional[Expr] = None


@dataclass(frozen=True)
class CodeBlock(Statement):
    statements: tuple[Statement, ...]


@dataclass(frozen=True)
class Explain(Statement):
    """EXPLAIN [ANALYZE] <query>: the compiled Ray Data operator chain,
    one row per plan line — ANALYZE also executes and appends Ray's
    per-operator stage statistics (wall time, blocks, rows)."""

    query: Statement
    analyze: bool = False


@dataclass(frozen=True)
class WithCtes(Statement):
    """WITH [RECURSIVE] name [(cols)] AS (query) [, ...] <body>.

    Non-recursive CTEs execute as scoped session views (the compiler's view
    inlining resolves each reference lazily, so a CTE used twice compiles
    twice — Datasets are lazy, nothing materializes eagerly). Later CTEs may
    reference earlier ones. RECURSIVE CTEs run semi-naive fixpoint
    iteration (sqlc/recursive.py): each iteration's recursive term is a
    full distributed query; only the per-iteration working table
    materializes on the driver (the same contract DuckDB/Postgres use)."""

    ctes: tuple  # ((name, Statement, cols_or_None), ...)
    body: Statement
    recursive: bool = False


@dataclass(frozen=True)
class MaterializedTable(Statement, Source):
    """Internal (never parsed): a view backed by a concrete Arrow table —
    how recursive-CTE working/final tables re-enter the compiler. eq=False
    keeps the dataclass hashable despite the unhashable pa.Table field."""

    table: object  # pyarrow.Table
    name: str = "materialized"

    def __eq__(self, other):  # identity: pa.Table defines no value eq
        return self is other

    def __hash__(self):
        return id(self)


@dataclass(frozen=True)
class Describe(Statement):
    source: Source
    limit: Optional[int] = None


@dataclass(frozen=True)
class Show(Statement):
    entity: str  # FILES FUNCTIONS PROCEDURES VARIABLES VIEWS TABLES


@dataclass(frozen=True)
class Drop(Statement):
    """DROP VIEW|FUNCTION|PROCEDURE [IF EXISTS] name — session-registry
    removal (superset; the reference has no DROP at all)."""

    kind: str  # VIEW | FUNCTION | PROCEDURE
    name: str
    if_exists: bool = False


@dataclass(frozen=True)
class Pivot(Statement):
    """PIVOT tbl ON col [IN (v1,…)] USING AGG(expr) [GROUP BY a, b]
    (DuckDB simplified syntax). With an explicit IN list the parser rewrites
    straight to a Select with one CASE-filtered aggregate per value; this
    node survives only for the DYNAMIC form (values discovered at exec)."""

    table: "Source"
    on: str  # pivot column name
    agg: "FuncCall"
    group_by: tuple = ()  # column names


@dataclass(frozen=True)
class Unpivot(Statement):
    """UNPIVOT tbl ON c1[, c2 …] INTO NAME nc VALUE vc (DuckDB simplified
    syntax): wide → long; one output row per (row, ON-column) with non-NULL
    value. Kept columns = every column not in ON."""

    table: "Source"
    on: tuple  # column names to melt
    name_col: str = "name"
    value_col: str = "value"


@dataclass(frozen=True)
class Optimize(Statement):
    """OPTIMIZE '<lake_dir>' [PARTITION (p, ...)] — fold pending
    merge-on-read delta files into their partition bases (lake maintenance;
    Delta-style compaction surface, a superset of the reference)."""

    target: str
    partitions: tuple = ()


@dataclass(frozen=True)
class Vacuum(Statement):
    """VACUUM '<lake_dir>' [RETAIN n VERSIONS] — drop version snapshots
    beyond the retention horizon and unreferenced partition/delta files
    (lake maintenance; Delta-style VACUUM, a superset of the reference)."""

    target: str
    retain: Optional[int] = None


@dataclass(frozen=True)
class NativeSQL(Statement):
    """NATIVE SQL 'query' [FROM 'duckdb:file.db'] — raw passthrough to an
    embedded engine (reference ops/sql/NativeSQL.scala sends to JDBC; the
    rebuild's escape hatch is DuckDB over the same catalog)."""

    query: str
    connection: Optional[str] = None
