"""Property-based expression parity: random arithmetic/comparison/string
expressions evaluated by the engine's Arrow kernel evaluator must match
DuckDB on the same literal inputs (hypothesis-driven; no Ray needed)."""

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from qwery_ray.sqlc.exprs import Evaluator
from qwery_ray.sqlc.parser import Parser

_INTS = st.integers(min_value=-1000, max_value=1000)
_FLOATS = st.floats(min_value=-1000, max_value=1000, allow_nan=False,
                    width=32).map(lambda f: round(f, 3))
_STRINGS = st.text(alphabet="abcXYZ 09_", min_size=0, max_size=12)


def _lit(v):
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


@st.composite
def arith_exprs(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        return _lit(draw(st.one_of(_INTS, _FLOATS)))
    op = draw(st.sampled_from(["+", "-", "*"]))
    left = draw(arith_exprs(depth=depth + 1))
    right = draw(arith_exprs(depth=depth + 1))
    return f"({left} {op} {right})"


def eval_mine(sql_expr: str):
    # parse_cond handles comparisons AND plain expressions
    expr = Parser(sql_expr).parse_cond()
    out = Evaluator().eval(expr, pa.table({"__one": [1]}))
    if isinstance(out, (pa.Array, pa.ChunkedArray)):
        return out.to_pylist()[0]
    return out


def eval_duck(sql_expr: str):
    import decimal

    v = duckdb.sql(f"SELECT {sql_expr} AS v").fetchone()[0]
    if isinstance(v, decimal.Decimal):  # DuckDB types float literals DECIMAL
        return float(v)
    return v


class TestArithmeticParity:
    @settings(max_examples=120, deadline=None)
    @given(arith_exprs())
    def test_arith(self, expr):
        from hypothesis import assume

        try:
            duck = eval_duck(expr)
        except duckdb.OutOfRangeException:
            assume(False)  # DuckDB INT32 literal overflow — out of scope
            return
        mine = eval_mine(expr)
        assert mine == pytest.approx(duck, rel=1e-9, abs=1e-9)

    @settings(max_examples=80, deadline=None)
    @given(_INTS, _INTS)
    def test_comparisons(self, a, b):
        for op in ("=", "!=", "<", "<=", ">", ">="):
            mine = eval_mine(f"{a} {op} {b}")
            duck = eval_duck(f"{a} {op} {b}")
            assert bool(mine) == bool(duck), f"{a} {op} {b}"

    @settings(max_examples=60, deadline=None)
    @given(_STRINGS, _STRINGS)
    def test_string_concat_and_compare(self, a, b):
        assert eval_mine(f"{_lit(a)} || {_lit(b)}") == eval_duck(
            f"{_lit(a)} || {_lit(b)}")
        assert bool(eval_mine(f"{_lit(a)} < {_lit(b)}")) == bool(
            eval_duck(f"{_lit(a)} < {_lit(b)}"))

    @settings(max_examples=60, deadline=None)
    @given(_STRINGS)
    def test_string_funcs(self, s):
        for fn in ("UPPER", "LOWER", "TRIM"):
            assert eval_mine(f"{fn}({_lit(s)})") == eval_duck(f"{fn}({_lit(s)})")
        assert eval_mine(f"LENGTH({_lit(s)})") == eval_duck(f"LENGTH({_lit(s)})")

    @settings(max_examples=60, deadline=None)
    @given(_INTS, st.integers(min_value=-5, max_value=5))
    def test_case_when(self, x, t):
        expr = (f"CASE WHEN {x} > {t} THEN 'gt' WHEN {x} = {t} THEN 'eq' "
                f"ELSE 'lt' END")
        assert eval_mine(expr) == eval_duck(expr)


class TestNewFunctionParity:
    @settings(max_examples=80, deadline=None)
    @given(_INTS, _INTS)
    def test_greatest_least_mod(self, a, b):
        for fn in (f"GREATEST({a}, {b})", f"LEAST({a}, {b})"):
            assert eval_mine(fn) == eval_duck(fn)
        if b != 0:
            expr = f"MOD({a}, {b})"
            assert eval_mine(expr) == eval_duck(expr)

    @settings(max_examples=60, deadline=None)
    @given(st.integers(min_value=1, max_value=40),
           st.integers(min_value=0, max_value=6))
    def test_power_logs(self, x, p):
        expr = f"POWER({x}, {p})"
        assert abs(eval_mine(expr) - eval_duck(expr)) < 1e-9
        for fn in (f"LN({x})", f"LOG({x})", f"LOG2({x})"):
            assert abs(eval_mine(fn) - eval_duck(fn)) < 1e-12

    @settings(max_examples=60, deadline=None)
    @given(_STRINGS)
    def test_reverse_repeat(self, s):
        for fn in (f"REVERSE({_lit(s)})", f"REPEAT({_lit(s)}, 3)"):
            assert eval_mine(fn) == eval_duck(fn)

    @settings(max_examples=60, deadline=None)
    @given(st.integers(min_value=0, max_value=3000),
           st.integers(min_value=0, max_value=3000))
    def test_datediff_days(self, d1, d2):
        expr = (f"DATEDIFF('day', DATE '1995-01-01' + INTERVAL {d1} DAY, "
                f"DATE '1995-01-01' + INTERVAL {d2} DAY)")
        assert eval_mine(expr) == eval_duck(expr)
