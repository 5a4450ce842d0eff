"""CLI / REPL — parity with the reference's QweryCLI (cli/QweryCLI.scala).

    python -m qwery_ray "SELECT * FROM 'companylist.csv' LIMIT 5"
    python -m qwery_ray --root /root/testdata/sf0.001           # REPL
    python -m qwery_ray --root ... --file script.sql

Owns its Ray session (guarded init; the driver/test contract never imports
this module)."""

from __future__ import annotations

import argparse
import sys


def _print_result(result, limit: int = 50):
    import pyarrow as pa
    import ray.data as rd

    if result is None:
        print("Ok")
        return
    if isinstance(result, rd.Dataset):
        rows = result.take(limit + 1)
        table = pa.Table.from_pylist(rows[:limit]) if rows else pa.table({})
        truncated = len(rows) > limit
    else:
        table = result
        truncated = False
    df = table.to_pandas()
    print(df.to_string(index=False) if len(df) else "(empty)")
    if truncated:
        print(f"... (showing first {limit} rows)")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="qwery_ray")
    parser.add_argument("sql", nargs="?", help="SQL to execute (else REPL)")
    parser.add_argument("--root", default=".", help="table root directory")
    parser.add_argument("--file", help="execute a .sql script file")
    parser.add_argument("--num-cpus", type=int, default=None)
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from qwery_ray import QweryEngine

    eng = QweryEngine(table_root=args.root)
    try:
        if args.file:
            with open(args.file) as f:
                _print_result(eng.sql(f.read()))
            return 0
        if args.sql:
            _print_result(eng.sql(args.sql))
            return 0
        # REPL: statements end with ';' (multi-line, like the reference CLI)
        print("qwery_ray — Ray-Data SQL engine. End statements with ';', "
              "'exit' to quit.")
        buf: list[str] = []
        while True:
            try:
                line = input("... " if buf else "sql> ")
            except EOFError:
                break
            if not buf and line.strip().lower() in ("exit", "quit"):
                break
            buf.append(line)
            if line.rstrip().endswith(";"):
                text = "\n".join(buf)
                buf = []
                try:
                    _print_result(eng.sql(text))
                except Exception as exc:
                    print(f"error: {exc}")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
