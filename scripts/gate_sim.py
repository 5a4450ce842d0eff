"""Strict-bit gate simulation: runs EVERY queries() entry side-by-side
with its oracle_sql() at sf0.01 (the driver's gate scale) and compares
rows, schema and float columns BIT-FOR-BIT (the driver hashes exact
values; rtol comparisons hide last-ulp drift).

Usage:  python scripts/gate_sim.py  [sf_dir]  [--only name1,name2,...]
"""
import sys, os
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
import __ray_entry__ as em
import duckdb, numpy as np, pandas as pd

argv = list(sys.argv[1:])
only = None
if "--only" in argv:
    i = argv.index("--only")
    only = set(argv[i + 1].split(","))
    del argv[i:i + 2]
sf = argv[0] if argv else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

qs, osql = em.queries(), em.oracle_sql()
fails = []
for name in sorted(qs):
    if only and name not in only:
        continue
    try:
        res = qs[name](sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else (
            res.to_pandas() if hasattr(res, "to_pandas") else res)
        if not isinstance(df, pd.DataFrame):
            df = df.to_pandas()
        if name not in osql:
            print(f"{name:28s} rows={len(df)} (rows-only)")
            continue
        odf = con.execute(osql[name]).df()
        status = []
        if len(df) != len(odf):
            status.append(f"ROWS {len(df)} vs {len(odf)}")
        if sorted(df.columns) != sorted(odf.columns):
            status.append(f"SCHEMA {sorted(df.columns)} vs {sorted(odf.columns)}")
        if not status:
            a = df.reindex(sorted(df.columns), axis=1)
            e = odf.reindex(sorted(odf.columns), axis=1)
            sort_cols = list(a.columns)
            a = a.sort_values(sort_cols, ignore_index=True)
            e = e.sort_values(sort_cols, ignore_index=True)
            for c in a.columns:
                av, ev = a[c].to_numpy(), e[c].to_numpy()
                if av.dtype.kind == 'f' or ev.dtype.kind == 'f':
                    av = av.astype(np.float64); ev = ev.astype(np.float64)
                    if not np.array_equal(av, ev, equal_nan=True):
                        status.append(f"HASH col {c}")
                else:
                    if not (pd.Series(av).astype(str)
                            == pd.Series(ev).astype(str)).all():
                        status.append(f"HASH col {c}")
        if status:
            fails.append((name, status))
            print(f"{name:28s} FAIL {status}")
        else:
            print(f"{name:28s} OK rows={len(df)}")
    except Exception as ex:
        fails.append((name, [f"ERR {type(ex).__name__}: {str(ex)[:120]}"]))
        print(f"{name:28s} ERR {type(ex).__name__}: {str(ex)[:160]}")
print("\nFAILS:", len(fails))
ray.shutdown()
