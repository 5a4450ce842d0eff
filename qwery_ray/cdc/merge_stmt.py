"""MERGE INTO execution (ANSI SQL:2003 three-arm merge).

Superset over the reference's UPSERT/UPDATE row-at-a-time semantics
(ops/sql/Upsert.scala:14-32, Update.scala:19-45): one statement expresses
insert-else-update-else-delete with per-arm conditions, the canonical CDC
apply step.

Scale contract (same as cdc/upsert.py): the SOURCE is a full distributed
query; the TARGET is a single parquet file materialized driver-side —
dimension-table scale. Lake-scale merges flow through the exactly-once
CDC engine (``UPSERT INTO ... WITH LAKE`` / ``CDCLakeEngine.replay``),
which implements the same matched/not-matched semantics via LWW events.

ANSI semantics implemented:
- ON must contain at least one target-column = source-column equality;
  remaining conjuncts become a residual filter on the joined pairs.
- A target row matched by MORE than one source row raises a cardinality
  violation (SQL:2003 14.9 GR 6b — nondeterministic update otherwise).
- WHEN arms evaluate in statement order; the FIRST arm whose condition
  holds acts on the row; later arms never see it.
- NOT MATCHED [BY TARGET] sees source rows with no surviving pair;
  NOT MATCHED BY SOURCE (T-SQL/Databricks extension) sees target rows
  with no surviving pair.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..sqlc import ast as A
from .upsert import _collect


def _conjuncts(cond) -> list:
    if isinstance(cond, A.And):
        return _conjuncts(cond.left) + _conjuncts(cond.right)
    return [cond]


def _classify(ref: A.ColumnRef, ta: str, sa: str, tcols, scols):
    """'t'/'s'/None for which side a column reference names."""
    name = ref.name.lower()
    alias = (ref.table_alias or "").lower()
    if alias:
        if alias == ta.lower():
            return "t" if name in tcols else None
        if alias == sa.lower():
            return "s" if name in scols else None
        return None
    in_t, in_s = name in tcols, name in scols
    if in_t and in_s:
        raise ValueError(
            f"MERGE: ambiguous column {ref.name!r} in ON — qualify it "
            f"with {ta!r} or {sa!r}")
    return "t" if in_t else ("s" if in_s else None)


def merge_into_parquet(session, stmt: A.Merge) -> pa.Table:
    from ..sqlc.compiler import make_evaluator

    src_ds = session.compiler.compile_query(stmt.source)
    src = _collect(src_ds)
    if src.shape[1] == 0:
        # empty source: _collect saw no batches, so recover the column
        # names from the dataset schema (an all-arms merge against an
        # empty source is still well-defined — NOT MATCHED BY SOURCE fires)
        schema = src_ds.schema(fetch_if_missing=True)
        names = list(schema.names) if schema is not None else []
        src = pd.DataFrame({n: pd.Series([], dtype="object") for n in names})
    path = session.resolve_table_path(session.expand_vars(stmt.target))
    if not os.path.exists(path):
        raise ValueError(f"MERGE target {stmt.target!r} does not exist")
    target = pq.read_table(path).to_pandas()

    base = os.path.splitext(os.path.basename(stmt.target))[0]
    ta = stmt.target_alias or base
    sa = stmt.source_alias or "src"
    tcols = {c.lower() for c in target.columns}
    scols = {c.lower() for c in src.columns}
    tmap = {c.lower(): c for c in target.columns}
    smap = {c.lower(): c for c in src.columns}

    # ---- split ON into equi keys + residual ---------------------------
    keys: list[tuple[str, str]] = []   # (target_col, source_col)
    residual: list = []
    for c in _conjuncts(stmt.on):
        if (isinstance(c, A.Comparison) and c.op == "="
                and isinstance(c.left, A.ColumnRef)
                and isinstance(c.right, A.ColumnRef)):
            sides = (_classify(c.left, ta, sa, tcols, scols),
                     _classify(c.right, ta, sa, tcols, scols))
            if sides == ("t", "s"):
                keys.append((tmap[c.left.name.lower()],
                             smap[c.right.name.lower()]))
                continue
            if sides == ("s", "t"):
                keys.append((tmap[c.right.name.lower()],
                             smap[c.left.name.lower()]))
                continue
        residual.append(c)
    if not keys:
        raise ValueError(
            "MERGE ON requires at least one target-column = source-column "
            "equality (theta-only merges would be a full cross product)")

    ev = make_evaluator(_env(session))

    # ---- candidate pairs (inner merge on the equi keys) ----------------
    t = target.reset_index(drop=True).copy()
    s = src.reset_index(drop=True).copy()
    t["__tid"] = np.arange(len(t), dtype=np.int64)
    s["__sid"] = np.arange(len(s), dtype=np.int64)
    pairs = t.merge(s, left_on=[k[0] for k in keys],
                    right_on=[k[1] for k in keys],
                    how="inner", suffixes=("__t", "__s"))

    def _qualified(df_pairs: pd.DataFrame) -> pa.Table:
        """Pairs frame re-exposed with alias-qualified physical columns
        (plus bare names where unambiguous — resolve_column's suffix
        fallback handles those)."""
        data = {}
        for c in target.columns:
            phys = c if c in df_pairs.columns else f"{c}__t"
            data[f"{ta}.{c}"] = df_pairs[phys].to_numpy()
        for c in src.columns:
            phys = c if c in df_pairs.columns else f"{c}__s"
            data[f"{sa}.{c}"] = df_pairs[phys].to_numpy()
        return pa.Table.from_pandas(pd.DataFrame(data), preserve_index=False)

    if len(pairs) and residual:
        batch = _qualified(pairs)
        mask = np.ones(len(pairs), dtype=bool)
        for c in residual:
            mask &= np.asarray(ev.eval_mask(c, batch))
        pairs = pairs[mask].reset_index(drop=True)

    # ---- ANSI cardinality check ----------------------------------------
    if len(pairs) and pairs["__tid"].duplicated().any():
        dup = pairs["__tid"][pairs["__tid"].duplicated()].iloc[0]
        raise ValueError(
            "MERGE cardinality violation: target row matched by multiple "
            f"source rows (target row index {int(dup)}) — SQL:2003 14.9")

    matched_tids = set(pairs["__tid"].tolist())
    matched_sids = set(pairs["__sid"].tolist())

    n_upd = n_del = n_ins = 0
    deletes: set[int] = set()
    updates: dict[int, dict[str, object]] = {}

    # ---- WHEN MATCHED arms (first match wins) ---------------------------
    if len(pairs):
        pbatch = _qualified(pairs)
        claimed = np.zeros(len(pairs), dtype=bool)
        for arm in stmt.whens:
            if arm.matched != "matched":
                continue
            m = np.ones(len(pairs), dtype=bool) if arm.condition is None \
                else np.asarray(ev.eval_mask(arm.condition, pbatch))
            m = m & ~claimed
            claimed |= m
            rows = np.where(m)[0]
            if not len(rows):
                continue
            if arm.action == "delete":
                deletes.update(int(pairs["__tid"].iloc[i]) for i in rows)
                n_del += len(rows)
            else:  # update
                for name, expr in arm.assignments:
                    col = tmap.get(name.lower())
                    if col is None:
                        raise ValueError(
                            f"MERGE UPDATE SET: unknown target column {name!r}")
                    vals = ev.eval(expr, pbatch)
                    vals = vals.to_pandas().to_numpy() \
                        if isinstance(vals, (pa.Array, pa.ChunkedArray)) \
                        else np.full(len(pairs), vals, dtype=object)
                    for i in rows:
                        updates.setdefault(
                            int(pairs["__tid"].iloc[i]), {})[col] = vals[i]
                n_upd += len(rows)

    # ---- WHEN NOT MATCHED (source side) --------------------------------
    anti_s = s[~s["__sid"].isin(matched_sids)].reset_index(drop=True)
    inserts: list[pd.DataFrame] = []
    if len(anti_s):
        sb = pa.Table.from_pandas(
            pd.DataFrame({f"{sa}.{c}": anti_s[c].to_numpy()
                          for c in src.columns}), preserve_index=False)
        claimed = np.zeros(len(anti_s), dtype=bool)
        for arm in stmt.whens:
            if arm.matched != "not_matched":
                continue
            m = np.ones(len(anti_s), dtype=bool) if arm.condition is None \
                else np.asarray(ev.eval_mask(arm.condition, sb))
            m = m & ~claimed
            claimed |= m
            rows = np.where(m)[0]
            if not len(rows):
                continue
            if arm.insert_values is None:  # INSERT * — map by name
                new = pd.DataFrame(index=range(len(rows)))
                for c in target.columns:
                    sc = smap.get(c.lower())
                    new[c] = anti_s[sc].to_numpy()[rows] if sc is not None \
                        else None
            else:
                cols = list(arm.insert_columns) or list(target.columns)
                if len(cols) != len(arm.insert_values):
                    raise ValueError(
                        "MERGE INSERT: column/value count mismatch")
                new = pd.DataFrame(index=range(len(rows)))
                for c in target.columns:
                    new[c] = None
                for cname, expr in zip(cols, arm.insert_values):
                    col = tmap.get(cname.lower())
                    if col is None:
                        raise ValueError(
                            f"MERGE INSERT: unknown target column {cname!r}")
                    vals = ev.eval(expr, sb)
                    vals = vals.to_pandas().to_numpy() \
                        if isinstance(vals, (pa.Array, pa.ChunkedArray)) \
                        else np.full(len(anti_s), vals, dtype=object)
                    new[col] = vals[rows]
            inserts.append(new)
            n_ins += len(rows)

    # ---- WHEN NOT MATCHED BY SOURCE (target side) -----------------------
    anti_t_mask = ~t["__tid"].isin(matched_tids)
    if anti_t_mask.any():
        anti_t = t[anti_t_mask].reset_index(drop=True)
        tb = pa.Table.from_pandas(
            pd.DataFrame({f"{ta}.{c}": anti_t[c].to_numpy()
                          for c in target.columns}), preserve_index=False)
        claimed = np.zeros(len(anti_t), dtype=bool)
        for arm in stmt.whens:
            if arm.matched != "not_matched_by_source":
                continue
            m = np.ones(len(anti_t), dtype=bool) if arm.condition is None \
                else np.asarray(ev.eval_mask(arm.condition, tb))
            m = m & ~claimed
            claimed |= m
            rows = np.where(m)[0]
            if not len(rows):
                continue
            if arm.action == "delete":
                deletes.update(int(anti_t["__tid"].iloc[i]) for i in rows)
                n_del += len(rows)
            else:
                for name, expr in arm.assignments:
                    col = tmap.get(name.lower())
                    if col is None:
                        raise ValueError(
                            f"MERGE UPDATE SET: unknown target column {name!r}")
                    vals = ev.eval(expr, tb)
                    vals = vals.to_pandas().to_numpy() \
                        if isinstance(vals, (pa.Array, pa.ChunkedArray)) \
                        else np.full(len(anti_t), vals, dtype=object)
                    for i in rows:
                        updates.setdefault(
                            int(anti_t["__tid"].iloc[i]), {})[col] = vals[i]
                n_upd += len(rows)

    # ---- materialize the final state, atomic replace --------------------
    out = target.reset_index(drop=True).copy()
    for tid, cols in updates.items():
        for col, val in cols.items():
            out.at[tid, col] = val
    if deletes:
        out = out[~out.index.isin(deletes)]
    if inserts:
        out = pd.concat([out] + inserts, ignore_index=True)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(out.reset_index(drop=True),
                                        preserve_index=False), tmp)
    os.replace(tmp, path)  # atomic visibility point
    return pa.table({"ROWS_INSERTED": [n_ins], "ROWS_UPDATED": [n_upd],
                     "ROWS_DELETED": [n_del], "ROWS_REJECTED": [0]})


def _env(session) -> dict:
    from ..engine.session import _env as session_env

    return session_env(session)
