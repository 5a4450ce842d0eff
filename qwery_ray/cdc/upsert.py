"""Keyed-table UPSERT / UPDATE for the SQL surface.

Reference semantics: UPSERT INTO ... KEYED ON = insert-else-update per key
(ops/sql/Upsert.scala:14-32 + JDBCOutputSource.scala:62-104); UPDATE ... KEYED
ON = keyed in-place update (ops/sql/Update.scala:19-45). The reference's target
is a JDBC table; here it is a single parquet file (for the partitioned,
streaming, exactly-once lake path see ``qwery_ray.cdc.engine``).

The source Dataset streams; the TARGET table is materialized driver-side —
this operator is for dimension-table-sized keyed targets. Within the incoming
batch, the LAST occurrence per key wins, matching the reference's sequential
row-at-a-time application.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd


def _collect(ds: rd.Dataset) -> pd.DataFrame:
    # Arrow-backed dtypes: plain to_pandas() turns an int64 column with any
    # NULL into float64, and the rewrite would silently flip the FILE's
    # column type to double (breaking later appends against the original
    # schema). ArrowDtype round-trips losslessly.
    frames = [b.to_pandas(types_mapper=pd.ArrowDtype)
              for b in ds.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")]
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def concat_union(frames: list[pd.DataFrame]) -> pd.DataFrame:
    """Column-union concat with explicit NA typing.

    Two pandas pitfalls handled at once: (a) EMPTY frames must still
    contribute their COLUMNS — plain \"drop empty then concat\" silently
    loses a side's schema (e.g. an UPSERT that replaces every surviving
    row must keep the file's evolved columns); (b) all-NA columns are
    pre-typed to the first frame's dtype (float64 when the dtype can't
    hold NA — the promotion concat applies today) so deprecated
    empty/all-NA dtype inference never fires (pandas FutureWarning,
    removed in pandas 3)."""
    order: list[str] = []
    for f in frames:
        for c in f.columns:
            if c not in order:
                order.append(c)
    # dtype authority per column, replicating what the old concat's
    # deprecated exclude-empty/all-NA inference produced:
    #   1. first NON-EMPTY frame with REAL values (not all-NA) —
    #      an object column of placeholder Nones (e.g. a MERGE insert
    #      frame's unmentioned target columns) must not win;
    #   2. else first frame (empty allowed) with a TYPED (non-object)
    #      dtype — a 0-row ArrowDtype target still knows its schema;
    #   3. else the first frame's dtype.
    dtypes: dict = {}
    for c in order:
        typed = None
        first = None
        for f in frames:
            if c not in f.columns:
                continue
            if first is None:
                first = f[c].dtype
            if typed is None and f[c].dtype != object:
                typed = f[c].dtype
            if not f.empty and not f[c].isna().all():
                dtypes[c] = f[c].dtype
                break
        if c not in dtypes:
            dtypes[c] = typed if typed is not None else first
    live = [f for f in frames if not f.empty]
    if not live:
        return frames[0].reindex(columns=order)

    def typed_na(n: int, dt):
        try:
            return pd.Series([pd.NA] * n, dtype=dt)
        except (TypeError, ValueError):
            return pd.Series([float("nan")] * n, dtype="float64")

    aligned = []
    for f in live:
        # dict-of-Series assembly: references the original columns (no
        # deep copy — these frames can be the ENTIRE existing file on the
        # UPSERT path, so duplicating payload here would double peak
        # driver memory); only all-NA/missing columns materialize anew
        cols = {}
        for c in order:
            if c not in f.columns or f[c].isna().all():
                cols[c] = typed_na(len(f), dtypes[c])
            else:
                cols[c] = f[c].reset_index(drop=True)
        aligned.append(pd.DataFrame(cols))
    if len(aligned) == 1:
        return aligned[0]
    return pd.concat(aligned, ignore_index=True)


#: above this estimated source size, UPSERT/UPDATE pre-reduce the source
#: per key DISTRIBUTED (last stream occurrence wins) before any driver
#: collect — driver memory then scales with DISTINCT source keys (i.e.
#: with the OUTPUT file, which is inherently driver-bounded for the
#: single-parquet target path), never with raw source row count.
SOURCE_PREREDUCE_BYTES = 128 << 20


def block_offsets(mat: rd.Dataset) -> list:
    """(block_ref, cumulative_row_offset) pairs for a MATERIALIZED
    dataset — the shared primitive for making implicit stream position
    explicit (UPSERT last-wins __pos tags, lake-MERGE fresh LSNs).
    Unknown num_rows metadata is counted by a remote per-block len()
    task; rows never move to the driver."""
    import numpy as np
    import ray

    blocks = list(mat._plan.execute().blocks)
    counts = [meta.num_rows for _, meta in blocks]
    missing = [i for i, c in enumerate(counts) if c is None]
    if missing:
        @ray.remote
        def _len(b) -> int:
            return len(b)

        for i, n in zip(missing,
                        ray.get([_len.remote(blocks[i][0])
                                 for i in missing])):
            counts[i] = n
    offsets = np.cumsum([0] + counts[:-1])
    return [(ref, int(off)) for (ref, _), off in zip(blocks, offsets)]


def _last_in_table(t: pa.Table, keys: list[str]) -> pa.Table:
    """Keep each key's max-__pos row of one Arrow table. Key/pos columns
    go through pandas (narrow); CONTENT moves by take() — zero type
    mangling on payload columns."""
    import numpy as np

    kdf = t.select(keys + ["__pos"]).to_pandas(types_mapper=pd.ArrowDtype)
    idx = kdf.groupby(keys, dropna=False, sort=False)["__pos"].idxmax() \
        .to_numpy()
    return t.take(pa.array(np.sort(idx)))


def _last_per_key_distributed(mat: rd.Dataset, keys: list[str]) -> pd.DataFrame:
    """Distributed last-occurrence-per-key reduction of a LARGE source.

    The implicit stream position ("last wins" = last in SELECT order,
    matching the reference's sequential row-at-a-time application,
    ops/sql/Upsert.scala:14-32) is made explicit as a __pos column from
    per-block offsets of the materialized metadata; each batch
    pre-combines (PartialLww shape — shuffle volume is bounded by
    distinct-keys-per-batch), then ONE groupby shuffle keeps the global
    max-__pos row per key. Only the reduced stream reaches the driver."""
    import ray

    @ray.remote
    def _tag(block, off: int) -> pa.Table:
        import numpy as np

        if not isinstance(block, pa.Table):  # pandas-format block
            block = pa.Table.from_pandas(block, preserve_index=False)
        return block.append_column(
            "__pos", pa.array(np.arange(off, off + len(block),
                                        dtype=np.int64)))

    tagged = rd.from_arrow_refs(
        [_tag.remote(ref, off) for ref, off in block_offsets(mat)])

    # NULL key values: Ray's sort-shuffle groupby hands a None to its
    # boundary sampler and dies in searchsorted — group on null-safe
    # (is-null flag, null-filled copy) encodings instead, exactly like
    # the compiler's aggregate path; original key columns pass through
    from ..sqlc.compiler import NullSafeSortKeys

    enc_keys = [c for i in range(len(keys))
                for c in (f"__nf{i}", f"__nk{i}")]

    def combine(batch: pa.Table) -> pa.Table:
        return _last_in_table(batch, keys) if len(batch) else batch

    def group_last(g: pa.Table) -> pa.Table:
        return _last_in_table(g, keys) if len(g) else g

    reduced = tagged.map_batches(combine, batch_format="pyarrow") \
        .map_batches(NullSafeSortKeys(keys), batch_format="pyarrow") \
        .groupby(enc_keys).map_groups(group_last, batch_format="pyarrow") \
        .map_batches(lambda t: t.drop_columns(
            [c for c in enc_keys if c in t.column_names]),
            batch_format="pyarrow")
    out = _collect(reduced)
    if out.empty:
        return out.drop(columns=["__pos"], errors="ignore")
    # restore stream order so the rewritten file's row order matches the
    # sequential-application order the small path produces
    return out.sort_values("__pos", ignore_index=True) \
        .drop(columns=["__pos"])


def _collect_last_per_key(ds: rd.Dataset, keys: list[str]) -> pd.DataFrame:
    """Collect a source with last-occurrence-per-key semantics: small
    sources collect directly (the caller dedups); large sources reduce
    distributed first so the driver never holds raw source rows."""
    mat = ds.materialize()
    size = mat.size_bytes() or 0
    if size > SOURCE_PREREDUCE_BYTES:
        return _last_per_key_distributed(mat, keys)
    new = _collect(mat)
    if new.empty:
        return new
    return new.drop_duplicates(subset=keys, keep="last", ignore_index=True)


def upsert_into_parquet(ds: rd.Dataset, path: str, keys: list[str]) -> tuple[int, int]:
    """Returns (rows_inserted, rows_updated)."""
    # last occurrence per key wins within the incoming stream; a large
    # source LWW-reduces per key DISTRIBUTED before the driver sees it
    deduped = _collect_last_per_key(ds, keys)
    if deduped.empty:
        return 0, 0

    if os.path.exists(path):
        existing = pq.read_table(path).to_pandas(types_mapper=pd.ArrowDtype)
    else:
        existing = pd.DataFrame(columns=deduped.columns)

    existing_keys = set(map(tuple, existing[keys].itertuples(index=False))) \
        if not existing.empty else set()
    incoming_keys = list(map(tuple, deduped[keys].itertuples(index=False)))
    updated = sum(1 for k in incoming_keys if k in existing_keys)
    inserted = len(incoming_keys) - updated

    if not existing.empty:
        mask = existing[keys].apply(tuple, axis=1).isin(set(incoming_keys))
        survivors = existing[~mask]
    else:
        survivors = existing
    merged = concat_union([survivors, deduped])

    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(merged, preserve_index=False), tmp)
    os.replace(tmp, path)  # atomic visibility point
    return inserted, updated


def update_parquet(ds: rd.Dataset, path: str, keys: list[str],
                   assignments: list[tuple[str, object]], env: dict) -> int:
    """Applies ``SET col = expr`` (evaluated against each SOURCE row) to target
    rows with a matching key. Returns rows_updated."""
    from ..sqlc.compiler import make_evaluator

    # per-key last-wins reduction commutes with the row-wise SET
    # evaluation below, so a large source reduces DISTRIBUTED first and
    # the driver only ever evaluates one row per distinct key
    src = _collect_last_per_key(ds, keys)
    if src.empty or not os.path.exists(path):
        return 0
    ev = make_evaluator(env)
    batch = pa.Table.from_pandas(src, preserve_index=False)
    for name, expr in assignments:
        val = ev.eval(expr, batch)
        if not isinstance(val, (pa.Array, pa.ChunkedArray)):
            val = pa.array([val] * len(batch))
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        src[name] = pd.Series(val, dtype=pd.ArrowDtype(val.type))

    target = pq.read_table(path).to_pandas(types_mapper=pd.ArrowDtype)
    assigned_cols = [n for n, _ in assignments]
    idx = src.set_index(keys)
    tkeys = target[keys].apply(tuple, axis=1) if len(keys) > 1 else target[keys[0]]
    skeys = set(idx.index)
    mask = tkeys.isin(skeys)
    updated = int(mask.sum())
    if updated:
        lookup = idx[assigned_cols]
        for col in assigned_cols:
            target.loc[mask, col] = tkeys[mask].map(lookup[col]).values
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(target, preserve_index=False), tmp)
    os.replace(tmp, path)
    return updated


def update_where_parquet(path: str, assignments, where, env: dict) -> int:
    """ANSI in-place UPDATE <file> SET a=e [WHERE cond]: evaluate the SET
    expressions over the matching rows (NULL predicate skips the row, SQL
    semantics), rewrite atomically. Returns rows_updated. File targets
    only — big-data updates flow through the CDC lake as LWW events."""
    from ..sqlc.compiler import make_evaluator

    if not os.path.exists(path):
        return 0
    if os.path.isdir(path):
        raise ValueError(
            "UPDATE targets a single parquet file; lake/directory updates "
            "go through UPSERT INTO ... WITH LAKE")
    tbl = pq.read_table(path)
    ev = make_evaluator(env)
    if where is None:
        mask = pa.array([True] * len(tbl), pa.bool_())
    else:
        mask = ev.eval_mask(where, tbl)
    n_upd = pc.sum(mask).as_py() or 0
    if n_upd:
        import numpy as np

        # ANSI row semantics: every SET source expression is evaluated
        # against the PRE-update row (UPDATE t SET a=b, b=a swaps), and only
        # over the WHERE-selected rows (an expression that errors on an
        # excluded row must not fail the statement). So: filter first,
        # evaluate ALL expressions against that snapshot, then scatter.
        sel = tbl.filter(mask)
        evaluated: list[tuple[str, pa.Array]] = []
        for name, expr in assignments:
            if name not in tbl.column_names:
                raise ValueError(f"UPDATE: unknown column {name!r}")
            val = ev.eval(expr, sel)
            if not isinstance(val, (pa.Array, pa.ChunkedArray)):
                val = pa.array([val] * len(sel))
            if isinstance(val, pa.ChunkedArray):
                val = val.combine_chunks()
            evaluated.append((name, val))

        mask_np = mask.to_numpy(zero_copy_only=False)
        # position of each selected row within `sel` (garbage where ~mask,
        # masked out by if_else below)
        gather = pa.array(np.where(mask_np, np.cumsum(mask_np) - 1, 0),
                          pa.int64())
        for name, val in evaluated:
            idx = tbl.column_names.index(name)
            old = tbl.column(idx)
            if isinstance(old, pa.ChunkedArray):
                old = old.combine_chunks()
            if val.type != old.type:
                val = val.cast(old.type)
            expanded = val.take(gather)
            new = pc.if_else(mask, expanded, old)
            tbl = tbl.set_column(idx, name, new)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return int(n_upd)


def delete_parquet(path: str, where, env: dict) -> int:
    """DELETE FROM <file> [WHERE cond]: drop rows where cond is TRUE (NULL
    keeps the row — SQL semantics, eval_mask fills nulls False), rewrite
    atomically. Returns rows_deleted. File targets only; big-data deletes
    flow through the CDC lake as __deleted events."""
    from ..sqlc.compiler import make_evaluator

    if not os.path.exists(path):
        return 0
    if os.path.isdir(path):
        raise ValueError(
            "DELETE targets a single parquet file; lake/directory deletes "
            "go through UPSERT INTO ... WITH LAKE (__deleted events)")
    tbl = pq.read_table(path)
    if where is None:
        keep = tbl.slice(0, 0)
    else:
        mask = make_evaluator(env).eval_mask(where, tbl)
        keep = tbl.filter(pc.invert(mask))
    deleted = len(tbl) - len(keep)
    if deleted:
        tmp = path + ".tmp"
        pq.write_table(keep, tmp)
        os.replace(tmp, path)
    return deleted
