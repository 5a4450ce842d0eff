"""Driver-facing query implementations for __ray_entry__.py.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
COLUMN NAMES match the paired oracle SQL exactly (the driver sorts columns by
name and value-hashes — see __ray_entry__.py docstring).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa

from ..engine.session import QweryEngine


def engine_for(sf_dir: str) -> QweryEngine:
    return QweryEngine(table_root=sf_dir)


def read_docs_parallel(sf_dir: str, columns=("doc_id", "text"),
                       blocks_per_cpu: int = 2):
    """documents.parquet pruned to ``columns`` and split to ~2 blocks per
    core: the table usually arrives as ONE block (single row group), which
    would serialize any per-doc map stage behind it — the split/coalesce
    repartition (no shuffle) is microseconds on a narrow doc table and buys
    full task parallelism for the analyzer stages."""
    import ray
    import ray.data as rd

    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=list(columns))
    return ds.repartition(ncpu * blocks_per_cpu)


# --------------------------------------------------------------- CDC replay
def cdc_replay(sf_dir: str, *, chunk_lsns: int = 5000, num_partitions: int = 16):
    """Derive a deterministic change-event stream from ``documents`` (same
    derivation as the SQL oracle), replay it through the full CDC lake engine
    (chunked txns, manifest, LWW, deletes), return the final lake state."""
    import ray.data as rd

    from ..cdc.engine import CDCLakeEngine
    from ..cdc.synth import events_from_documents_batch

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    work = f"/tmp/qwery_ray_driver/cdc_{tag}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    events = docs.map_batches(events_from_documents_batch,
                              batch_format="pyarrow")
    events.write_parquet(os.path.join(work, "events"))

    lake = CDCLakeEngine(os.path.join(work, "lake"),
                         num_partitions=num_partitions)
    lake.replay(os.path.join(work, "events"), chunk_lsns=chunk_lsns)
    return lake.dataset().select_columns(["repo", "path", "lsn", "content"])


def events_lake_lww(sf_dir: str):
    """SQL UPSERT INTO a lake target keyed on (user_id, event_type): the
    declarative statement compiles to the exactly-once CDC engine; returns
    the final lake state (oracle: per-key argmax event_id in SQL)."""
    from ..cdc.engine import CDCLakeEngine

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    lake = f"/tmp/qwery_ray_driver/events_lake_{tag}"
    shutil.rmtree(lake, ignore_errors=True)
    eng = engine_for(sf_dir)
    eng.sql(
        f"UPSERT INTO '{lake}' WITH LAKE "
        f"SELECT event_id AS lsn, user_id, event_type, value FROM events "
        f"KEYED ON user_id, event_type")
    lake_eng = CDCLakeEngine(lake, key_cols=["user_id", "event_type"])
    return lake_eng.dataset().select_columns(
        ["user_id", "event_type", "lsn", "value"])


def lake_merge_apply(sf_dir: str):
    """r5: ANSI MERGE INTO a CDC lake target — build the lake from the
    events stream (LWW keyed on user_id, event_type), then one 3-arm
    MERGE whose source mixes matched keys (grouped counts) with shifted
    never-matched keys; the arms commit as ONE exactly-once transaction
    of LWW events. FULL SQL ORACLE: LWW reconstruction + LEFT JOIN CASE
    for the arms (same idiom as merge_apply's oracle). Integer counts
    cast to DOUBLE keep values bit-exact on both engines."""
    from ..cdc.engine import CDCLakeEngine

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    lake = f"/tmp/qwery_ray_driver/merge_lake_{tag}"
    shutil.rmtree(lake, ignore_errors=True)
    eng = engine_for(sf_dir)
    eng.sql(
        f"UPSERT INTO '{lake}' WITH LAKE "
        f"SELECT event_id AS lsn, user_id, event_type, value FROM events "
        f"KEYED ON user_id, event_type")
    eng.sql(f"""
        MERGE INTO '{lake}' AS tg USING (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events WHERE event_id % 3 = 0
            GROUP BY user_id, event_type
            UNION ALL
            SELECT DISTINCT user_id + 1000000 AS user_id, event_type,
                   CAST(5 AS BIGINT) AS n
            FROM events WHERE user_id <= 5) AS sr
        ON tg.user_id = sr.user_id AND tg.event_type = sr.event_type
        WHEN MATCHED AND sr.n > 4 THEN DELETE
        WHEN MATCHED THEN UPDATE SET value = CAST(sr.n AS DOUBLE)
        WHEN NOT MATCHED THEN INSERT (user_id, event_type, value)
            VALUES (sr.user_id, sr.event_type, CAST(0 - sr.n AS DOUBLE))
    """)
    return CDCLakeEngine.open(lake).dataset().select_columns(
        ["user_id", "event_type", "value"])


def lake_merge_oracle_sql() -> str:
    return """
WITH lww AS (
  SELECT e.user_id, e.event_type, e.value
  FROM events e
  JOIN (SELECT user_id, event_type, MAX(event_id) AS m
        FROM events GROUP BY user_id, event_type) x
    ON e.user_id = x.user_id AND e.event_type = x.event_type
   AND e.event_id = x.m
),
src AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE event_id % 3 = 0 GROUP BY user_id, event_type
  UNION ALL
  SELECT DISTINCT user_id + 1000000 AS user_id, event_type,
         CAST(5 AS BIGINT) AS n
  FROM events WHERE user_id <= 5
),
merged AS (
  SELECT t.user_id, t.event_type,
         CASE WHEN s.user_id IS NULL THEN t.value
              ELSE CAST(s.n AS DOUBLE) END AS value,
         CASE WHEN s.user_id IS NOT NULL AND s.n > 4 THEN 1 ELSE 0 END AS del
  FROM lww t LEFT JOIN src s
    ON t.user_id = s.user_id AND t.event_type = s.event_type
),
ins AS (
  SELECT s.user_id, s.event_type, CAST(0 - s.n AS DOUBLE) AS value
  FROM src s LEFT JOIN lww t
    ON t.user_id = s.user_id AND t.event_type = s.event_type
  WHERE t.user_id IS NULL
)
SELECT user_id, event_type, value FROM merged WHERE del = 0
UNION ALL
SELECT user_id, event_type, value FROM ins
"""


# ------------------------------------------------------------- training ops
def exact_dedup_docs(sf_dir: str):
    import ray.data as rd

    from ..ops.dedup import exact_dedup

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    return exact_dedup(ds)


def token_counts(sf_dir: str):
    import ray.data as rd

    from ..ops.text import token_count_table

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    out = ds.map_batches(token_count_table, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_tokens"])


def text_quality(sf_dir: str):
    """Quality + language scoring — full SQL oracle (see
    pipelines/oracles.py text_quality_oracle)."""
    import ray.data as rd

    import ray

    from ..ops.text import TextAnalyzer

    # instance on a task pool, not a class on an actor pool: the analyzer's
    # state is compiled regexes + stopword sets (microseconds to pickle), so
    # actor spin-up would cost more than the state it amortizes. Real actor
    # pools are reserved for heavy state (models, indexes — see DecodeImage).
    ds = read_docs_parallel(sf_dir)
    out = ds.map_batches(TextAnalyzer(), batch_format="pandas",
                         batch_size=256)
    return out.select_columns(
        ["doc_id", "n_tokens", "quality_score", "lang_pred"])


def doc_fingerprints(sf_dir: str):
    import ray.data as rd

    from ..ops.text import Fingerprint

    ds = read_docs_parallel(sf_dir)
    out = ds.map_batches(Fingerprint(), batch_format="pandas")
    return out.select_columns(["doc_id", "fingerprint"])


def minhash_near_dups(sf_dir: str, *, recall_check_max_docs: int = 2000):
    """MinHash-LSH candidate pairs. No SQL oracle (probabilistic sketch) —
    instead the query SELF-CHECKS recall at gate scale: when the corpus is
    small enough for an exact pass, every pair with true n-gram Jaccard
    ≥ 0.9 must appear among the candidates (16 bands × 4 rows ⇒ detection
    probability ≈ 1 − (1 − 0.9⁴)¹⁶ ≈ 0.999)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..ops.dedup import minhash_lsh_candidates, ngram_set

    path = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    n_docs = pq.read_metadata(path).num_rows
    pairs = minhash_lsh_candidates(ds, approx_docs=n_docs).materialize()

    if n_docs <= recall_check_max_docs:
        docs = pq.read_table(path, columns=["doc_id", "text"])
        ids = docs.column("doc_id").to_pylist()
        sets = [ngram_set(t, 5) for t in docs.column("text").to_pylist()]
        sizes = [len(s) for s in sets]
        truth = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                lo, hi = sorted((sizes[i], sizes[j]))
                if hi == 0 or lo / hi < 0.9:  # J ≥ 0.9 needs similar sizes
                    continue
                inter = len(sets[i] & sets[j])
                if inter and inter / len(sets[i] | sets[j]) >= 0.9:
                    truth.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
        got = set(zip(*[pairs.to_pandas()[c] for c in ("id_a", "id_b")])) \
            if pairs.count() else set()
        missed = truth - got
        if truth and len(missed) > max(1, len(truth) // 100):
            raise AssertionError(
                f"MinHash-LSH recall check failed: {len(missed)}/{len(truth)} "
                f"true Jaccard≥0.9 pairs missed (e.g. {sorted(missed)[:3]})")
    return pairs


def simhash_sigs(sf_dir: str):
    """SimHash signatures, hex-encoded — bit-exact SQL oracle (word hash is
    DuckDB's md5_number_lower; the oracle recomputes the 64-bit majority
    vote per document)."""
    import pandas as pd
    import ray.data as rd

    from ..ops.dedup import SimHash

    ds = read_docs_parallel(sf_dir)
    out = ds.map_batches(SimHash(), batch_format="pandas")

    def to_hex(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "simhash_hex": [format(int(s), "016x") for s in df["simhash"]],
        })

    return out.map_batches(to_hex, batch_format="pandas")


def ann_topk(sf_dir: str, *, k: int = 10, n_queries: int = 5):
    """Brute-force cosine top-k; queries = the first n_queries vectors."""
    import ray.data as rd

    from ..ops.similarity import brute_force_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path)
    import pyarrow.parquet as pq

    # query rows = the n_queries min-vec_id rows; row-group stats prune the
    # read to the group(s) that can hold them — never the whole table
    meta = pq.ParquetFile(path)
    col_idx = meta.schema_arrow.names.index("vec_id")
    mins = [meta.metadata.row_group(i).column(col_idx).statistics.min
            if meta.metadata.row_group(i).column(col_idx).statistics
            else float("-inf") for i in range(meta.num_row_groups)]
    order = np.argsort(mins)
    parts, have = [], 0
    for pos, gi in enumerate(order):
        parts.append(meta.read_row_group(int(gi)))
        have += parts[-1].num_rows
        nth = sorted(pa.concat_tables(parts).column("vec_id").to_pylist()
                     )[:n_queries]
        nxt = mins[order[pos + 1]] if pos + 1 < len(order) else None
        if have >= n_queries and (nxt is None or nxt > nth[-1]):
            break
    head = pa.concat_tables(parts).sort_by("vec_id").slice(0, n_queries)
    qids = head.column("vec_id").to_pylist()
    qmat = np.stack([np.asarray(v, dtype=np.float64)
                     for v in head.column("embedding").to_pylist()])
    out = brute_force_topk(ds, qids, qmat, k=k)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["nn_rank" if c == "rank" else c for c in batch.column_names])

    return out.select_columns(["query_id", "neighbor_id", "rank"]) \
        .map_batches(rename, batch_format="pyarrow")


def embedding_dups(sf_dir: str, *, threshold: float = 0.99,
                   max_id: int = 1000):
    """Exact cosine near-dup pairs over a bounded id range (single bucket ⇒
    exhaustive; the LSH-bucketed variant is the scale path, tested for
    recall in tests/test_ops.py)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..ops.dedup import embedding_dup_pairs

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         filter=pc.field("vec_id") < max_id)
    out = embedding_dup_pairs(ds, threshold=threshold, num_buckets=1)
    df = out.to_pandas()  # pair set is tiny; empty Datasets lose their schema
    if "id_a" not in df.columns:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64())})
    return pa.table({"id_a": pa.array(df["id_a"], type=pa.int64()),
                     "id_b": pa.array(df["id_b"], type=pa.int64())})


def events_sliding_window(sf_dir: str, *, width_sec: int = 14400,
                          slide_sec: int = 3600):
    """Sliding event-time windows (4h window, 1h slide — each event in 4
    windows): per-window count + exact value sum (integer-cent
    accumulation; see ops/windows.py). Full SQL oracle."""
    import ray.data as rd

    from ..ops.windows import sliding_window_agg

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "value"])
    return sliding_window_agg(ds, ts_col="ts", value_col="value",
                              width_sec=width_sec, slide_sec=slide_sec)


def sliding_window_oracle(width_sec: int = 14400,
                          slide_sec: int = 3600) -> str:
    k = width_sec // slide_sec
    return f"""
WITH e AS (
  SELECT unnest(generate_series(
           (epoch_us(ts) // 1000000) // {slide_sec} - {k - 1},
           (epoch_us(ts) // 1000000) // {slide_sec})) * {slide_sec} AS w,
         value
  FROM events
)
SELECT w AS window_start_sec,
       COUNT(*) AS n_events,
       ROUND(SUM(COALESCE(value, 0)) * 100, 0) / 100 AS total_value
FROM e GROUP BY w
"""


def events_sessions(sf_dir: str, *, gap_sec: int = 1800):
    """Gap-based session windows per user (30 min inactivity gap). Full
    SQL oracle (lag + break-cumsum sessionization in DuckDB)."""
    import ray.data as rd

    from ..ops.windows import session_window_agg

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    return session_window_agg(ds, key_col="user_id", ts_col="ts",
                              gap_sec=gap_sec)


def session_window_oracle(gap_sec: int = 1800) -> str:
    return f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS sec FROM events
), o AS (
  SELECT user_id, sec,
         CASE WHEN lag(sec) OVER w IS NULL
                OR sec - lag(sec) OVER w > {gap_sec}
              THEN 1 ELSE 0 END AS brk
  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY sec)
), s AS (
  SELECT user_id, sec,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY sec
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM o
)
SELECT user_id, MIN(sec) AS session_start_sec,
       MAX(sec) AS session_end_sec, COUNT(*) AS n_events
FROM s GROUP BY user_id, sess
"""


def pii_redact(sf_dir: str):
    """PII redaction (emails / IPv4 / phone-shaped) — full SQL oracle
    applying the identical regex chain."""
    import ray.data as rd

    from ..ops.text import Redact

    ds = read_docs_parallel(sf_dir)
    out = ds.map_batches(Redact(), batch_format="pandas")
    return out.select_columns(["doc_id", "text_redacted"])


def repetition_quality(sf_dir: str):
    """Gopher-style repetition filter signals (dup-word / top-bigram
    fractions) — full SQL oracle (ops/curation.py repetition_oracle_sql)."""
    from ..ops.curation import repetition_signals

    ds = read_docs_parallel(sf_dir)
    return repetition_signals(ds)


def decontaminate_docs(sf_dir: str, *, n: int = 4, bench_mod: int = 97):
    """Benchmark n-gram decontamination: flag corpus docs sharing any word
    n-gram with the benchmark set (docs with doc_id % bench_mod == 0 stand
    in for an eval set — deterministic, no external data). n=4 at gate scale
    so the synthetic vocab produces hits; production uses the published
    n=13. Full SQL oracle (ops/curation.py decontaminate_oracle_sql)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..ops.curation import decontaminate

    path = os.path.join(sf_dir, "documents.parquet")

    def is_bench(t, *, invert=False):
        # pyarrow.compute has no modulo kernel (checked: pa 17) — numpy
        # over the zero-copy column view
        import numpy as np

        mask = (t.column("doc_id").to_numpy(zero_copy_only=False)
                % bench_mod) == 0
        return t.filter(pa.array(~mask if invert else mask))

    # benchmark side: small by construction — filtered per batch at the
    # scan, materialized driver-side only to build the broadcast gram set
    bench = rd.read_parquet(path, columns=["doc_id", "text"]) \
        .map_batches(is_bench, batch_format="pyarrow").to_pandas()
    corpus = read_docs_parallel(sf_dir).map_batches(
        lambda t: is_bench(t, invert=True), batch_format="pyarrow")
    counts = decontaminate(corpus, bench["text"], n=n)
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_contaminated_grams"), 0)),
        batch_format="pyarrow")


def stratified_docs(sf_dir: str):
    """Deterministic hash-stratified domain-mix sampling (downsample 'en' to
    25%, others 75%) — full SQL oracle via DuckDB md5_number_lower."""
    import ray.data as rd

    from ..ops.curation import stratified_sample

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "lang", "source"])
    return stratified_sample(ds, {"en": 2500}, default_bps=7500)


def embedding_kmeans(sf_dir: str):
    """Distributed k-means assignment step over the embeddings table with
    PINNED centroids (k=8, the deterministic smallest-id init, zero Lloyd
    iterations) — FULL SQL ORACLE: one fixed-centroid assignment is a
    CROSS JOIN argmin in DuckDB, so the driver hash-compares the whole
    distributed init→broadcast→assign→group pipeline. The ITERATIVE Lloyd
    path (same `_Assign`/`_PartialSums` machinery, iters>0) stays gated by
    the naive-numpy golden reference + block-layout-invariance tests in
    tests/test_clustering.py. Output is integer-only per-cluster stats
    (size, min/sum of member ids). Assignment argmax margins at sf0.01
    are ≥4e-4 — far above any float32/float64 evaluation-order noise
    between numpy and DuckDB."""
    import pandas as pd
    import ray.data as rd

    from ..ops.clustering import kmeans

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    res = kmeans(ds, 8, iters=0)

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cluster": [int(df["cluster"].iloc[0])],
            "n_members": [len(df)],
            "min_vec_id": [int(df["vec_id"].min())],
            "sum_vec_id": [int(df["vec_id"].sum())],
        })

    return res.assignments.select_columns(["vec_id", "cluster"]) \
        .groupby("cluster").map_groups(summarize, batch_format="pandas") \
        .sort("cluster")


def semantic_dedup_docs(sf_dir: str):
    """SemDeDup's two distributed stages (Abbas et al. 2023) with
    DRIVER-CHECKABLE semantics — FULL SQL ORACLE: pinned-centroid
    assignment (k=8 smallest-id init, zero Lloyd iterations) + the
    first-order per-cluster winner step (a row drops iff a LOWER-id
    cluster-mate has cosine ≥ tau; rep = the max-cosine such row), both
    expressible in DuckDB (CROSS JOIN argmin + self-join window). The
    full ITERATIVE path (Lloyd k-means + transitive greedy kept-set scan,
    `semantic_dedup`) runs the same groupby/map_groups machinery and
    stays gated by the naive O(n^2) reference + planted-duplicate tests
    in tests/test_clustering.py. tau=0.45 sits ≥1.5e-3 away from every
    pairwise cosine at sf0.01, so the threshold can't flip on fp noise;
    output (integer ids only) lists the dropped rows."""
    import ray.data as rd

    from ..ops.clustering import fixed_centroid_dedup

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    out = fixed_centroid_dedup(ds, tau=0.45, k=8)
    dropped = out.filter(expr="is_kept == False")
    return dropped.select_columns(["vec_id", "cluster", "rep_id"]) \
        .sort("vec_id")


def gopher_filter(sf_dir: str):
    """Gopher rule-based quality filter (Rae et al. 2021) — full SQL
    oracle (ops/curation.py gopher_oracle_sql, identical RE2 regex
    signals, integer-only arithmetic)."""
    import ray.data as rd

    from ..ops.curation import gopher_rules

    ds = read_docs_parallel(sf_dir, columns=("doc_id", "text"))
    return gopher_rules(ds)


def merge_apply(sf_dir: str):
    """ANSI MERGE INTO exercising all four arms (matched-delete,
    matched-update, not-matched-insert, not-matched-by-source-update)
    against a pruned customer copy — full SQL oracle (LEFT JOIN + CASE
    reconstruction of the final state, integer-only columns)."""
    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    work = f"/tmp/qwery_ray_driver/merge_{tag}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    pq.write_table(cust, os.path.join(work, "cust.parquet"))

    eng = QweryEngine(table_root=work)
    orders = os.path.join(sf_dir, "orders.parquet")
    customer = os.path.join(sf_dir, "customer.parquet")
    eng.sql(f"""
        MERGE INTO cust AS t USING (
            SELECT o_custkey AS k, COUNT(*) AS n
            FROM '{orders}' WHERE o_orderkey % 5 = 0 GROUP BY o_custkey
            UNION ALL
            SELECT c_custkey + 100000 AS k, 7 AS n
            FROM '{customer}' WHERE c_custkey <= 20
        ) AS s ON t.c_custkey = s.k
        WHEN MATCHED AND s.n > 4 THEN DELETE
        WHEN MATCHED THEN UPDATE SET c_nationkey = s.n
        WHEN NOT MATCHED THEN INSERT (c_custkey, c_nationkey)
            VALUES (s.k, -2)
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c_nationkey = -1
    """)
    return eng.sql(
        "SELECT c_custkey, CAST(c_nationkey AS INT) AS flag FROM cust "
        "ORDER BY c_custkey")


def merge_apply_oracle_sql() -> str:
    return """
WITH s AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderkey % 5 = 0 GROUP BY o_custkey
  UNION ALL
  SELECT c_custkey + 100000 AS k, CAST(7 AS BIGINT) AS n
  FROM customer WHERE c_custkey <= 20
),
merged AS (
  SELECT c.c_custkey,
         CASE WHEN s.k IS NULL THEN CAST(-1 AS BIGINT) ELSE s.n END AS flag,
         CASE WHEN s.k IS NOT NULL AND s.n > 4 THEN 1 ELSE 0 END AS del
  FROM customer c LEFT JOIN s ON c.c_custkey = s.k
),
ins AS (
  SELECT s.k AS c_custkey, CAST(-2 AS BIGINT) AS flag
  FROM s LEFT JOIN customer c ON c.c_custkey = s.k
  WHERE c.c_custkey IS NULL
)
SELECT c_custkey, flag FROM merged WHERE del = 0
UNION ALL
SELECT c_custkey, flag FROM ins
ORDER BY c_custkey
"""


def bm25_keyword_scores(sf_dir: str):
    """BM25 keyword relevance over documents (Robertson & Zaragoza 2009)
    — full SQL oracle, bit-exact doubles (ops/bm25.py: integer df/dl
    partials merged on the driver, ln() via the shared libm, mirrored
    IEEE expression order)."""
    from ..ops.bm25 import bm25_scores

    ds = read_docs_parallel(sf_dir, columns=("doc_id", "text"))
    return bm25_scores(ds, ["join", "hash", "vector", "merge"])


def pack_sequences_docs(sf_dir: str):
    """Greedy training-window sequence packing (T5-style, capacity 512) —
    NO SQL ORACLE (greedy bin assignment isn't SQL-expressible); the
    independent naive reference + invariant gates live in
    tests/test_packing.py, and this query SELF-CHECKS the two packing
    invariants at gate scale (fill ≤ capacity; bin count within the BFD
    11/9·OPT+1 bound per shard). Integer-only output → stable rows-only
    driver record."""
    import pandas as pd

    from ..ops.curation import pack_sequences

    C = 512
    ds = read_docs_parallel(sf_dir, columns=("doc_id", "text"))
    packed = pack_sequences(ds, capacity=C, num_shards=16)
    out = packed.to_pandas()  # narrow int rows: ≤ a few chunks per doc
    fills = out.groupby(["shard", "bin"])["n_tokens"].sum()
    if (fills > C).any():
        raise AssertionError("packing invariant violated: bin over capacity")
    per_shard = out.groupby("shard").agg(
        bins=("bin", "nunique"), toks=("n_tokens", "sum"))
    import math

    for _, r in per_shard.iterrows():
        lb = math.ceil(r["toks"] / C)
        if r["bins"] > math.ceil(11 * lb / 9) + 1:
            raise AssertionError("packing invariant violated: BFD bound")
    return out.sort_values(["shard", "bin", "doc_id", "chunk"],
                           ignore_index=True)


def lm_quality_score(sf_dir: str):
    """CCNet-style char-bigram LM bits-per-byte quality score — NO SQL
    ORACLE (log-space model scoring); gated by the independent pure-python
    reference + block-layout-invariance tests in tests/test_packing.py.
    Scores are deterministic (fixed training subset, fixed float64 kernel)
    and snapped to 1e-6 so the rows-only record is stable."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.curation import char_lm_score

    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    ds = read_docs_parallel(sf_dir, columns=("doc_id", "text"))
    scored = char_lm_score(ds, train_mod=50, approx_docs=n_docs)

    def snap(b: pa.Table) -> pa.Table:
        s = pc.divide(pc.round(pc.multiply(b.column("lm_bits"), 1e6)), 1e6)
        return pa.table({"doc_id": b.column("doc_id"), "lm_bits6": s})

    return scored.map_batches(snap, batch_format="pyarrow").sort("doc_id")


def using_sample_rows(sf_dir: str):
    """Deterministic USING SAMPLE (content-hash) — NO SQL ORACLE possible:
    DuckDB's TABLESAMPLE is RNG-based, so no cross-engine sample agrees
    row-for-row by design. The engine's sample is exactly reproducible
    (seeded xxhash of row content), so the rows-only driver record is
    stable run to run; determinism/layout-invariance/exact-N gates live in
    tests/test_sample.py."""
    eng = engine_for(sf_dir)
    return eng.sql(
        "SELECT o_orderkey, o_custkey FROM orders USING SAMPLE 200 ROWS "
        "ORDER BY o_orderkey")


def chunk_documents(sf_dir: str):
    """Fixed-token overlapping text chunking (embedding/RAG pre-pass) —
    FULL SQL ORACLE on the per-document closed forms: n_chunks and
    Σ chunk tokens are exact functions of the regex token count
    (ops/curation.py chunk_oracle_sql — same RE2 pattern in DuckDB).
    Chunk-text reconstruction is golden-gated in tests/test_packing.py."""
    import pandas as pd

    from ..ops.curation import chunk_text

    ds = read_docs_parallel(sf_dir, columns=("doc_id", "text"))
    chunks = chunk_text(ds, max_tokens=128, overlap=16)

    # a document's chunks are CONTIGUOUS WITHIN ONE BATCH (ChunkText emits
    # per input batch), so the per-doc rollup is a batch-local pandas
    # groupby — no shuffle, no groupby barrier
    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False)
        out = g.agg(n_chunks=("chunk", "size"),
                    sum_tokens=("n_tokens", "sum")).reset_index()
        return out.astype({"doc_id": "int64", "n_chunks": "int64",
                           "sum_tokens": "int64"})

    return chunks.map_batches(per_batch, batch_format="pandas") \
        .sort("doc_id")


def near_dup_components(sf_dir: str):
    """Connected components over a deterministic edge set (doc i → i+1
    wherever i % 7 < 3, built by the SQL engine's self-join) — FULL SQL
    ORACLE: DuckDB recursive-CTE transitive closure computes the identical
    min-id component labels. The op itself (ops/dedup.py
    connected_components) is what closes minhash/embedding near-dup PAIRS
    into duplicate clusters at scale; topology + forced-distributed-path
    gates live in tests/test_components.py."""
    from ..ops.dedup import connected_components

    eng = engine_for(sf_dir)
    pairs = eng.sql(
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM documents a "
        "INNER JOIN documents b ON b.doc_id = a.doc_id + 1 "
        "WHERE a.doc_id % 7 < 3")
    return connected_components(pairs).sort("id")


def block_dedup_docs(sf_dir: str):
    """Corpus-wide first-occurrence dedup of non-overlapping 16-token
    blocks (C4-grain structural dedup, arXiv:1910.10683 §2.2) — FULL SQL
    ORACLE: the block unit is the space-rejoined token slice, so DuckDB
    reconstructs every unit (regexp_extract_all + list_slice +
    array_to_string) and replays the identical min-(doc_id, ord) winner
    rule. ops/corpus.py: unit text never crosses a shuffle; losers come
    back as one broadcast set (anti join at scale)."""
    import pyarrow.parquet as pq

    from ..ops.corpus import token_block_dedup

    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    ds = read_docs_parallel(sf_dir, columns=("doc_id", "text"))
    return token_block_dedup(ds, block_tokens=16, approx_docs=n_docs) \
        .sort("doc_id")


def dup_span_docs(sf_dir: str):
    """Per-document duplicated-substring coverage (Lee et al. 2021,
    arXiv:2107.06499): how many token positions sit inside an 8-gram that
    occurs more than once corpus-wide. FULL SQL ORACLE — all-integer
    output, DuckDB replays the gram window + interval union exactly."""
    import pyarrow.parquet as pq

    from ..ops.corpus import dup_span_stats

    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    ds = read_docs_parallel(sf_dir, columns=("doc_id", "text"))
    return dup_span_stats(ds, w=8, approx_docs=n_docs).sort("doc_id")


def dsir_weights_docs(sf_dir: str):
    """DSIR hashed-ngram importance log-weights (Xie et al. 2023) — full
    SQL oracle (ops/curation.py dsir_oracle_sql: same md5 bucketing +
    Laplace smoothing in DuckDB). Weights snapped at 1e-6 on both sides
    (float summation order differs across engines)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from ..ops.curation import dsir_weights

    n_docs = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    ds = read_docs_parallel(sf_dir, columns=("doc_id", "text"))
    w = dsir_weights(ds, approx_docs=n_docs)

    def snap(b: pa.Table) -> pa.Table:
        x = b.column("log_weight").to_numpy(zero_copy_only=False)
        s = np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_grams": b.column("n_grams"),
                         "log_weight": pa.array(s, pa.float64())})

    return w.map_batches(snap, batch_format="pyarrow").sort("doc_id")


def bpe_tokens(sf_dir: str):
    """Distributed BPE tokenizer training + encoding (Sennrich 2016) — NO
    SQL ORACLE (the merge loop is iterative); gated by the independent
    naive-reference + reconstruction-invariant tests in tests/test_bpe.py.
    All outputs are integers (bit-stable at any parallelism)."""
    import pyarrow.parquet as _pq

    from ..ops.bpe import bpe_token_counts, train_bpe

    n_docs = _pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    ds = read_docs_parallel(sf_dir, columns=("doc_id", "text"))
    merges = train_bpe(ds, num_merges=200, approx_docs=n_docs)
    return bpe_token_counts(ds, merges).sort("doc_id")


def streaming_window(sf_dir: str):
    """Event-time streaming tumbling windows (watermark semantics,
    ops/streaming.py) — the stream is events.parquet replayed as four
    LSN-ordered transactions (event_id quartiles, each a predicate-pruned
    parquet read). Infinite lateness ⇒ the emitted windows equal the batch
    aggregate, giving a FULL SQL oracle; the watermark/late-drop semantics
    are gated by tests/test_streaming.py."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    from ..ops.streaming import stream_window_agg

    path = os.path.join(sf_dir, "events.parquet")
    n = _pq.read_metadata(path).num_rows
    cuts = [(n * i) // 4 for i in range(5)]  # event_id is 0-based

    def chunk(lo, hi):
        import pyarrow.dataset as pds
        f = (pds.field("event_id") >= lo) & (pds.field("event_id") < hi)
        return rd.read_parquet(path, columns=["event_id", "ts", "value"],
                               filter=f)

    chunks = (chunk(lo, hi) for lo, hi in zip(cuts, cuts[1:]))
    return stream_window_agg(chunks, width_sec=7200, slide_sec=7200)


def streaming_window_oracle_sql(width_sec: int = 7200) -> str:
    return f"""
SELECT ((epoch_us(ts) // 1000000) // {width_sec}) * {width_sec}
         AS window_start_sec,
       COUNT(*) AS n_events,
       ROUND(SUM(COALESCE(value, 0)) * 100, 0) / 100 AS total_value
FROM events GROUP BY 1 ORDER BY 1
"""
