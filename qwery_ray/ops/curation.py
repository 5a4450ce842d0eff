"""Corpus-curation stages for large-scale training-data pipelines.

Three operators a 100 TB pre-training pipeline runs after dedup/quality
scoring (all published practice — Gopher/MassiveText repetition filters,
GPT-3/Llama n-gram benchmark decontamination, domain-mix sampling):

- :func:`repetition_signals` — per-document repeated-word and top-bigram
  fractions (Rae et al. 2021 "Scaling Language Models" §A.1.1 repetition
  filters, public arXiv:2112.11446).
- :func:`decontaminate` — flag documents sharing any word n-gram with a
  (small, broadcast) benchmark/eval set (Brown et al. 2020 GPT-3 appendix C
  13-gram decontamination, public arXiv:2005.14165).
- :func:`stratified_sample` — deterministic hash-based per-stratum sampling
  for domain mixing: a document is kept iff md5(key) mod 10000 falls below
  its stratum's basis-point rate. Rerunnable, order-independent, and exactly
  reproducible in SQL (DuckDB ``md5_number_lower``).

Scale shape: every stage is a vectorized ``map_batches`` transform — the
corpus side streams, never shuffles, never materializes. The benchmark side
of :func:`decontaminate` is assumed small (eval sets are MBs even in
production) and is broadcast once via ``ray.put``; membership tests run
against the shared object-store copy in every task, not re-shipped per
batch. Tokenization is a literal single-space split so the DuckDB oracle
(``string_split(text, ' ')``) is bit-identical; production would swap in the
pre-tokenizer regex from ops/text.py.

Reference parity note: the qwery reference has no corpus-curation surface —
these extend SURVEY.md §2's training-data-ops mandate (same family as
ops/dedup.py and ops/text.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data as rd


# --------------------------------------------------------------------------
# repetition signals (Gopher-style quality filters)
# --------------------------------------------------------------------------


class RepetitionSignals:
    """Per-document repetition statistics, fully vectorized.

    ``dup_word_frac``  = 1 - distinct_words / total_words
    ``top_bigram_frac`` = count(most frequent word bigram) / total bigrams

    Implementation: one ``explode`` of the split-word lists, then C-level
    pandas groupbys (``nunique``, ``shift``, ``value_counts``) — no per-row
    Python in the hot path.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        words = batch[self.text_col].fillna("").str.split(" ")
        ex = words.explode()
        n_words = words.str.len().astype("int64")
        n_distinct = (
            ex.groupby(level=0).nunique().reindex(batch.index, fill_value=0)
        )
        dup_frac = 1.0 - n_distinct / n_words.clip(lower=1)

        # bigrams: pair each word with its successor inside the same doc
        nxt = ex.groupby(level=0).shift(-1)
        grams = (ex + " " + nxt).dropna()
        if len(grams):
            cnt = grams.groupby([grams.index, grams]).size()
            per_doc = cnt.groupby(level=0)
            top = per_doc.max()
            tot = per_doc.sum()
            top_frac = (top / tot).reindex(batch.index, fill_value=0.0)
        else:
            top_frac = pd.Series(0.0, index=batch.index)

        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "dup_word_frac": dup_frac.astype("float64"),
            "top_bigram_frac": top_frac.astype("float64"),
        })


def repetition_signals(ds: rd.Dataset, *, text_col: str = "text",
                       id_col: str = "doc_id") -> rd.Dataset:
    """Gopher-style repetition filter signals per document (streaming)."""
    return ds.map_batches(
        RepetitionSignals(text_col, id_col), batch_format="pandas")


def repetition_oracle_sql() -> str:
    """DuckDB SQL computing identical signals (single-space tokenization)."""
    return r"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
wstats AS (
  SELECT doc_id, count(*) AS n_words, count(DISTINCT w) AS n_distinct
  FROM words GROUP BY doc_id
),
grams AS (
  SELECT d.doc_id, ws[i.i] || ' ' || ws[i.i + 1] AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
       LATERAL (SELECT unnest(range(1, len(ws))) AS i) i
),
gcnt AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
topg AS (SELECT doc_id, max(c) AS top_c, sum(c) AS total_g
         FROM gcnt GROUP BY doc_id)
SELECT w.doc_id,
       1.0 - w.n_distinct::DOUBLE / w.n_words AS dup_word_frac,
       COALESCE(t.top_c::DOUBLE / t.total_g, 0.0) AS top_bigram_frac
FROM wstats w LEFT JOIN topg t USING (doc_id)
"""


# --------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a broadcast eval set)
# --------------------------------------------------------------------------


def _doc_ngrams_vectorized(text: pd.Series, n: int) -> pd.Series:
    """All word ``n``-grams per row as an exploded Series (index = row pos).

    Vectorized: one explode + (n-1) grouped shifts + string concat; a
    position whose window runs past the document end concats with NaN and
    is dropped. No per-row Python loop.
    """
    words = text.fillna("").str.split(" ")
    ex = words.explode()
    gram = ex
    grp = ex.groupby(level=0)
    for k in range(1, n):
        gram = gram + " " + grp.shift(-k)
    return gram.dropna()


class ContaminationCount:
    """Count distinct benchmark n-grams occurring in each document.

    The benchmark gram set lives in the object store (``ray.put`` once);
    each actor dereferences it in ``__init__`` — zero-copy for the workers
    on the same node, one transfer per remote node, never per batch.
    """

    def __init__(self, bench_ref, *, n: int, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.bench = ray.get(bench_ref) if isinstance(
            bench_ref, ray.ObjectRef) else bench_ref
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        grams = _doc_ngrams_vectorized(batch[self.text_col], self.n)
        hits = grams[grams.isin(self.bench)]
        n_cont = hits.groupby(level=0).nunique()
        out = pd.DataFrame({
            self.id_col: batch[self.id_col],
            "n_contaminated_grams": n_cont.reindex(
                batch.index, fill_value=0).astype("int64"),
        })
        return out


def benchmark_ngrams(bench_texts: pd.Series, n: int) -> frozenset:
    """Distinct word n-grams of the (small) benchmark set, driver-side."""
    return frozenset(_doc_ngrams_vectorized(
        bench_texts.reset_index(drop=True), n))


# per-worker-process broadcast cache: map_batches TASKS reuse warm worker
# processes, so the eval-set frozenset (a pickled Python object — ray.get
# re-deserializes it on every call, unlike zero-copy numpy) is decoded once
# per worker, not once per block. Bounded at one eval set per worker.
_GRAM_CACHE: dict = {}


def decontaminate(ds: rd.Dataset, bench_texts: pd.Series, *, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  keep_clean_rows: bool = False) -> rd.Dataset:
    """Flag (or drop) corpus documents sharing any word ``n``-gram with the
    benchmark texts. Returns per-doc contamination counts by default; with
    ``keep_clean_rows`` returns only the rows of clean documents (count 0),
    i.e. the id set of the decontaminated corpus.

    100 TB shape: the corpus streams through a task-pool map_batches (the
    broadcast gram set is lightweight state — task-pool-vs-actor policy:
    state weight decides; a fixed actor pool paid ~2 s of process spawn +
    imports per call and capped parallelism at its width); the benchmark
    gram set is ``ray.put`` once and cached per worker process (eval sets
    are small by nature).
    """
    bench_ref = ray.put(benchmark_ngrams(bench_texts, n))

    def count_batch(batch, _ref=bench_ref, _n=n, _tc=text_col, _ic=id_col):
        key = _ref.hex()
        bench = _GRAM_CACHE.get(key)
        if bench is None:
            _GRAM_CACHE.clear()
            bench = _GRAM_CACHE[key] = ray.get(_ref)
        return ContaminationCount(bench, n=_n, text_col=_tc,
                                  id_col=_ic)(batch)

    counts = ds.map_batches(count_batch, batch_format="pandas")
    if not keep_clean_rows:
        return counts
    import pyarrow.compute as pc
    return counts.map_batches(
        lambda t: t.filter(pc.equal(t.column("n_contaminated_grams"), 0)),
        batch_format="pyarrow")


def decontaminate_oracle_sql(*, n: int, bench_mod: int) -> str:
    """DuckDB SQL for the gate pipeline: benchmark = docs with
    ``doc_id % bench_mod = 0`` (deterministic in-corpus eval stand-in),
    output = contaminated non-benchmark docs with distinct-gram counts."""
    return f"""
WITH grams AS (
  SELECT d.doc_id, array_to_string(ws[i.i : i.i + {n - 1}], ' ') AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
       LATERAL (SELECT unnest(range(1, len(ws) - {n - 2})) AS i) i
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {bench_mod} = 0)
SELECT g2.doc_id,
       CAST(count(DISTINCT g2.g) AS BIGINT) AS n_contaminated_grams
FROM grams g2 JOIN bench b ON g2.g = b.g
WHERE g2.doc_id % {bench_mod} <> 0
GROUP BY g2.doc_id
"""


# --------------------------------------------------------------------------
# deterministic stratified sampling (domain mixing)
# --------------------------------------------------------------------------


def _md5_bucket(keys: pd.Series, mod: int = 10000) -> np.ndarray:
    """md5(key-as-string) low 64 bits mod ``mod`` — matches DuckDB
    ``md5_number_lower(CAST(key AS VARCHAR)) % mod`` exactly.

    Per-row hashlib on a narrow key column (same isolated-loop precedent as
    ops/dedup.py ContentHash — there is no vectorized md5 in Arrow)."""
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys.astype(str).to_numpy()):
        # md5_number_lower = little-endian uint64 of the LAST 8 digest bytes
        out[i] = int.from_bytes(
            hashlib.md5(k.encode()).digest()[8:], "little")
    return out % np.uint64(mod)


class StratifiedSampleFilter:
    """Keep a row iff its key hash-bucket < its stratum's bps rate."""

    def __init__(self, rates_bps: dict, *, default_bps: int,
                 key_col: str, strat_col: str):
        self.rates = rates_bps
        self.default = default_bps
        self.key_col = key_col
        self.strat_col = strat_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        bucket = _md5_bucket(batch[self.key_col])
        limit = (batch[self.strat_col].map(self.rates)
                 .fillna(self.default).to_numpy(dtype=np.int64))
        return batch[bucket < limit.astype(np.uint64)]


def stratified_sample(ds: rd.Dataset, rates_bps: dict, *,
                      default_bps: int = 10000, key_col: str = "doc_id",
                      strat_col: str = "lang") -> rd.Dataset:
    """Deterministic per-stratum downsampling for domain mixing.

    ``rates_bps`` maps stratum value → keep-rate in basis points (of 10000).
    Hash-based (md5 of the key), so the sample is stable across reruns,
    partitionings and cluster sizes — a retried task keeps exactly the same
    rows. Streams; no shuffle, no state."""
    return ds.map_batches(
        StratifiedSampleFilter(rates_bps, default_bps=default_bps,
                               key_col=key_col, strat_col=strat_col),
        batch_format="pandas")


def stratified_oracle_sql(rates_bps: dict, *, default_bps: int = 10000,
                          key_col: str = "doc_id",
                          strat_col: str = "lang") -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(rates_bps.items()))
    return f"""
SELECT doc_id, lang, source
FROM documents
WHERE md5_number_lower(CAST({key_col} AS VARCHAR)) % 10000 <
      CASE {strat_col} {cases} ELSE {default_bps} END
"""


# --------------------------------------------------------------------------
# Gopher rule-based quality filter (Rae et al. 2021 §A.1.1, arXiv:2112.11446)
# --------------------------------------------------------------------------


class GopherRules:
    """Per-document integer quality signals + the Gopher pass/fail verdict.

    All signals are INTEGER counts and every rule is integer arithmetic
    (10*n_sym <= n_words instead of n_sym/n_words <= 0.1), so the DuckDB
    oracle (:func:`gopher_oracle_sql`) hashes bit-identically — no float
    ratios cross the gate. Vectorized pandas ``.str`` regex kernels, no
    row loop; the compiled patterns live in pandas' regex cache, the class
    itself is stateless (task pool, no actor spin-up).

    Rules (published Gopher thresholds):
      50 <= n_words <= 100000; mean word length in [3, 10]; '#'/'...'
      symbol-to-word ratio <= 0.1; <= 90% of lines bullet-started;
      <= 30% of lines ellipsis-terminated; >= 80% of words contain an
      alphabetic character.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col]
        out = pd.DataFrame({self.id_col: batch[self.id_col].to_numpy()})
        n_words = t.str.count(r"\S+").astype(np.int64)
        word_chars = t.str.replace(r"\s+", "", regex=True) \
            .str.len().astype(np.int64)
        n_alpha = t.str.count(r"\S*[A-Za-z]\S*").astype(np.int64)
        n_sym = t.str.count(r"#|\.\.\.").astype(np.int64)
        n_lines = (t.str.count(r"\n") + 1).astype(np.int64)
        n_bullet = t.str.count(r"(?m)^[ \t]*[-*•]").astype(np.int64)
        n_ellip = t.str.count(r"(?m)\.\.\.$").astype(np.int64)
        out["n_words"] = n_words
        out["word_chars"] = word_chars
        out["n_alpha_words"] = n_alpha
        out["n_sym"] = n_sym
        out["n_lines"] = n_lines
        out["n_bullet_lines"] = n_bullet
        out["n_ellipsis_lines"] = n_ellip
        out["passes"] = (
            (n_words >= 50) & (n_words <= 100000)
            & (word_chars >= 3 * n_words) & (word_chars <= 10 * n_words)
            & (10 * n_sym <= n_words)
            & (10 * n_bullet <= 9 * n_lines)
            & (10 * n_ellip <= 3 * n_lines)
            & (5 * n_alpha >= 4 * n_words)
        ).astype(np.int64)
        return out


def gopher_rules(ds: rd.Dataset, *, text_col: str = "text",
                 id_col: str = "doc_id") -> rd.Dataset:
    """Gopher rule filter signals per document (streaming map_batches)."""
    return ds.map_batches(GopherRules(text_col, id_col),
                          batch_format="pandas")


def gopher_oracle_sql() -> str:
    """DuckDB SQL computing the identical integer signals/verdict (RE2
    regexes — the same engine family as pandas' patterns here; parity over
    every signal is asserted in tests/test_curation.py)."""
    return r"""
WITH s AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '\S+')) AS n_words,
    length(regexp_replace(text, '\s+', '', 'g')) AS word_chars,
    len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS n_alpha_words,
    len(regexp_extract_all(text, '#|\.\.\.')) AS n_sym,
    len(regexp_extract_all(text, '\n')) + 1 AS n_lines,
    len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]')) AS n_bullet_lines,
    len(regexp_extract_all(text, '(?m)\.\.\.$')) AS n_ellipsis_lines
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(word_chars AS BIGINT) AS word_chars,
       CAST(n_alpha_words AS BIGINT) AS n_alpha_words,
       CAST(n_sym AS BIGINT) AS n_sym,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_bullet_lines AS BIGINT) AS n_bullet_lines,
       CAST(n_ellipsis_lines AS BIGINT) AS n_ellipsis_lines,
       CAST(n_words BETWEEN 50 AND 100000
            AND word_chars BETWEEN 3 * n_words AND 10 * n_words
            AND 10 * n_sym <= n_words
            AND 10 * n_bullet_lines <= 9 * n_lines
            AND 10 * n_ellipsis_lines <= 3 * n_lines
            AND 5 * n_alpha_words >= 4 * n_words AS BIGINT) AS passes
FROM s
"""


# --------------------------------------------------------------------------
# sequence packing (training-window bin packing)
# --------------------------------------------------------------------------
class TokenChunks:
    """Stage 1 of :func:`pack_sequences`: per-document regex token counts
    (the ops/text.py tokenizer), documents longer than ``capacity`` split
    into ⌈n/C⌉ chunks, every chunk tagged with a ``doc_id``-derived shard.

    Only the narrow (doc_id, chunk, n_tokens, shard) int rows leave this
    stage — the text column never enters the packing shuffle."""

    TOKEN_RE = r"[A-Za-z]+|\d+|[^\w\s]"

    def __init__(self, capacity: int, num_shards: int,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.capacity = capacity
        self.num_shards = num_shards
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        C = self.capacity
        ntok = pc.count_substring_regex(
            pc.cast(batch.column(self.text_col), pa.string()),
            self.TOKEN_RE).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = pc.cast(batch.column(self.id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        reps = np.maximum(1, (ntok + C - 1) // C)
        ridx = np.repeat(np.arange(len(ids)), reps)
        cum = np.concatenate(([0], np.cumsum(reps)[:-1]))
        chunk = np.arange(int(reps.sum())) - np.repeat(cum, reps)
        last = reps[ridx] - 1
        sizes = np.where(chunk < last, C,
                         ntok[ridx] - last * C).astype(np.int64)
        return pa.table({
            self.id_col: pa.array(ids[ridx], pa.int64()),
            "chunk": pa.array(chunk, pa.int64()),
            "n_tokens": pa.array(sizes, pa.int64()),
            "__shard": pa.array(ids[ridx] % self.num_shards, pa.int64()),
        })


class PackShard:
    """Stage 2: deterministic best-fit-decreasing bin packing within one
    shard. Items sort by (-n_tokens, doc_id, chunk); each item lands in the
    open bin with the SMALLEST remaining capacity that still fits (sorted
    remainders + bisect → O(n log n) per shard), else opens a new bin.
    BFD shares first-fit-decreasing's ≤ 11/9·OPT + 1 guarantee."""

    def __init__(self, capacity: int, id_col: str = "doc_id"):
        self.capacity = capacity
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import bisect

        d = df.sort_values(["n_tokens", self.id_col, "chunk"],
                           ascending=[False, True, True],
                           kind="stable").reset_index(drop=True)
        toks = d["n_tokens"].to_numpy()
        assign = np.empty(len(d), dtype=np.int64)
        rems: list[tuple[int, int]] = []  # sorted (remaining, bin_id)
        next_bin = 0
        for i, t in enumerate(toks):
            t = int(t)
            j = bisect.bisect_left(rems, (t,))
            if j == len(rems):
                b, rem = next_bin, self.capacity - t
                next_bin += 1
            else:
                r0, b = rems.pop(j)
                rem = r0 - t
            bisect.insort(rems, (rem, b))
            assign[i] = b
        d["bin"] = assign
        d["shard"] = d.pop("__shard")
        return d[["shard", "bin", self.id_col, "chunk", "n_tokens"]]


def pack_sequences(ds: rd.Dataset, *, capacity: int = 2048,
                   num_shards: int = 64, text_col: str = "text",
                   id_col: str = "doc_id") -> rd.Dataset:
    """Greedy sequence packing: assemble documents (split into ≤capacity
    token chunks) into fixed-capacity training windows — the standard
    pre-training batching step (packed sequences waste no pad tokens;
    e.g. T5, arXiv:1910.10683 §3.1.2 "packing").

    Scale shape: stage 1 streams the corpus once and emits only int rows;
    the groupby shuffle moves O(#chunks) integers across `num_shards`
    bounded groups (shard count scales with the cluster, each shard packs
    independently — global packing is inherently sequential, shard-local
    BFD is the published practice). Determinism: shard = doc_id mod
    num_shards, BFD order fully tie-broken."""
    tc = TokenChunks(capacity, num_shards, text_col, id_col)

    def token_chunks(b, _t=tc):
        return _t(b)

    chunks = ds.map_batches(token_chunks, batch_format="pyarrow")
    packer = PackShard(capacity, id_col)

    def pack_one_shard(df: pd.DataFrame, _p=packer) -> pd.DataFrame:
        return _p(df)

    return chunks.groupby("__shard").map_groups(
        pack_one_shard, batch_format="pandas")


# --------------------------------------------------------------------------
# character-bigram LM quality scoring (CCNet-style perplexity filter)
# --------------------------------------------------------------------------
class BigramCounts:
    """Sparse per-batch byte-bigram counts over the deterministic training
    subset (doc_id % train_mod == 0). Emits (pair, cnt) rows — the pair
    domain is bounded at 256² = 65,536, so the downstream groupby-sum is a
    bounded-cardinality shuffle at ANY corpus size."""

    def __init__(self, train_mod: int = 50, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.train_mod = train_mod
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        ids = pc.cast(batch.column(self.id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(ids % self.train_mod == 0)
        acc = np.zeros(65536, dtype=np.int64)
        texts = batch.column(self.text_col).to_pylist()
        for k in keep:
            t = texts[k]
            if not t or len(t) < 2:
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            if len(b) < 2:
                continue
            pairs = b[:-1].astype(np.int32) * 256 + b[1:]
            acc += np.bincount(pairs, minlength=65536)
        nz = np.flatnonzero(acc)
        return pa.table({"pair": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(acc[nz])})


class LMScore:
    """Score every document's bits-per-byte under the broadcast bigram
    model: -mean(log2 p(b_i | b_{i-1})). Model matrix (512 KB) is ray.put
    once and fetched once per actor, never re-shipped per batch."""

    def __init__(self, logp_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.logp_ref = logp_ref
        self.text_col = text_col
        self.id_col = id_col
        self._logp = None

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        if self._logp is None:
            self._logp = ray.get(self.logp_ref)
        logp = self._logp
        texts = batch.column(self.text_col).to_pylist()
        # vectorized across the batch: one concatenated byte array, one
        # logp gather, per-doc means via reduceat with cross-document
        # boundary pairs masked out
        enc = [(t or "").encode("utf-8") for t in texts]
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64,
                           count=len(enc))
        out = np.zeros(len(enc), dtype=np.float64)
        if lens.sum() >= 2:
            blob = np.frombuffer(b"".join(enc), dtype=np.uint8)
            ends = np.cumsum(lens)
            starts = ends - lens
            if len(blob) >= 2:
                pairs = blob[:-1].astype(np.int32) * 256 + blob[1:]
                vals = logp[pairs]
                # zero out pairs straddling a document boundary
                bnd = ends[:-1] - 1
                bnd = bnd[(bnd >= 0) & (bnd < len(vals))]
                vals[bnd] = 0.0
                ps = np.concatenate([[0.0], np.cumsum(vals)])
                npair = np.maximum(lens - 1, 0)
                lo = np.minimum(starts, len(vals))
                hi = np.minimum(starts + npair, len(vals))
                tot = ps[hi] - ps[lo]
                out = np.where(npair > 0, -tot / np.maximum(npair, 1), 0.0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "lm_bits": pa.array(out, pa.float64()),
        })


def char_lm_score(ds: rd.Dataset, *, train_mod: int = 50,
                  alpha: float = 0.5, text_col: str = "text",
                  id_col: str = "doc_id",
                  concurrency: int | None = None,
                  approx_docs: int | None = None) -> rd.Dataset:
    """CCNet-style LM quality scoring (Wenzek et al. 2020,
    arXiv:1911.00359: language-model perplexity ranks web documents for
    filtering): train a Laplace-smoothed byte-bigram model on the
    deterministic doc_id-hash subset, then score every document's
    bits-per-byte against the broadcast model.

    Two passes over the corpus, zero corpus shuffles: pass 1 reduces to a
    ≤65,536-row count table (bounded-cardinality groupby — constant-size
    at any corpus scale); pass 2 is a task-pool map_batches against the
    ray.put model (pass concurrency=N for a fixed actor pool). The count
    materialization is bounded at 512 KB."""
    bc = BigramCounts(train_mod, text_col, id_col)

    def bigram_counts(b, _c=bc):
        return _c(b)

    counts_ds = ds.map_batches(bigram_counts, batch_format="pyarrow")
    mat = np.zeros((256, 256), dtype=np.float64)
    # approx_docs (parquet footer row count from the caller) avoids an
    # extra full execution: ds.count() on a repartitioned/mapped dataset
    # is NOT metadata-only (memory: approx_docs pattern)
    n_docs = approx_docs if approx_docs is not None else ds.count()
    if n_docs <= 5_000_000:
        # adaptive small path: stream the ≤65,536-row sparse partials to
        # the driver and fold into the fixed 512 KB matrix — skips the
        # groupby sort barrier entirely. At corpus scale the bounded-key
        # groupby runs instead (driver folding 10^5+ partial batches would
        # not).
        flat = mat.ravel()
        for t in counts_ds.iter_batches(batch_size=None,
                                        batch_format="pyarrow"):
            np.add.at(flat,
                      t.column("pair").to_numpy(zero_copy_only=False),
                      t.column("cnt").to_numpy(zero_copy_only=False)
                      .astype(np.float64))
    else:
        tbl = counts_ds.groupby("pair").sum("cnt").to_pandas()
        if len(tbl):
            pk = tbl["pair"].to_numpy(dtype=np.int64)
            mat[pk // 256, pk % 256] = \
                tbl["sum(cnt)"].to_numpy(dtype=np.float64)
    row = mat.sum(axis=1, keepdims=True)
    logp = np.log2((mat + alpha) / (row + alpha * 256.0)).ravel()
    ref = ray.put(logp)
    if concurrency is None:
        # task pool (default): the model is 512 KB, so per-task ray.get is
        # a zero-copy local object-store fetch — autoscaling tasks beat a
        # fixed-width actor pool for this state weight (task-pool-vs-actor
        # policy: state weight decides)
        def score(batch, _ref=ref, _tc=text_col, _ic=id_col):
            return LMScore(_ref, _tc, _ic)(batch)

        return ds.map_batches(score, batch_format="pyarrow")
    return ds.map_batches(LMScore(ref, text_col, id_col),
                          batch_format="pyarrow", concurrency=concurrency)


# --------------------------------------------------------------------------
# text chunking (fixed-token overlapping windows)
# --------------------------------------------------------------------------
class ChunkText:
    """Split each document into fixed-token overlapping windows — the
    standard embedding/RAG pre-pass (and long-document training prep).
    Chunk k covers tokens [k·(max−overlap), k·(max−overlap)+max); the
    emitted text is a CHARACTER substring between the first and last
    covered token, so chunks reconstruct from the original text exactly.

    Streams per batch (one compiled-regex pass per document); only the
    chunk rows leave — no shuffle anywhere in the op."""

    TOKEN_RE = r"[A-Za-z]+|\d+|[^\w\s]"

    def __init__(self, max_tokens: int = 512, overlap: int = 64,
                 text_col: str = "text", id_col: str = "doc_id"):
        import re

        if not 0 <= overlap < max_tokens:
            raise ValueError("require 0 <= overlap < max_tokens")
        self.max_tokens = max_tokens
        self.overlap = overlap
        self.text_col = text_col
        self.id_col = id_col
        self.rx = re.compile(self.TOKEN_RE, re.ASCII)

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        ids = pc.cast(batch.column(self.id_col), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        stride = self.max_tokens - self.overlap
        o_id, o_chunk, o_text, o_n = [], [], [], []
        for doc_id, t in zip(ids, texts):
            t = t or ""
            spans = [m.span() for m in self.rx.finditer(t)]
            ntok = len(spans)
            if ntok == 0:
                o_id.append(doc_id)
                o_chunk.append(0)
                o_text.append("")
                o_n.append(0)
                continue
            k = 0
            while True:
                st = k * stride
                end = min(st + self.max_tokens, ntok)
                o_id.append(doc_id)
                o_chunk.append(k)
                o_text.append(t[spans[st][0]:spans[end - 1][1]])
                o_n.append(end - st)
                if end >= ntok:
                    break
                k += 1
        return pa.table({
            self.id_col: pa.array(o_id, pa.int64()),
            "chunk": pa.array(o_chunk, pa.int64()),
            "chunk_text": pa.array(o_text, pa.string()),
            "n_tokens": pa.array(o_n, pa.int64()),
        })


def chunk_text(ds: rd.Dataset, *, max_tokens: int = 512, overlap: int = 64,
               text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Fixed-token overlapping text chunking (see :class:`ChunkText`).

    Closed forms make the op exactly SQL-checkable per document:
    n_chunks = 1 if ntok ≤ max else 1 + ⌈(ntok − max) / (max − overlap)⌉,
    Σ chunk tokens = ntok + overlap · (n_chunks − 1)."""
    ct = ChunkText(max_tokens, overlap, text_col, id_col)

    def chunks(b, _c=ct):
        return _c(b)

    return ds.map_batches(chunks, batch_format="pyarrow")


def chunk_oracle_sql(*, max_tokens: int, overlap: int) -> str:
    """DuckDB oracle for the chunk_documents driver query: per-doc chunk
    count + token totals from the SAME RE2 regex, via the closed forms."""
    s = max_tokens - overlap
    return f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\w\\s]')) AS ntok
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN ntok <= {max_tokens} THEN 1
            ELSE 1 + CAST(ceil((ntok - {max_tokens}) / {s}.0) AS BIGINT)
       END AS BIGINT) AS n_chunks,
       CAST(ntok + {overlap} * (CASE WHEN ntok <= {max_tokens} THEN 0
            ELSE CAST(ceil((ntok - {max_tokens}) / {s}.0) AS BIGINT)
       END) AS BIGINT) AS sum_tokens
FROM t ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# DSIR — data selection with importance resampling (Xie et al. 2023,
# arXiv:2302.03169): hashed n-gram bag models for a target distribution p
# and the raw corpus q; per-document importance log-weight
# Σ_grams (log p_bucket − log q_bucket); resample by weight.
# --------------------------------------------------------------------------

# per-worker gram→bucket memo (md5 runs once per DISTINCT gram per worker;
# Zipf makes that a small fraction of total gram occurrences). Keyed by the
# bucket count so differently-sized models don't collide.
_DSIR_BUCKET_CACHE: dict = {}


def _gram_buckets(grams: pd.Series, n_buckets: int) -> np.ndarray:
    """md5-hash every gram into [0, n_buckets) — DuckDB
    ``md5_number_lower(g) % n_buckets`` exactly. Hashes distinct grams only
    (factorize) through a bounded per-worker memo."""
    codes, uniq = pd.factorize(grams.to_numpy(dtype=object))
    memo = _DSIR_BUCKET_CACHE.setdefault(n_buckets, {})
    ub = np.empty(len(uniq), dtype=np.int64)
    for i, g in enumerate(uniq):
        b = memo.get(g)
        if b is None:
            if len(memo) > 4_000_000:
                memo.clear()
            b = memo[g] = int(
                int.from_bytes(hashlib.md5(g.encode()).digest()[8:],
                               "little") % n_buckets)
        ub[i] = b
    return ub[codes] if len(codes) else np.empty(0, dtype=np.int64)


def _doc_grams(text: pd.Series) -> pd.Series:
    """Unigrams + word bigrams per row (DSIR's hashed feature set), as one
    exploded Series indexed by row position. Single-space tokenization —
    identical to DuckDB string_split."""
    uni = text.fillna("").str.split(" ").explode()
    nxt = uni.groupby(level=0).shift(-1)
    bi = (uni + " " + nxt).dropna()
    return pd.concat([uni, bi])


class _DsirBucketCounts:
    """Pass 1: per-batch hashed-gram counts for the target subset
    (doc_id % target_mod == 0) and the full raw corpus. Emits ≤ n_buckets
    narrow rows per batch — bounded-cardinality at any corpus size."""

    def __init__(self, n_buckets: int, target_mod: int,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.n_buckets = n_buckets
        self.target_mod = target_mod
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        grams = _doc_grams(batch[self.text_col])
        bkt = _gram_buckets(grams, self.n_buckets)
        ids = batch[self.id_col].to_numpy(dtype=np.int64)
        is_tgt = (ids[grams.index.to_numpy()] % self.target_mod == 0)
        r = np.bincount(bkt, minlength=self.n_buckets)
        t = np.bincount(bkt[is_tgt], minlength=self.n_buckets)
        nz = np.flatnonzero(r)
        return pd.DataFrame({
            "bucket": nz.astype(np.int64),
            "t_cnt": t[nz].astype(np.int64),
            "r_cnt": r[nz].astype(np.int64),
        })


class _DsirScore:
    """Pass 2: per-document importance log-weight against the broadcast
    log-ratio vector (ray.put once; 8·n_buckets bytes)."""

    def __init__(self, lr_ref, n_buckets: int, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.lr_ref = lr_ref
        self.n_buckets = n_buckets
        self.text_col = text_col
        self.id_col = id_col
        self._lr = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._lr is None:
            self._lr = ray.get(self.lr_ref) if isinstance(
                self.lr_ref, ray.ObjectRef) else self.lr_ref
        batch = batch.reset_index(drop=True)
        grams = _doc_grams(batch[self.text_col])
        bkt = _gram_buckets(grams, self.n_buckets)
        rows = grams.index.to_numpy()
        n = len(batch)
        lw = np.bincount(rows, weights=self._lr[bkt], minlength=n)
        ng = np.bincount(rows, minlength=n).astype(np.int64)
        return pd.DataFrame({
            self.id_col: batch[self.id_col],
            "n_grams": ng,
            "log_weight": lw.astype(np.float64),
        })


def dsir_weights(ds: rd.Dataset, *, target_mod: int = 10,
                 n_buckets: int = 4096, alpha: float = 1.0,
                 text_col: str = "text", id_col: str = "doc_id",
                 approx_docs: int | None = None) -> rd.Dataset:
    """DSIR importance log-weights for every document.

    Target distribution = the deterministic in-corpus subset
    ``doc_id % target_mod == 0`` (stand-in for the high-quality target
    corpus; production passes a real one). Raw distribution = the whole
    corpus. Both hashed-gram models are Laplace-smoothed with ``alpha``.

    100 TB shape: two streaming passes, zero corpus shuffles. Pass 1
    reduces to ≤ n_buckets (bucket, t, r) rows per batch — folded on the
    driver below 5M docs (the vector is KBs), else through a BOUNDED
    n_buckets-key groupby. Pass 2 scores against the ray.put log-ratio
    vector. Mirrors ops/curation.py char_lm_score's two-pass plan.
    """
    B = int(n_buckets)
    bc = _DsirBucketCounts(B, target_mod, text_col, id_col)

    def bucket_counts(b, _c=bc):
        return _c(b)

    counts_ds = ds.map_batches(bucket_counts, batch_format="pandas")
    t = np.zeros(B, dtype=np.float64)
    r = np.zeros(B, dtype=np.float64)
    n_docs = approx_docs if approx_docs is not None else ds.count()
    if n_docs <= 5_000_000:
        for tb in counts_ds.iter_batches(batch_size=None,
                                         batch_format="pandas"):
            np.add.at(t, tb["bucket"].to_numpy(), tb["t_cnt"].to_numpy())
            np.add.at(r, tb["bucket"].to_numpy(), tb["r_cnt"].to_numpy())
    else:
        agg = counts_ds.groupby("bucket").sum(["t_cnt", "r_cnt"]).to_pandas()
        if len(agg):
            k = agg["bucket"].to_numpy(dtype=np.int64)
            t[k] = agg["sum(t_cnt)"].to_numpy(dtype=np.float64)
            r[k] = agg["sum(r_cnt)"].to_numpy(dtype=np.float64)
    T, R = t.sum(), r.sum()
    lr = (np.log((t + alpha) / (T + alpha * B))
          - np.log((r + alpha) / (R + alpha * B)))
    ref = ray.put(lr)

    def score(b, _ref=ref, _B=B, _tc=text_col, _ic=id_col):
        return _DsirScore(_ref, _B, _tc, _ic)(b)

    return ds.map_batches(score, batch_format="pandas")


def dsir_oracle_sql(*, target_mod: int = 10, n_buckets: int = 4096,
                    alpha: float = 1.0, snap: int = 6) -> str:
    """DuckDB SQL replaying the exact DSIR pipeline (same md5 bucketing,
    same Laplace smoothing); log-weights snapped to ``snap`` decimals to
    absorb float-summation-order drift between engines."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS g FROM documents
),
bis AS (
  SELECT d.doc_id, ws[i.i] || ' ' || ws[i.i + 1] AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
       LATERAL (SELECT unnest(range(1, len(ws))) AS i) i
),
grams AS (SELECT * FROM toks UNION ALL SELECT * FROM bis),
b AS (SELECT doc_id,
             CAST(md5_number_lower(g) % {n_buckets} AS BIGINT) AS bkt
      FROM grams),
rcnt AS (SELECT bkt, count(*) AS c FROM b GROUP BY bkt),
tcnt AS (SELECT bkt, count(*) AS c FROM b
         WHERE doc_id % {target_mod} = 0 GROUP BY bkt),
tot AS (SELECT (SELECT count(*) FROM b WHERE doc_id % {target_mod} = 0)
               AS t_total,
               (SELECT count(*) FROM b) AS r_total),
lr AS (
  SELECT r.bkt,
         ln((COALESCE(t.c, 0) + {alpha}) /
            (tot.t_total + {alpha} * {n_buckets}))
       - ln((r.c + {alpha}) /
            (tot.r_total + {alpha} * {n_buckets})) AS lr
  FROM rcnt r LEFT JOIN tcnt t USING (bkt), tot
)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       ROUND(SUM(lr.lr) * 1e{snap}, 0) / 1e{snap} AS log_weight
FROM b JOIN lr USING (bkt)
GROUP BY b.doc_id
ORDER BY b.doc_id
"""


def dsir_sample(weights: rd.Dataset, k: int, *, id_col: str = "doc_id",
                weight_col: str = "log_weight") -> rd.Dataset:
    """Deterministic importance resampling: Gumbel top-k over the
    log-weights with md5-derived uniforms (the standard weighted-sampling-
    without-replacement trick) — rerun/retry/partitioning-stable, no RNG
    state. Selects the k docs with the largest log w + Gumbel(md5(id))."""

    def gumbel_key(batch: pd.DataFrame) -> pd.DataFrame:
        u = (_md5_bucket(batch[id_col], mod=2**53).astype(np.float64)
             + 0.5) / 2.0**53
        g = -np.log(-np.log(u))
        out = batch[[id_col, weight_col]].copy()
        out["__gk"] = batch[weight_col].to_numpy() + g
        return out

    keyed = weights.map_batches(gumbel_key, batch_format="pandas")
    return keyed.sort("__gk", descending=True).limit(k) \
        .drop_columns(["__gk"])
