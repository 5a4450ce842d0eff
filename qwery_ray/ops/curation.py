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


def decontaminate(ds: rd.Dataset, bench_texts: pd.Series, *, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  keep_clean_rows: bool = False) -> rd.Dataset:
    """Flag (or drop) corpus documents sharing any word ``n``-gram with the
    benchmark texts. Returns per-doc contamination counts by default; with
    ``keep_clean_rows`` returns only the rows of clean documents (count 0),
    i.e. the id set of the decontaminated corpus.

    100 TB shape: the corpus streams through one actor-pool map_batches; the
    benchmark gram set is broadcast once (eval sets are small by nature).
    """
    bench_ref = ray.put(benchmark_ngrams(bench_texts, n))
    counts = ds.map_batches(
        ContaminationCount, batch_format="pandas",
        fn_constructor_args=(bench_ref,),
        fn_constructor_kwargs={"n": n, "text_col": text_col,
                               "id_col": id_col},
        concurrency=(1, 8))
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
