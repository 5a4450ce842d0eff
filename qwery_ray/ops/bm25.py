"""BM25 keyword scoring over a document corpus (Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond" — public).

Distributed shape (no shuffle at any corpus size):
- PASS 1 (corpus statistics): one ``map_batches`` producing per-batch
  integer partials — document count, total document length, and per-term
  document frequency (terms are a handful of query keywords, so a partial
  row is O(#terms) ints). The driver merges O(num_blocks) partial rows;
  the corpus never moves.
- The per-term IDF and the average document length are folded into FLOAT
  LITERALS on the driver (``math.log`` once per term). That makes the
  scoring expression pure IEEE mul/div/add over per-doc integers — which
  is why the DuckDB oracle (:func:`bm25_oracle_sql`, the same literals
  spliced into SQL text) matches BIT-FOR-BIT: correctly-rounded IEEE ops
  on identical inputs in identical order are engine-independent, unlike
  a ``ln()`` evaluated separately by two different libms.
- PASS 2 (scoring): one vectorized ``map_batches`` — tf per term via the
  same compiled word-boundary regexes the oracle uses, dl = whitespace
  token count, then the BM25 sum in fixed term order.

Two passes over the corpus is the textbook trade for exact global IDF;
a production variant could snapshot stats incrementally, but each pass
is a streaming column-pruned scan.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import ray.data as rd

K1 = 1.2
B = 0.75


def _term_pattern(term: str) -> str:
    # (?a) pins Python's \b to ASCII semantics — RE2 (the DuckDB oracle's
    # engine) only has ASCII \b, and the two must count identically
    return r"(?a)\b" + re.escape(term) + r"\b"


class _CorpusStats:
    """Per-batch integer partials: (n_docs, total_dl, df per term)."""

    def __init__(self, terms: list[str], text_col: str):
        self.terms = terms
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col]
        row = {
            "n_docs": [len(t)],
            "total_dl": [int(t.str.count(r"\S+").sum())],
        }
        for i, term in enumerate(self.terms):
            row[f"df_{i}"] = [int((t.str.count(_term_pattern(term)) > 0).sum())]
        return pd.DataFrame(row)


class _Score:
    """Vectorized BM25 over one batch, IDF/avgdl baked in as constants."""

    def __init__(self, terms: list[str], idf: list[float], avgdl: float,
                 text_col: str, id_col: str):
        self.terms = terms
        self.idf = idf
        self.avgdl = avgdl
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col]
        dl = t.str.count(r"\S+").to_numpy(dtype=np.float64)
        # fixed evaluation order, mirrored exactly in bm25_oracle_sql:
        # norm = k1 * (1 - b + b * dl / avgdl)
        norm = K1 * (1.0 - B + B * dl / self.avgdl)
        score = np.zeros(len(t), dtype=np.float64)
        for term, idf in zip(self.terms, self.idf):
            tf = t.str.count(_term_pattern(term)).to_numpy(dtype=np.float64)
            score = score + idf * (tf / (tf + norm))
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "score": score,
        })


def corpus_stats(ds: rd.Dataset, terms: list[str], *,
                 text_col: str = "text") -> tuple[int, float, list[float]]:
    """Returns (n_docs, avgdl, idf per term) — one streaming pass."""
    partials = ds.map_batches(_CorpusStats(terms, text_col),
                              batch_format="pandas").take_all()
    n = sum(int(r["n_docs"]) for r in partials)
    total = sum(int(r["total_dl"]) for r in partials)
    if n == 0:
        raise ValueError("BM25 over an empty corpus")
    avgdl = total / n
    idf = []
    for i in range(len(terms)):
        df = sum(int(r[f"df_{i}"]) for r in partials)
        idf.append(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
    return n, avgdl, idf


def bm25_scores(ds: rd.Dataset, terms: list[str], *, text_col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """Score every document against the keyword set (fixed term order)."""
    _, avgdl, idf = corpus_stats(ds, terms, text_col=text_col)
    return ds.map_batches(_Score(terms, idf, avgdl, text_col, id_col),
                          batch_format="pandas")


def bm25_oracle_sql(terms: list[str]) -> str:
    """Self-contained DuckDB oracle: computes df / avgdl / IDF in SQL and
    mirrors the Python expression tree operation-for-operation. Every
    arithmetic step is a correctly-rounded IEEE double op on identical
    inputs in identical order, and DuckDB's ``ln`` and Python's
    ``math.log`` resolve to the same libm — so scores match BIT-FOR-BIT
    (asserted in tests/test_bm25.py via int64 views of the doubles)."""
    tf_cols = ",\n    ".join(
        f"CAST(len(regexp_extract_all(text, '\\b{re.escape(t)}\\b')) "
        f"AS DOUBLE) AS tf_{i}" for i, t in enumerate(terms))
    df_cols = ",\n    ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) "
        f"AS df_{i}" for i in range(len(terms)))
    score = " + ".join(
        f"ln((n - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} / (tf_{i} + norm))"
        for i in range(len(terms)))
    return f"""
WITH tf AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS dl,
    {tf_cols}
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) AS total,
         {df_cols}
  FROM tf
),
normed AS (
  SELECT tf.*, stats.*,
         {K1!r} * (1.0 - {B!r} + {B!r} * dl / (total / n)) AS norm
  FROM tf, stats
)
SELECT doc_id, {score} AS score
FROM normed
"""
