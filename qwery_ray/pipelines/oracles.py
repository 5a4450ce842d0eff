"""Generated DuckDB oracle SQL for the non-trivial training-data ops.

These recompute the op bit-for-bit in ANSI SQL so the driver's value-hash
compare can gate them (see __ray_entry__.oracle_sql):

- text_quality: mirrors TextStats → QualityScore → LangId (regex token
  counts, ratio thresholds with identical int/int double division, argmax-
  first language pick over the same stopword tables).
- simhash: per-word hash is DuckDB's md5_number_lower (the Python op uses
  the same low-8-bytes-little-endian MD5 — see ops.dedup._word_hash64);
  the 64-bit majority vote is expanded into one SUM term per bit.
"""

from __future__ import annotations

from ..ops.text import _LANG_STOPWORDS


def _lst(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang])) + "]"


def text_quality_oracle() -> str:
    langs = list(_LANG_STOPWORDS)
    score_defs = ",\n    ".join(
        f"CASE WHEN len(lang_words) = 0 THEN 0.0 ELSE "
        f"len(list_filter(lang_words, w -> list_contains({_lst(l)}, w)))"
        f" / len(lang_words) END AS s_{l}"
        for l in langs)
    # argmax-first chain: the first language whose score ≥ all later scores
    # is the first occurrence of the maximum (matches np.argmax)
    chain = " ".join(
        ("WHEN " + " AND ".join(f"s_{l} >= s_{o}" for o in langs[i + 1:]) +
         f" THEN '{l}'") if i < len(langs) - 1 else f"ELSE '{l}'"
        for i, l in enumerate(langs))
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    return f"""
WITH base AS (
  SELECT doc_id,
    len(regexp_extract_all(COALESCE(text,''), '[A-Za-z]+|[0-9]+|[^\\w\\s]')) AS n_tokens_i,
    len(regexp_extract_all(COALESCE(text,''), '[A-Za-z]+')) AS n_words,
    length(COALESCE(text,'')) AS n_chars,
    len(regexp_extract_all(COALESCE(text,''), '[^\\w\\s]')) AS n_punct,
    len(regexp_extract_all(COALESCE(text,''), '[A-Za-z]')) AS n_alpha,
    regexp_extract_all(lower(COALESCE(text,'')), '[a-z]+') AS stats_words,
    regexp_extract_all(lower(COALESCE(text,'')), '[a-zàâäçéèêëîïôöùûüñ]+') AS lang_words
  FROM documents
), scored AS (
  SELECT doc_id, n_tokens_i, n_words, n_chars,
    n_punct / greatest(n_chars, 1) AS punct_ratio,
    n_alpha / greatest(n_chars, 1) AS alpha_ratio,
    len(list_filter(stats_words, w -> list_contains({_lst('en')}, w)))
      / greatest(len(stats_words), 1) AS stopword_ratio,
    {score_defs},
    len(lang_words) AS n_lang_words
  FROM base
)
SELECT doc_id,
  CAST(n_tokens_i AS BIGINT) AS n_tokens,
  0.25::DOUBLE * CAST(n_words >= 5 AND n_chars <= 100000 AS INT)
  + 0.25::DOUBLE * CAST(punct_ratio < 0.3 AS INT)
  + 0.25::DOUBLE * CAST(alpha_ratio > 0.5 AS INT)
  + 0.25::DOUBLE * CAST(stopword_ratio > 0.05 AS INT) AS quality_score,
  CASE WHEN n_lang_words = 0 THEN 'und'
       WHEN {best} < 0.03 THEN 'und'
       {chain} END AS lang_pred
FROM scored
"""


def simhash_oracle() -> str:
    terms = "\n    + ".join(
        f"(CASE WHEN SUM(cnt * (CASE WHEN (h >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN {1 << b}::UBIGINT "
        f"ELSE 0::UBIGINT END)"
        for b in range(64))
    return f"""
WITH words AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(COALESCE(text,'')), '[a-z0-9]+')) AS w
  FROM documents
), wc AS (
  SELECT doc_id, w, COUNT(*) AS cnt, md5_number_lower(w) AS h
  FROM words GROUP BY doc_id, w
), sigs AS (
  SELECT doc_id, {terms} AS sig FROM wc GROUP BY doc_id
)
SELECT d.doc_id,
       lower(lpad(to_hex(COALESCE(s.sig, 0::UBIGINT)), 16, '0')) AS simhash_hex
FROM documents d LEFT JOIN sigs s ON d.doc_id = s.doc_id
"""
