"""Text-analysis stages for large-scale training-data pipelines.

All stages are actor-pool ``map_batches`` callables: regexes and tables are
compiled ONCE per actor in ``__init__``, per-batch work is vectorized pandas/
numpy (no per-row Python in the hot loop except where a hash digest per
document is the work itself).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# tiny built-in stopword profiles for the n-gram/stopword language heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "with", "he", "be", "on", "not", "this", "are", "at", "his"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich",
           "auf", "für", "als", "auch", "es", "an", "werden", "aus", "er"},
    "fr": {"le", "la", "les", "et", "des", "est", "un", "une", "du", "que",
           "dans", "qui", "pour", "pas", "sur", "au", "avec", "ne", "se"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "del", "que",
           "en", "por", "para", "con", "no", "se", "su", "al", "lo", "como"},
    "it": {"il", "la", "le", "e", "di", "che", "un", "una", "del", "per",
           "con", "non", "si", "su", "al", "lo", "come", "anche", "della"},
}


class TextStats:
    """Per-document statistics: token count (whitespace + BPE-ish regex),
    char count, punctuation/alpha/stopword ratios, mean word length —
    the quality-scoring signals."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # BPE-ish pre-tokenizer: word pieces OR single non-space symbols
        self.token_re = re.compile(r"[A-Za-z]+|\d+|[^\w\s]", re.ASCII)
        self.word_re = re.compile(r"[A-Za-z]+")
        self.punct_re = re.compile(r"[^\w\s]", re.ASCII)
        self.stop_en = _LANG_STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        batch["n_chars_calc"] = s.str.len().astype("int64")
        batch["n_tokens"] = s.str.count(self.token_re).astype("int64")
        batch["n_words"] = s.str.count(self.word_re).astype("int64")
        batch["punct_ratio"] = (
            s.str.count(self.punct_re) / batch["n_chars_calc"].clip(lower=1))
        alpha = s.str.count(r"[A-Za-z]")
        batch["alpha_ratio"] = alpha / batch["n_chars_calc"].clip(lower=1)
        words = s.str.lower().str.findall(self.word_re)
        # vectorized stopword ratio: explode word lists once, boolean isin,
        # per-row sum — identical to sum(w in set)/max(1,len) (int/int
        # division of the same integers ⇒ identical doubles)
        n_w = words.str.len()
        hits = words.explode().isin(self.stop_en).groupby(level=0).sum()
        batch["stopword_ratio"] = (
            hits.reindex(words.index, fill_value=0) / n_w.clip(lower=1))
        # mean word length ≡ total letters / word count (words are [A-Za-z]+
        # runs, so their combined length IS the alpha count) — vectorized
        batch["mean_word_len"] = np.where(
            batch["n_words"] > 0,
            alpha / batch["n_words"].clip(lower=1), 0.0)
        return batch


class QualityScore:
    """Composite quality score in [0,1] from TextStats signals — the
    quality-filter stage of a data pipeline. Deterministic, documented
    weights so the oracle can reproduce it."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        length_ok = ((batch["n_words"] >= 5) & (batch["n_chars_calc"] <= 100_000)) \
            .astype(float)
        punct_ok = (batch["punct_ratio"] < 0.3).astype(float)
        alpha_ok = (batch["alpha_ratio"] > 0.5).astype(float)
        stop_ok = (batch["stopword_ratio"] > 0.05).astype(float)
        batch["quality_score"] = (
            0.25 * length_ok + 0.25 * punct_ok + 0.25 * alpha_ok + 0.25 * stop_ok)
        return batch


class LangId:
    """Stopword-profile language ID heuristic (n-gram class). Emits the
    arg-max language and its score; 'und' when nothing matches."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zàâäçéèêëîïôöùûüñ]+")
        self.langs = list(_LANG_STOPWORDS)
        self.tables = [_LANG_STOPWORDS[lang] for lang in self.langs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        words = batch[self.text_col].fillna("").str.lower().str.findall(self.word_re)
        # vectorized: explode words once, one isin pass per language table,
        # argmax-first across the score matrix (same int/int divisions and
        # first-max pick as the scalar classify — bit-identical results)
        n_w = words.str.len().to_numpy()
        ex = words.explode()
        scores = np.zeros((len(self.langs), len(batch)))
        denom = np.maximum(n_w, 1)
        for li, table in enumerate(self.tables):
            hits = ex.isin(table).groupby(level=0).sum()                 .reindex(words.index, fill_value=0).to_numpy()
            scores[li] = hits / denom
        best = np.argmax(scores, axis=0)  # first max, matching np.argmax
        best_score = scores[best, np.arange(len(batch))]
        pred = np.array(self.langs, dtype=object)[best]
        und = (n_w == 0) | (best_score < 0.03)
        pred[und] = "und"
        batch["lang_pred"] = pred
        batch["lang_score"] = np.where(n_w == 0, 0.0, best_score)
        return batch


class Fingerprint:
    """Document fingerprint: 64-bit rolling-hash (Rabin–Karp over byte
    k-grams) minimum, hex-encoded — an order-invariant near-dup signal and
    the cheap 'document sketch' primitive."""

    BASE = np.uint64(257)
    MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

    def __init__(self, text_col: str = "text", k: int = 8):
        self.text_col = text_col
        self.k = k
        self.powk = self.BASE ** np.uint64(k - 1)

    def _min_rolling(self, data: bytes) -> int:
        if len(data) < self.k:
            data = data + b"\x00" * (self.k - len(data))
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        k = self.k
        # vectorized rolling polynomial hash via cumulative powers
        n = len(arr) - k + 1
        weights = self.BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(arr, k)
        hashes = (windows * weights).sum(axis=1, dtype=np.uint64)
        return int(hashes.min()) if n > 0 else 0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = [
            format(self._min_rolling((t or "").encode("utf-8", "ignore")), "016x")
            for t in batch[self.text_col]
        ]
        return batch


class TextAnalyzer:
    """Fused TextStats → QualityScore → LangId in one actor-pool stage: one
    pandas pass per batch, one pool to size (chaining three pools over-reserves
    CPUs and can starve the read stage on small clusters)."""

    def __init__(self, text_col: str = "text"):
        self.stats = TextStats(text_col)
        self.quality = QualityScore()
        self.langid = LangId(text_col)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return self.langid(self.quality(self.stats(batch)))


def token_count_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Standalone vectorized token-count (whitespace + symbol regex) used by
    the oracle-checked query."""
    import pyarrow.compute as pc

    tokens = pc.count_substring_regex(
        pc.cast(batch.column(text_col), pa.string()), r"[A-Za-z]+|\d+|[^\w\s]")
    return batch.append_column("n_tokens", pc.cast(tokens, pa.int64()))


class Redact:
    """PII scrubbing stage: emails, international-ish phone numbers and
    IPv4 addresses replaced with typed placeholder tags — the standard
    pre-training redaction pass. Patterns are RE2-compatible so the DuckDB
    oracle applies the IDENTICAL regexes via regexp_replace (bit-exact
    gate). Compiled once per actor; applied via vectorized str.replace."""

    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    PHONE = r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}"
    IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

    def __init__(self, text_col: str = "text", out_col: str = "text_redacted"):
        self.text_col = text_col
        self.out_col = out_col
        self.email_re = re.compile(self.EMAIL)
        self.phone_re = re.compile(self.PHONE)
        self.ipv4_re = re.compile(self.IPV4)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        s = s.str.replace(self.email_re, "[EMAIL]", regex=True)
        s = s.str.replace(self.ipv4_re, "[IP]", regex=True)
        s = s.str.replace(self.phone_re, "[PHONE]", regex=True)
        batch[self.out_col] = s
        n = (batch[self.text_col].fillna("").str.len()
             - batch[self.out_col].str.len())
        batch["redacted_delta"] = n.astype("int64")
        return batch


def redact_oracle_sql() -> str:
    """DuckDB oracle applying the same regex chain in the same order."""
    return f"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(COALESCE(text, ''),
      '{Redact.EMAIL}', '[EMAIL]', 'g'),
      '{Redact.IPV4}', '[IP]', 'g'),
      '{Redact.PHONE}', '[PHONE]', 'g') AS text_redacted
FROM documents
"""
