"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909 — the standard subword tokenizer of GPT-2/RoBERTa-family
pipelines).

Scale shape (the shape every production BPE trainer uses, e.g. the public
subword-nmt and HuggingFace tokenizers):

- The corpus-proportional work — word counting — is ONE streaming
  ``map_batches`` pass emitting narrow ``(word, cnt)`` partials, reduced by
  a single groupby (distinct words grow ~ O(corpus^0.5) by Heaps' law, and
  the table is trimmed to ``max_words`` with a per-block local top-k before
  the driver sees it — the driver materialization is bounded at
  ``max_words`` rows regardless of corpus size).
- The merge loop runs driver-side over that compressed word-frequency
  model with INCREMENTAL pair-count maintenance (each merge touches only
  the words that contain the pair — the textbook O(total merges × affected
  words) algorithm, not the naive full recount per iteration).
- Encoding streams: the learned merge ranks (a dict, ~KBs) are ``ray.put``
  once; each worker encodes only the DISTINCT words of its batches through
  a per-worker memo (Zipf: a few thousand distinct words cover almost all
  tokens, so the per-word Python merge loop runs once per distinct word
  per worker, not once per token).

Reference parity note: the qwery reference has no tokenizer surface — this
extends SURVEY.md §2's training-data-ops mandate (same family as
ops/curation.py pack_sequences / char_lm_score).

Tokenization is a literal single-space split (same contract as the other
curation ops) so tests and oracles are exact; production would swap in the
ops/text.py pre-tokenizer regex.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

END_OF_WORD = "</w>"


# --------------------------------------------------------------------------
# pass 1: distributed word frequencies
# --------------------------------------------------------------------------


class WordCounts:
    """Per-batch word counts: one split + explode + value_counts (C-level),
    emits narrow (word, cnt) rows."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pandas().fillna("")
        words = texts.str.split(" ").explode()
        words = words[words != ""]
        vc = words.value_counts()
        return pa.table({
            "word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
            "cnt": pa.array(vc.to_numpy(dtype=np.int64)),
        })


def word_frequencies(ds: rd.Dataset, *, text_col: str = "text",
                     max_words: int = 200_000, min_count: int = 1,
                     approx_docs: int | None = None) -> pd.DataFrame:
    """Corpus word-frequency model, bounded at ``max_words`` rows.

    One streaming pass emits narrow (word, cnt) partials. Below 5M docs
    (``approx_docs`` — a parquet footer count from the caller avoids a
    full extra execution) the partials stream to the driver and fold in a
    dict, skipping the groupby sort barrier; at corpus scale a (word)
    groupby reduces them, followed by a per-block local top-k so the
    driver never holds more than max_words × #blocks rows. Ties break on
    the lexicographically smaller word — the trimmed model is
    deterministic at any parallelism / block layout.
    """
    wc = WordCounts(text_col)

    def word_counts(b, _wc=wc):
        return _wc(b)

    parts_ds = ds.map_batches(word_counts, batch_format="pyarrow")
    n_docs = approx_docs if approx_docs is not None else ds.count()
    if n_docs <= 5_000_000:
        acc: Counter = Counter()
        for tb in parts_ds.iter_batches(batch_size=None,
                                        batch_format="pyarrow"):
            ws = tb.column("word").to_pylist()
            cs = tb.column("cnt").to_numpy(zero_copy_only=False)
            for w, c in zip(ws, cs):
                acc[w] += int(c)
        df = pd.DataFrame({"word": list(acc.keys()),
                           "cnt": np.fromiter(acc.values(), dtype=np.int64,
                                              count=len(acc))})
        df = df[df["cnt"] >= min_count]
        df = df.sort_values(["cnt", "word"], ascending=[False, True],
                            kind="stable").head(max_words)
        return df.reset_index(drop=True)

    counts = parts_ds.groupby("word").sum("cnt")

    def local_top(t: pa.Table, _k=max_words, _m=min_count) -> pa.Table:
        df = t.to_pandas()
        df = df[df["sum(cnt)"] >= _m]
        df = df.sort_values(["sum(cnt)", "word"],
                            ascending=[False, True], kind="stable").head(_k)
        return pa.table({
            "word": pa.array(df["word"].to_numpy(dtype=object), pa.string()),
            "sum(cnt)": pa.array(df["sum(cnt)"].to_numpy(dtype=np.int64)),
        })

    parts = counts.map_batches(local_top, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["sum(cnt)", "word"],
                              ascending=[False, True], kind="stable")
    out = parts.head(max_words).rename(columns={"sum(cnt)": "cnt"})
    return out.reset_index(drop=True)


# --------------------------------------------------------------------------
# driver-side merge loop (incremental pair-count maintenance)
# --------------------------------------------------------------------------


def _sym_pairs(syms: list[str]) -> Counter:
    return Counter(zip(syms[:-1], syms[1:]))


def _merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Replace every (left-to-right, non-overlapping) occurrence of the
    adjacent symbol pair with the concatenated symbol."""
    a, b = pair
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe(word_freqs, num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word-frequency model
    (dict word→count or the DataFrame from :func:`word_frequencies`).

    Deterministic: the best pair is (max count, then lexicographically
    smallest pair). Incremental: pair counts and a pair→words index are
    updated per merge, touching only affected words.
    """
    if isinstance(word_freqs, pd.DataFrame):
        items = list(zip(word_freqs["word"], word_freqs["cnt"]))
    else:
        items = sorted(word_freqs.items())
    syms_by_word: list[list[str]] = []
    freq_by_word: list[int] = []
    for w, f in items:
        if not w:
            continue
        syms_by_word.append(list(w) + [END_OF_WORD])
        freq_by_word.append(int(f))

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, syms in enumerate(syms_by_word):
        f = freq_by_word[wid]
        for p, c in _sym_pairs(syms).items():
            pair_counts[p] += c * f
            pair_words.setdefault(p, set()).add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for wid in sorted(pair_words.get(best, ())):
            syms = syms_by_word[wid]
            f = freq_by_word[wid]
            new = _merge_word(syms, best)
            old_p, new_p = _sym_pairs(syms), _sym_pairs(new)
            for p in old_p.keys() | new_p.keys():
                d = new_p.get(p, 0) - old_p.get(p, 0)
                if d:
                    pair_counts[p] += d * f
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if new_p.get(p, 0) and p != best:
                    pair_words.setdefault(p, set()).add(wid)
                elif not new_p.get(p, 0):
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(wid)
            syms_by_word[wid] = new
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the present pair
    with the LOWEST rank (the canonical greedy BPE apply of the public
    GPT-2 encoder / subword-nmt)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        pairs = set(zip(syms[:-1], syms[1:]))
        best, best_rank = None, None
        for p in pairs:
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        syms = _merge_word(syms, best)
    return syms


# --------------------------------------------------------------------------
# pass 2: streaming encode
# --------------------------------------------------------------------------

# per-worker-process memo: map_batches tasks reuse warm workers, so distinct
# words are encoded once per worker across all its batches. Keyed by the
# ObjectRef hex so a new model invalidates the cache.
_ENCODE_CACHE: dict = {}


class BPEEncode:
    """Encode documents against a broadcast merge table.

    ``emit="counts"`` → (doc_id, n_words, n_bpe_tokens) int rows (nothing
    wide leaves the stage); ``emit="tokens"`` → (doc_id, tokens list<str>).
    """

    def __init__(self, ranks_ref, *, text_col: str = "text",
                 id_col: str = "doc_id", emit: str = "counts"):
        self.ranks_ref = ranks_ref
        self.text_col = text_col
        self.id_col = id_col
        self.emit = emit
        # content-derived cache key for the local-dict path: id() can be
        # reused by a different dict after GC and serve stale tokenizations
        if not isinstance(ranks_ref, ray.ObjectRef):
            import hashlib
            h = hashlib.sha256()
            for pair, rank in sorted(ranks_ref.items()):
                h.update(repr((pair, rank)).encode())
            self._local_key = "local:" + h.hexdigest()

    def _memo(self):
        if isinstance(self.ranks_ref, ray.ObjectRef):
            key = self.ranks_ref.hex()
            ent = _ENCODE_CACHE.get(key)
            if ent is None:
                _ENCODE_CACHE.clear()
                ent = _ENCODE_CACHE[key] = (ray.get(self.ranks_ref), {})
            return ent
        ent = _ENCODE_CACHE.get(self._local_key)
        if ent is None:
            _ENCODE_CACHE.clear()
            ent = _ENCODE_CACHE[self._local_key] = (self.ranks_ref, {})
        return ent

    def __call__(self, batch: pa.Table) -> pa.Table:
        ranks, memo = self._memo()
        texts = batch.column(self.text_col).to_pandas().fillna("")
        words = texts.str.split(" ").explode()
        words = words[words != ""]
        # encode DISTINCT words only (factorize), memoized across batches
        codes, uniq = pd.factorize(words.to_numpy(dtype=object))
        tok_lists: list[list[str]] = []
        for w in uniq:
            t = memo.get(w)
            if t is None:
                if len(memo) > 2_000_000:  # bound the per-worker memo
                    memo.clear()
                t = memo[w] = encode_word(w, ranks)
            tok_lists.append(t)
        ntok_u = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                             count=len(tok_lists))
        row_of = words.index.to_numpy()  # original row position per word
        n = len(batch)
        n_words = np.bincount(row_of, minlength=n).astype(np.int64)
        n_tokens = np.bincount(
            row_of, weights=ntok_u[codes] if len(codes) else None,
            minlength=n).astype(np.int64)
        if self.emit == "counts":
            return pa.table({
                self.id_col: batch.column(self.id_col),
                "n_words": pa.array(n_words),
                "n_bpe_tokens": pa.array(n_tokens),
            })
        toks: list[list[str]] = [[] for _ in range(n)]
        for r, c in zip(row_of, codes):
            toks[r].extend(tok_lists[c])
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "tokens": pa.array(toks, pa.list_(pa.string())),
        })


def bpe_token_counts(ds: rd.Dataset, merges: list[tuple[str, str]], *,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> rd.Dataset:
    """Per-document BPE token counts under a learned merge table
    (streaming, model broadcast once)."""
    ranks = {p: i for i, p in enumerate(merges)}
    ref = ray.put(ranks)

    def encode(b, _ref=ref, _tc=text_col, _ic=id_col):
        return BPEEncode(_ref, text_col=_tc, id_col=_ic)(b)

    return ds.map_batches(encode, batch_format="pyarrow")


def train_bpe(ds: rd.Dataset, *, num_merges: int = 200,
              text_col: str = "text", max_words: int = 200_000,
              min_count: int = 1,
              approx_docs: int | None = None) -> list[tuple[str, str]]:
    """End-to-end: distributed word-frequency pass → driver merge loop."""
    wf = word_frequencies(ds, text_col=text_col, max_words=max_words,
                          min_count=min_count, approx_docs=approx_docs)
    return learn_bpe(wf, num_merges)
