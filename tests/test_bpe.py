"""BPE tokenizer training + encoding (ops/bpe.py).

Gated against an INDEPENDENT naive reference (full pair recount per
iteration — the textbook Sennrich 2016 algorithm) and by structural
invariants: joining a word's tokens must reconstruct word + '</w>', and
every streaming stage must be batch/block-layout invariant."""

from collections import Counter

import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from conftest import SF_TINY

from qwery_ray.ops.bpe import (
    END_OF_WORD,
    BPEEncode,
    bpe_token_counts,
    encode_word,
    learn_bpe,
    train_bpe,
    word_frequencies,
)


def naive_learn(word_freqs: dict, num_merges: int):
    """Full-recount reference (independent of the incremental impl)."""
    vocab = {tuple(list(w) + [END_OF_WORD]): f
             for w, f in word_freqs.items() if w}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for p in zip(syms[:-1], syms[1:]):
                pc[p] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nv: dict = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    return merges


CORPORA = [
    ["the cat sat on the mat", "the dog sat", "low lower lowest",
     "newer news new", "the the the"],
    ["aaa aaaa aa a", "abab ababab ab", "xyz zyx xyz"],
    ["héllo wörld héllo", "naïve café café", ""],
    ["a b c d e f g h", "aa bb cc dd", "a a a a a a"],
]


class TestLearnBPE:
    @pytest.mark.parametrize("texts", CORPORA)
    def test_matches_naive_reference(self, texts):
        wf = dict(Counter(w for t in texts for w in t.split(" ") if w))
        for k in (1, 5, 25, 100):
            assert learn_bpe(wf, k) == naive_learn(wf, k)

    def test_deterministic_and_freq_order_independent(self):
        wf = dict(Counter("the cat the mat the bat".split()))
        m1 = learn_bpe(wf, 10)
        m2 = learn_bpe(dict(reversed(list(wf.items()))), 10)
        assert m1 == m2

    def test_exhausts_gracefully(self):
        # tiny vocab: more merges requested than exist
        m = learn_bpe({"ab": 2}, 100)
        assert len(m) <= 3  # a+b, ab+</w> (or b+</w> first) … then empty


class TestEncodeWord:
    def test_reconstruction_invariant(self):
        texts = CORPORA[0] + CORPORA[2]
        wf = dict(Counter(w for t in texts for w in t.split(" ") if w))
        ranks = {p: i for i, p in enumerate(learn_bpe(wf, 40))}
        for w in list(wf) + ["unseen", "zzz", "h"]:
            toks = encode_word(w, ranks)
            assert "".join(toks) == w + END_OF_WORD

    def test_fully_merged_word_is_one_token(self):
        ranks = {p: i for i, p in enumerate(learn_bpe({"aa": 10}, 10))}
        assert encode_word("aa", ranks) == ["aa" + END_OF_WORD]


class TestDistributed:
    def test_train_bpe_matches_naive_on_corpus(self, ray_session):
        texts = [r["text"] for r in
                 pq.read_table(f"{SF_TINY}/documents.parquet",
                               columns=["text"]).to_pylist()][:120]
        wf = dict(Counter(w for t in texts for w in t.split(" ") if w))
        ds = rd.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
        assert train_bpe(ds, num_merges=60) == naive_learn(wf, 60)

    def test_layout_invariance_and_counts(self, ray_session):
        texts = [r["text"] for r in
                 pq.read_table(f"{SF_TINY}/documents.parquet",
                               columns=["text"]).to_pylist()][:100]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        merges = train_bpe(rd.from_items(rows), num_merges=50)
        ranks = {p: i for i, p in enumerate(merges)}

        outs = []
        for nparts in (1, 7):
            ds = rd.from_items(rows).repartition(nparts)
            outs.append(bpe_token_counts(ds, merges).to_pandas()
                        .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])

        # per-doc counts == driver-side per-word encode
        for i, t in enumerate(texts[:20]):
            words = [w for w in t.split(" ") if w]
            want = sum(len(encode_word(w, ranks)) for w in words)
            row = outs[0][outs[0].doc_id == i].iloc[0]
            assert int(row.n_bpe_tokens) == want
            assert int(row.n_words) == len(words)

    def test_tokens_emit_mode(self, ray_session):
        import ray

        rows = [{"doc_id": 0, "text": "low lower"},
                {"doc_id": 1, "text": ""}]
        merges = learn_bpe({"low": 3, "lower": 2}, 20)
        ranks = {p: i for i, p in enumerate(merges)}
        ref = ray.put(ranks)
        enc = BPEEncode(ref, emit="tokens")
        out = rd.from_items(rows).map_batches(
            lambda b, _e=enc: _e(b), batch_format="pyarrow") \
            .to_pandas().sort_values("doc_id")
        got = list(out.tokens.iloc[0])
        assert got == encode_word("low", ranks) + encode_word("lower", ranks)
        assert list(out.tokens.iloc[1]) == []

    def test_word_frequencies_trim_deterministic(self, ray_session):
        rows = [{"doc_id": i, "text": "aa bb aa cc"} for i in range(30)]
        for nparts in (1, 5):
            wf = word_frequencies(rd.from_items(rows).repartition(nparts),
                                  max_words=2)
            assert list(wf["word"]) == ["aa", "bb"]  # count desc, word asc
            assert list(wf["cnt"]) == [60, 30]


class TestBpeForcedScalePath:
    def test_groupby_topk_path_equals_driver_fold(self, ray_session):
        # approx_docs above the 5M threshold forces the (word) groupby +
        # per-block local top-k; the trimmed model must be identical
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(
            ["the cat sat", "the dog sat sat", "cat cat the"] * 10)]
        a = word_frequencies(rd.from_items(rows), approx_docs=30)
        b = word_frequencies(rd.from_items(rows).repartition(5),
                             approx_docs=10_000_000)
        pd.testing.assert_frame_equal(a, b.reset_index(drop=True))

    def test_groupby_path_respects_max_words_and_min_count(self,
                                                           ray_session):
        rows = [{"doc_id": 0, "text": "aa aa aa bb bb cc"}]
        wf = word_frequencies(rd.from_items(rows), max_words=2,
                              min_count=2, approx_docs=10_000_000)
        assert list(wf["word"]) == ["aa", "bb"]
        assert list(wf["cnt"]) == [3, 2]
