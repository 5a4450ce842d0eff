"""Sequence packing (pack_sequences) and char-bigram LM scoring
(char_lm_score) — independent naive references + invariants.

Both are training-data ops beyond the reference surface (SURVEY.md §2
training-data mandate): packing is T5-style fixed-window assembly
(arXiv:1910.10683 §3.1.2), LM scoring is the CCNet perplexity filter
(arXiv:1911.00359). Neither is SQL-expressible, so the gates here are the
authority: a pure-python reimplementation must agree bit-for-bit, and the
result must be invariant to block layout (repartition)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from conftest import SF_TINY, to_pandas

TOKEN_RE = r"[A-Za-z]+|\d+|[^\w\s]"


def _naive_chunks(docs, capacity):
    """(doc_id, chunk, n_tokens) rows, long docs split."""
    import re

    rx = re.compile(TOKEN_RE)
    rows = []
    for doc_id, text in docs:
        n = len(rx.findall(text or ""))
        reps = max(1, math.ceil(n / capacity))
        for c in range(reps):
            size = capacity if c < reps - 1 else n - (reps - 1) * capacity
            rows.append((doc_id, c, size))
    return rows


def _naive_pack(rows, capacity):
    """Best-fit-decreasing, ties to the smallest remaining capacity."""
    import bisect

    rows = sorted(rows, key=lambda r: (-r[2], r[0], r[1]))
    rems = []
    nxt = 0
    out = {}
    for doc_id, chunk, t in rows:
        j = bisect.bisect_left(rems, (t,))
        if j == len(rems):
            b, rem = nxt, capacity - t
            nxt += 1
        else:
            r0, b = rems.pop(j)
            rem = r0 - t
        bisect.insort(rems, (rem, b))
        out[(doc_id, chunk)] = b
    return out


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF_TINY}/documents.parquet",
                           columns=["doc_id", "text"])


class TestPackSequences:
    CAP = 64

    def test_matches_naive_reference(self, ray_session, docs_ds):
        import pyarrow.parquet as pq

        from qwery_ray.ops.curation import pack_sequences

        got = to_pandas(pack_sequences(
            docs_ds, capacity=self.CAP, num_shards=4))
        raw = pq.read_table(f"{SF_TINY}/documents.parquet",
                            columns=["doc_id", "text"]).to_pandas()
        chunks = _naive_chunks(
            list(zip(raw["doc_id"], raw["text"])), self.CAP)
        # per-shard naive pack must agree exactly
        for shard in sorted(got["shard"].unique()):
            mine = got[got["shard"] == shard]
            want = _naive_pack(
                [r for r in chunks if r[0] % 4 == shard], self.CAP)
            assign = dict(zip(zip(mine["doc_id"], mine["chunk"]),
                              mine["bin"]))
            assert assign == want

    def test_invariants(self, ray_session, docs_ds):
        from qwery_ray.ops.curation import pack_sequences

        got = to_pandas(pack_sequences(
            docs_ds, capacity=self.CAP, num_shards=4))
        fills = got.groupby(["shard", "bin"])["n_tokens"].sum()
        assert (fills <= self.CAP).all()
        assert (got["n_tokens"] >= 0).all()
        # every chunk of every doc packed exactly once
        assert not got.duplicated(["doc_id", "chunk"]).any()
        # BFD bound per shard
        for shard, grp in got.groupby("shard"):
            lb = math.ceil(grp["n_tokens"].sum() / self.CAP)
            assert grp["bin"].nunique() <= math.ceil(11 * lb / 9) + 1

    def test_block_layout_invariance(self, ray_session, docs_ds):
        from qwery_ray.ops.curation import pack_sequences

        a = to_pandas(pack_sequences(
            docs_ds, capacity=self.CAP, num_shards=4)) \
            .sort_values(["shard", "bin", "doc_id", "chunk"],
                         ignore_index=True)
        b = to_pandas(pack_sequences(
            docs_ds.repartition(7), capacity=self.CAP, num_shards=4)) \
            .sort_values(["shard", "bin", "doc_id", "chunk"],
                         ignore_index=True)
        pd.testing.assert_frame_equal(a, b)


class TestCharLMScore:
    def _naive(self, raw, train_mod=50, alpha=0.5):
        mat = np.zeros((256, 256))
        for _, r in raw.iterrows():
            if r["doc_id"] % train_mod:
                continue
            b = np.frombuffer((r["text"] or "").encode(), dtype=np.uint8)
            for i in range(len(b) - 1):
                mat[b[i], b[i + 1]] += 1
        logp = np.log2((mat + alpha)
                       / (mat.sum(axis=1, keepdims=True) + alpha * 256))
        out = {}
        for _, r in raw.iterrows():
            b = np.frombuffer((r["text"] or "").encode(), dtype=np.uint8)
            if len(b) < 2:
                out[r["doc_id"]] = 0.0
                continue
            pairs = b[:-1].astype(np.int32) * 256 + b[1:]
            out[r["doc_id"]] = -logp.ravel()[pairs].mean()
        return out

    def test_matches_naive_reference(self, ray_session, docs_ds):
        import pyarrow.parquet as pq

        from qwery_ray.ops.curation import char_lm_score

        got = to_pandas(char_lm_score(docs_ds, train_mod=50, concurrency=2))
        raw = pq.read_table(f"{SF_TINY}/documents.parquet",
                            columns=["doc_id", "text"]).to_pandas()
        want = self._naive(raw)
        mine = dict(zip(got["doc_id"], got["lm_bits"]))
        assert set(mine) == set(want)
        for k in want:
            assert abs(mine[k] - want[k]) < 1e-9, k

    def test_layout_invariance_and_ordering(self, ray_session, docs_ds):
        from qwery_ray.ops.curation import char_lm_score

        a = to_pandas(char_lm_score(docs_ds, concurrency=2)) \
            .sort_values("doc_id", ignore_index=True)
        b = to_pandas(char_lm_score(docs_ds.repartition(5), concurrency=2)) \
            .sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)
        # garbage-like uniform-random text should score worse than the
        # corpus's own modal text: sanity that the score discriminates
        assert a["lm_bits"].std() > 0


class TestChunkText:
    """chunk_text: fixed-token overlapping windows with exact closed-form
    counts (driver query chunk_documents carries the full SQL oracle); the
    gates here check the actual chunk TEXTS against a naive reference and
    the coverage/overlap invariants."""

    MAX, OVER = 32, 8

    def _naive(self, text, max_tokens, overlap):
        import re

        rx = re.compile(r"[A-Za-z]+|\d+|[^\w\s]")
        spans = [m.span() for m in rx.finditer(text or "")]
        if not spans:
            return [("", 0)]
        out = []
        stride = max_tokens - overlap
        k = 0
        while True:
            st = k * stride
            end = min(st + max_tokens, len(spans))
            out.append((text[spans[st][0]:spans[end - 1][1]], end - st))
            if end >= len(spans):
                break
            k += 1
        return out

    def test_matches_naive_reference(self, ray_session, docs_ds):
        import pyarrow.parquet as pq

        from qwery_ray.ops.curation import chunk_text

        got = to_pandas(chunk_text(docs_ds, max_tokens=self.MAX,
                                   overlap=self.OVER))
        raw = pq.read_table(f"{SF_TINY}/documents.parquet",
                            columns=["doc_id", "text"]).to_pandas()
        want = {r["doc_id"]: self._naive(r["text"], self.MAX, self.OVER)
                for _, r in raw.iterrows()}
        for doc_id, grp in got.groupby("doc_id"):
            grp = grp.sort_values("chunk")
            exp = want[doc_id]
            assert len(grp) == len(exp), doc_id
            assert grp["chunk_text"].tolist() == [t for t, _ in exp]
            assert grp["n_tokens"].tolist() == [n for _, n in exp]

    def test_invariants_and_layout_invariance(self, ray_session, docs_ds):
        import pandas as pd

        from qwery_ray.ops.curation import chunk_text

        a = to_pandas(chunk_text(docs_ds, max_tokens=self.MAX,
                                 overlap=self.OVER)) \
            .sort_values(["doc_id", "chunk"], ignore_index=True)
        b = to_pandas(chunk_text(docs_ds.repartition(7),
                                 max_tokens=self.MAX, overlap=self.OVER)) \
            .sort_values(["doc_id", "chunk"], ignore_index=True)
        pd.testing.assert_frame_equal(a, b)
        assert (a["n_tokens"] <= self.MAX).all()
        # every non-final chunk is full; chunk ids are dense from 0
        for _, grp in a.groupby("doc_id"):
            assert grp["chunk"].tolist() == list(range(len(grp)))
            assert (grp["n_tokens"].iloc[:-1] == self.MAX).all()
