"""End-to-end training-data preparation pipeline.

The canonical composition of this repo's operator family, streaming a
document corpus through (all lazily, one Ray Data pipeline per stage
group, no driver materialization of content):

    read_parquet(columns pruned)
      → Redact                (PII scrubbing, actor pool)
      → TextAnalyzer          (stats + quality + language, actor pool)
      → quality/lang filter   (vectorized mask)
      → exact_dedup           (narrow (sha,id) shuffle, content in place)
      → minhash_lsh_candidates → verify_jaccard → drop near-dup losers
      → token totals (n_tokens from the analyzer pass)
      → write_parquet(out_dir)  # partitioned files → resumable consumers

Returns a stats dict (rows in/out, drops per stage, token totals).
At 100 TB every stage keeps its documented scale shape — the only
driver-side values are counts and the near-dup LOSER id set (bounded by
the candidate pairs, not the corpus)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data as rd


def prepare_training_data(src: str, out_dir: str, *,
                          min_quality: float = 0.5,
                          keep_langs: Optional[set] = None,
                          jaccard_threshold: float = 0.85,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> dict:
    import ray

    from ..ops.dedup import exact_dedup, minhash_lsh_candidates, \
        verify_jaccard
    from ..ops.text import Redact, TextAnalyzer

    stats: dict = {}
    ds = rd.read_parquet(src)
    stats["rows_in"] = ds.count()

    # PII scrubbing + quality/language annotation: instances on task pools —
    # the per-stage state (compiled regexes, stopword sets) pickles in
    # microseconds, so actor spin-up would cost more than it amortizes
    ds = ds.map_batches(Redact(text_col), batch_format="pandas")

    def swap_redacted(t: pa.Table) -> pa.Table:
        i = t.column_names.index(text_col)
        t = t.set_column(i, text_col, t.column("text_redacted"))
        return t.drop_columns(["text_redacted", "redacted_delta"])

    ds = ds.map_batches(swap_redacted, batch_format="pyarrow")
    ds = ds.map_batches(TextAnalyzer(text_col), batch_format="pandas")

    keep_langs = keep_langs or {"en"}

    def quality_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.greater_equal(t.column("quality_score"), min_quality),
            pc.is_in(t.column("lang_pred"),
                     value_set=pa.array(sorted(keep_langs))))
        return t.filter(mask)

    ds = ds.map_batches(quality_filter, batch_format="pyarrow")
    ds = ds.materialize()  # barrier: dedup stages consume it twice
    stats["rows_after_quality"] = ds.count()

    # exact dedup (content never shuffles), then near-dup removal: LSH
    # candidates → jaccard verify → drop the higher id of each real pair
    ds = exact_dedup(ds, text_col=text_col, id_col=id_col).materialize()
    stats["rows_after_exact_dedup"] = ds.count()

    pairs = minhash_lsh_candidates(ds, text_col=text_col, id_col=id_col)
    verified = verify_jaccard(pairs, ds, text_col=text_col, id_col=id_col,
                              threshold=jaccard_threshold)
    vdf = verified.to_pandas()  # bounded by candidate pairs, not corpus
    losers = np.unique(vdf["id_b"].to_numpy()) if len(vdf) else \
        np.array([], dtype=np.int64)
    stats["near_dup_pairs"] = int(len(vdf))
    if len(losers):
        ref = ray.put(losers)

        def drop_near_dups(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            ls = ray.get(ref)
            pos = np.clip(np.searchsorted(ls, ids), 0, len(ls) - 1)
            return t.filter(pa.array(ls[pos] != ids))

        ds = ds.map_batches(drop_near_dups, batch_format="pyarrow")

    # n_tokens already annotated by TextAnalyzer (token_count_table is the
    # standalone variant for corpora without the analyzer pass)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)

    out = rd.read_parquet(out_dir)
    stats["rows_out"] = out.count()
    stats["total_tokens"] = int(
        out.sum("n_tokens") or 0)
    stats["out_files"] = len([f for f in os.listdir(out_dir)
                              if f.endswith(".parquet")])
    return stats
