"""Deterministic change-event synthesis (no external data).

Produces the binlog/WAL-style tail described in FIXTURES.md §3 over the
repo-file base table of BASELINE.json's input_hint
(repo, path, commit, lang, content): seeded, Zipf-hot repos, interleaved
upsert/delete per key, optional additive schema evolution (``size_bytes``
appears after ``evolve_after_lsn``), events written as multiple parquet
segment files out of key order (but LSN-unique) — exactly the properties the
replay tests require.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "rs", "go", "js", "java", "c", "cpp", "rb", "ts", "scala",
         "sh", "sql", "md", "yaml", "toml", "css", "html", "kt", "swift", "hs"]

_WORDS = np.array([
    "def", "fn", "let", "const", "return", "import", "class", "struct",
    "impl", "match", "if", "else", "for", "while", "async", "await",
    "lambda", "yield", "try", "except", "raise", "print", "self", "super",
])


def _commit_hex(rng: np.random.Generator, n: int) -> list[str]:
    blob = rng.integers(0, 256, n * 20, dtype=np.uint8).tobytes().hex()
    return [blob[i * 40:(i + 1) * 40] for i in range(n)]


def synth_change_events(
    out_dir: str,
    *,
    n_keys: int = 1_000,
    n_events: int = 5_000,
    seed: int = 42,
    n_segments: int = 4,
    zipf_a: float = 1.3,
    n_repos: int = 50,
    evolve_after_lsn: int | None = None,
    delete_frac: float = 0.12,
    mean_content_len: int = 400,
    hot_key_frac: float = 0.0,
) -> str:
    """Writes ``events-{i}.parquet`` segment files under out_dir; returns out_dir.

    LSNs are globally monotonic across segments; rows within a segment are
    shuffled out of key order (FIXTURES.md §3 required properties).

    ``hot_key_frac`` > 0 redirects that fraction of ALL events onto key 0
    (one pathologically hot (repo, path)) — the extreme-skew stress shape:
    the per-batch LWW combiner must collapse the hot key to one row per
    batch, so replay cost stays flat vs the uniform stream. Default 0
    leaves the historical stream byte-identical (no extra RNG draws).
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    # key universe: Zipf-distributed repos (hot-key skew per north rule)
    repo_of_key = (rng.zipf(zipf_a, n_keys) - 1) % n_repos
    repos = np.array([f"org{r // 10}/repo{r}" for r in range(n_repos)])
    key_repo = repos[repo_of_key]
    key_path = np.array([f"src/dir{k % 37}/file_{k}.{LANGS[k % len(LANGS)]}"
                         for k in range(n_keys)])

    # event stream: every key appears ≥1 time; hot keys appear many times
    key_seq = np.concatenate([
        np.arange(n_keys),
        rng.integers(0, n_keys, max(0, n_events - n_keys)),
    ])[:n_events]
    rng.shuffle(key_seq)
    if hot_key_frac > 0:
        key_seq[rng.random(n_events) < hot_key_frac] = 0

    lsn = np.arange(1, n_events + 1, dtype=np.int64)
    is_delete = rng.random(n_events) < delete_frac
    op = np.where(is_delete, "delete", "upsert")

    import pyarrow.compute as pc

    lengths = np.maximum(8, rng.poisson(mean_content_len, n_events))
    word_idx = rng.integers(0, len(_WORDS), n_events)
    commits = np.array(_commit_hex(rng, n_events))
    lang = np.array(LANGS)[rng.integers(0, len(LANGS), n_events)]
    word_lens = np.array([len(w) for w in _WORDS])
    reps = np.maximum(1, lengths // (word_lens[word_idx] + 1)).astype(np.int64)

    # content is built PER SEGMENT with Arrow kernels: C++ vectorized, and
    # bounded buffers (one giant string array would overflow 32-bit offsets
    # at ~2 GB; the numpy.char equivalents allocate multi-GB intermediates)
    seg_bounds = np.linspace(0, n_events, n_segments + 1, dtype=int)
    for i in range(n_segments):
        s, e = int(seg_bounds[i]), int(seg_bounds[i + 1])
        n = e - s
        if n == 0:
            continue
        ks = key_seq[s:e]
        header = pc.binary_join_element_wise(
            pa.array(np.full(n, "// ")), pa.array(key_repo[ks]),
            pa.array(np.full(n, ":")), pa.array(key_path[ks]),
            pa.array(np.full(n, "@")),
            pc.cast(pa.array(lsn[s:e]), pa.string()),
            pa.array(np.full(n, "\n")), "")
        body = pc.binary_repeat(
            pc.binary_join_element_wise(
                pa.array(_WORDS[word_idx[s:e]]),
                pa.array(np.full(n, " ")), ""),
            pa.array(reps[s:e]))
        full = pc.binary_join_element_wise(header, body, "")
        content = pc.if_else(pa.array(is_delete[s:e]),
                             pa.scalar(None, pa.string()), full)
        cols = {
            "lsn": pa.array(lsn[s:e]),
            "op": pa.array(op[s:e].tolist()),
            "repo": pa.array(key_repo[ks].tolist()),
            "path": pa.array(key_path[ks].tolist()),
            "commit": pa.array(commits[s:e].tolist()),
            "lang": pa.array(lang[s:e].tolist()),
            "content": content,
        }
        seg = pa.table(cols)
        if evolve_after_lsn is not None:
            # additive schema evolution: size_bytes appears mid-stream
            sizes = pc.cast(pc.utf8_length(full), pa.int64())
            mask = pa.array(is_delete[s:e] | (lsn[s:e] <= evolve_after_lsn))
            size = pc.if_else(mask, pa.scalar(None, pa.int64()), sizes)
            seg = seg.append_column("size_bytes", size)
        # rows shuffled within a segment (out of key order, LSN-unique)
        perm = rng.permutation(len(seg))
        seg = seg.take(pa.array(perm))
        pq.write_table(seg, os.path.join(out_dir, f"events-{i:04d}.parquet"))
    return out_dir


def events_from_documents_sql() -> str:
    """DuckDB SQL that derives a deterministic change-event stream from the
    driver's ``documents`` table and computes the final lake state — the
    oracle for the ``cdc_replay`` driver query (see __ray_entry__.py)."""
    return """
WITH ev AS (
  SELECT
    'r' || CAST(d.doc_id % 50 AS VARCHAR) AS repo,
    'p' || CAST(d.doc_id AS VARCHAR)      AS path,
    d.doc_id * 4 + v.v                    AS lsn,
    CASE WHEN (d.doc_id + v.v) % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op,
    d.text || '-v' || CAST(v.v AS VARCHAR) AS content
  FROM documents d
  JOIN (SELECT CAST(range AS BIGINT) AS v FROM range(3)) v
    ON v.v < 1 + d.doc_id % 3
),
latest AS (
  SELECT repo, path, MAX(lsn) AS lsn FROM ev GROUP BY repo, path
)
SELECT e.repo, e.path, e.lsn, e.content
FROM ev e
JOIN latest m ON e.repo = m.repo AND e.path = m.path AND e.lsn = m.lsn
WHERE e.op = 'upsert'
"""


def events_from_documents_batch(batch: pa.Table) -> pa.Table:
    """Ray-side twin of events_from_documents_sql: expands each document row
    into its versioned change events (vectorized, no Python row loop)."""
    import pyarrow.compute as pc

    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    n_versions = 1 + (doc_id % 3)
    idx = np.repeat(np.arange(len(batch)), n_versions)
    v = np.concatenate([np.arange(k) for k in n_versions]) if len(batch) else \
        np.array([], dtype=np.int64)
    d = doc_id[idx]
    text = pc.cast(batch.column("text"), pa.string()).take(pa.array(idx))
    content = pc.binary_join_element_wise(
        text, pa.array(["-v"] * len(d)), pa.array(v.astype(str)), "")
    return pa.table({
        "repo": pa.array(np.char.add("r", (d % 50).astype(str))),
        "path": pa.array(np.char.add("p", d.astype(str))),
        "lsn": pa.array(d * 4 + v, type=pa.int64()),
        "op": pa.array(np.where((d + v) % 7 == 0, "delete", "upsert").tolist()),
        "content": content,
    })
