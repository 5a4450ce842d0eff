"""Mergeable sketches for web-scale aggregation.

HyperLogLog (Flajolet et al. 2007, with the standard small-range
correction) — approximate COUNT DISTINCT whose state is a fixed 2^p-byte
register array regardless of cardinality. The Ray shape: each batch folds
its values into a register array (vectorized numpy max-per-register), Ray's
aggregate merges arrays with element-wise max (commutative + idempotent ⇒
deterministic at any parallelism and safe under task retries), the driver
finalizes the estimate. Shuffle volume is 2^p bytes per batch — constant,
however many billions of rows stream through.

``approx_count_distinct(ds, col)`` → float estimate (±~1.04/√2^p ≈ 1.6%
at the default p=12).
``hll_partials(...)`` / ``HllFold`` expose the stages for composition
(e.g. per-group sketches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

DEFAULT_P = 12  # 4096 registers → ~1.6% standard error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Value-stable vectorized 64-bit hash (polars xxhash, fixed seed)."""
    import polars as pl
    import pyarrow.compute as pc

    arr = pc.cast(col, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pl.from_arrow(arr).hash(seed=1337).to_numpy().astype(np.uint64)


def fold_batch(col, p: int = DEFAULT_P,
               registers: np.ndarray | None = None) -> np.ndarray:
    """Fold one column's values into an HLL register array (uint8[2^p])."""
    import pyarrow.compute as pc

    m = 1 << p
    if registers is None:
        registers = np.zeros(m, dtype=np.uint8)
    valid = pc.is_valid(col)
    if isinstance(valid, pa.ChunkedArray):
        valid = valid.combine_chunks()
    col = col.filter(valid) if not np.all(
        valid.to_numpy(zero_copy_only=False)) else col
    if len(col) == 0:
        return registers
    h = _hash64(col)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # low p bits forced to 1 so rest is never 0 and the rank self-caps
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    hb = np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
    rank = np.clip(64 - hb, 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rank)
    return registers


def estimate(registers: np.ndarray) -> float:
    """HLL estimate with the small-range (linear counting) correction."""
    m = len(registers)
    est = _alpha(m) * m * m / np.sum(
        np.power(2.0, -registers.astype(np.float64)))
    zeros = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(est)


class HllFold:
    """map_batches stage: batch → one row carrying the batch's register
    array (the partial; fixed 2^p bytes whatever the batch holds)."""

    def __init__(self, col: str, p: int = DEFAULT_P):
        self.col = col
        self.p = p

    def __call__(self, t: pa.Table) -> pa.Table:
        regs = fold_batch(t.column(self.col), self.p)
        return pa.table({
            "__hll": pa.array([regs.tobytes()], type=pa.binary()),
        })


# ------------------------------------------------------------ heavy hitters
class TopKFold:
    """Misra–Gries heavy-hitters partial per batch: exact counts within the
    batch truncated to the top ``capacity`` entries plus the truncated
    mass. Merged summaries keep the Misra–Gries guarantee: any value with
    global frequency > N/capacity survives, and reported counts
    undercount by at most the merged truncated mass (tracked in
    ``__mg_dropped`` for an error bound)."""

    def __init__(self, col: str, capacity: int = 1024):
        self.col = col
        self.capacity = capacity

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(pc.cast(t.column(self.col), pa.string()))
        vals = vc.field("values").to_pylist()
        counts = np.asarray(vc.field("counts").to_pylist(), dtype=np.int64)
        order = np.argsort(-counts, kind="stable")[:self.capacity]
        dropped = int(counts.sum() - counts[order].sum())
        return pa.table({
            "__mg_val": pa.array([vals[i] for i in order], type=pa.string()),
            "__mg_cnt": pa.array(counts[order], type=pa.int64()),
            "__mg_dropped": pa.array(
                [dropped] + [0] * (len(order) - 1) if len(order) else [],
                type=pa.int64()),
        })


def approx_top_k(ds: rd.Dataset, col: str, k: int = 20, *,
                 capacity: int = 1024) -> "tuple[list, int]":
    """Approximate top-k values of a column.

    Per-batch truncated count summaries (≤ capacity rows per batch —
    constant shuffle volume) merge on the driver; returns
    ``([(value, min_count), ...], max_undercount)`` — true counts lie in
    [min_count, min_count + max_undercount]. Exact whenever per-batch
    cardinality ≤ capacity."""
    partials = ds.map_batches(TopKFold(col, capacity),
                              batch_format="pyarrow")
    acc: dict = {}
    dropped = 0
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        for v, c in zip(b.column("__mg_val").to_pylist(),
                        b.column("__mg_cnt").to_pylist()):
            acc[v] = acc.get(v, 0) + c
        dropped += int(np.sum(b.column("__mg_dropped").to_numpy(
            zero_copy_only=False))) if len(b) else 0
    top = sorted(acc.items(), key=lambda kv: (-kv[1], str(kv[0])))[:k]
    return top, dropped


def approx_count_distinct(ds: rd.Dataset, col: str,
                          p: int = DEFAULT_P) -> float:
    """Streaming approximate COUNT DISTINCT: constant-size partials, one
    element-wise-max merge on the driver (partial count = #batches)."""
    partials = ds.map_batches(HllFold(col, p), batch_format="pyarrow")
    acc = np.zeros(1 << p, dtype=np.uint8)
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in b.column("__hll").to_pylist():
            np.maximum(acc, np.frombuffer(blob, dtype=np.uint8), out=acc)
    return estimate(acc)


# ------------------------------------------------- quantile summary sketch
QSKETCH_K = 512  # grid points per partial summary (4 KB of float64)


def quantile_fold(col) -> bytes:
    """Per-batch mergeable quantile summary: ``<count><k order statistics>``.

    The k points are order statistics at evenly spaced ranks, so each
    point stands for ≤ n/k rows — rank error of the summary is ≤ n/k.
    Partials concatenate under merge (exact until finalize), so the
    combined estimate's rank error is ≤ N/k (~0.2% at k=512) regardless
    of how many partials merge or in what order (deterministic)."""
    import struct

    x = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.float64)
    x = x[~np.isnan(x)]
    n = len(x)
    if n == 0:
        return struct.pack("<q", 0)
    x = np.sort(x)
    if n > QSKETCH_K:
        idx = np.round(np.linspace(0, n - 1, QSKETCH_K)).astype(np.int64)
        x = x[idx]
    return struct.pack("<q", n) + x.tobytes()


def quantile_estimate(blobs: list[bytes], p: float) -> float | None:
    """Weighted quantile over concatenated summaries: each summary's
    points carry weight n_i/k_i; the p-quantile is the first point whose
    cumulative weight reaches p·N."""
    import struct

    vals, wts = [], []
    total = 0
    for blob in blobs:
        if blob is None:
            continue
        (n,) = struct.unpack_from("<q", blob, 0)
        if n == 0:
            continue
        pts = np.frombuffer(blob, dtype=np.float64, offset=8)
        vals.append(pts)
        wts.append(np.full(len(pts), n / len(pts)))
        total += n
    if total == 0:
        return None
    v = np.concatenate(vals)
    w = np.concatenate(wts)
    order = np.argsort(v, kind="stable")
    cum = np.cumsum(w[order])
    j = int(np.searchsorted(cum, p * total, side="left"))
    return float(v[order][min(j, len(v) - 1)])


def approx_quantile(ds: rd.Dataset, col: str, p: float) -> float | None:
    """Standalone approximate quantile of a Dataset column: per-batch
    summaries (4 KB each) → driver-side weighted estimate. Shuffle-free;
    at 100 TB the driver folds #batches × 4 KB, never the values."""
    partials = ds.map_batches(
        lambda t, _c=col: pa.table({"__qs": pa.array(
            [quantile_fold(t.column(_c))], type=pa.binary())}),
        batch_format="pyarrow")
    blobs = []
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        blobs.extend(b.column("__qs").to_pylist())
    return quantile_estimate(blobs, p)
