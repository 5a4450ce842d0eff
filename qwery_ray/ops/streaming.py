"""Event-time streaming window aggregation with watermarks.

Incremental tumbling/sliding windows over an LSN-ordered event stream
(the CDC tail — ``CDCLakeEngine.follow()`` / any registered ``EventTail``),
following the public Dataflow model (Akidau et al., VLDB 2015: event-time
windows + watermark-gated emission + allowed lateness) — the semantics of
Flink/Beam event-time windowing, re-expressed over Ray Data:

- Each ingested chunk (one tail transaction) is combined DISTRIBUTED: the
  existing per-batch combiner (:class:`ops.windows.SlidingWindowPartial`)
  reduces events to one (window, count, cent-sum) row per window per batch,
  so only narrow integer partials reach the driver-held state — never
  events. State size is bounded by the number of OPEN windows
  (≈ (lateness + width) / slide per active time range), independent of
  stream length.
- The watermark is ``max event-time seen − allowed lateness``. A window
  [w, w+width) FINALIZES exactly once, when ``watermark ≥ w + width``;
  its row is emitted and its state dropped. Contributions that arrive for
  an already-finalized window are counted in ``late_dropped`` (per
  window-contribution), never re-emitted — the exactly-once contract.
- ``checkpoint()`` / ``restore()`` persist the open-window state atomically
  (tmp + rename), so a killed stream resumes without double emission —
  the same watermark+resume discipline as the lake replay
  (cdc/engine.py).

With ``lateness_sec=inf`` (never finalize early) the concatenation of all
emissions + ``flush()`` equals the batch :func:`ops.windows.sliding_window_agg`
over the full stream — the equivalence the tests and the SQL oracle gate.

Money values accumulate as integer cents (exact, bit-stable at any
parallelism / chunking), matching the batch op's contract.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .windows import SlidingWindowPartial


def _empty_out() -> pa.Table:
    return pa.table({
        "window_start_sec": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "total_value": pa.array([], pa.float64()),
    })


class StreamingWindowAggregator:
    """Stateful event-time window aggregator (driver-held narrow state,
    distributed per-chunk combine). One instance per stream; feed it
    transactions in LSN order via :meth:`ingest`."""

    def __init__(self, *, width_sec: int = 3600,
                 slide_sec: int | None = None,
                 lateness_sec: float = 0.0,
                 ts_col: str = "ts", value_col: str = "value"):
        slide_sec = width_sec if slide_sec is None else slide_sec
        if width_sec % slide_sec != 0:
            raise ValueError("width_sec must be a multiple of slide_sec")
        self.width = int(width_sec)
        self.slide = int(slide_sec)
        self.lateness = float(lateness_sec)
        self.ts_col = ts_col
        self.value_col = value_col
        # open-window state: window_start_sec → [count, cent_sum]
        self.open: dict[int, list[int]] = {}
        self.max_seen_sec: int | None = None
        self.emit_floor: int | None = None  # smallest NOT-yet-emitted wid
        self.late_dropped = 0

    # ------------------------------------------------------------- ingest
    @property
    def watermark_sec(self) -> float:
        if self.max_seen_sec is None:
            return float("-inf")
        return self.max_seen_sec - self.lateness

    def _combine_chunk(self, chunk) -> tuple[pa.Table, int | None]:
        """(window partials, max event second) of one chunk — distributed
        for a Dataset, local for a Table/DataFrame."""
        part = SlidingWindowPartial(self.ts_col, self.value_col,
                                    self.width, self.slide)
        if isinstance(chunk, rd.Dataset):
            def with_max(t: pa.Table, _p=part, _ts=self.ts_col) -> pa.Table:
                out = _p(t)
                if len(t) == 0:
                    mx = pa.array([], pa.int64())
                else:
                    m = int(np.floor_divide(
                        pc.max(pc.cast(t.column(_ts), pa.int64()))
                        .as_py(), 1_000_000))
                    mx = pa.array([m] * len(out), pa.int64())
                return out.append_column("__mx", mx)

            folded = {}
            mx_all: int | None = None
            parts = chunk.map_batches(with_max, batch_format="pyarrow")
            for t in parts.iter_batches(batch_size=None,
                                        batch_format="pyarrow"):
                if len(t) == 0:
                    continue
                w = t.column("window_start_sec").to_numpy()
                c = t.column("__pc").to_numpy()
                s = t.column("__ps").to_numpy()
                m = int(t.column("__mx")[0].as_py())
                mx_all = m if mx_all is None else max(mx_all, m)
                for i in range(len(w)):
                    ent = folded.get(w[i])
                    if ent is None:
                        folded[w[i]] = [int(c[i]), int(s[i])]
                    else:
                        ent[0] += int(c[i])
                        ent[1] += int(s[i])
            tbl = pa.table({
                "window_start_sec": pa.array(list(folded.keys()), pa.int64()),
                "__pc": pa.array([v[0] for v in folded.values()], pa.int64()),
                "__ps": pa.array([v[1] for v in folded.values()], pa.int64()),
            })
            return tbl, mx_all
        if not isinstance(chunk, pa.Table):
            chunk = pa.Table.from_pandas(chunk, preserve_index=False)
        if len(chunk) == 0:
            return part(chunk), None
        mx = int(np.floor_divide(
            pc.max(pc.cast(chunk.column(self.ts_col), pa.int64())).as_py(),
            1_000_000))
        return part(chunk), mx

    def ingest(self, chunk) -> pa.Table:
        """Fold one transaction into the open-window state; return the
        windows this chunk FINALIZES (exactly once, ordered by window)."""
        partials, mx = self._combine_chunk(chunk)
        w = partials.column("window_start_sec").to_numpy()
        c = partials.column("__pc").to_numpy()
        s = partials.column("__ps").to_numpy()
        for i in range(len(w)):
            wid = int(w[i])
            if self.emit_floor is not None and wid < self.emit_floor:
                # window already finalized — exactly-once forbids re-emit
                self.late_dropped += int(c[i])
                continue
            ent = self.open.get(wid)
            if ent is None:
                self.open[wid] = [int(c[i]), int(s[i])]
            else:
                ent[0] += int(c[i])
                ent[1] += int(s[i])
        if mx is not None:
            self.max_seen_sec = mx if self.max_seen_sec is None \
                else max(self.max_seen_sec, mx)
        return self._emit_ready()

    def _finalize(self, wids: list[int]) -> pa.Table:
        if not wids:
            return _empty_out()
        rows = [(wid, *self.open.pop(wid)) for wid in sorted(wids)]
        return pa.table({
            "window_start_sec": pa.array([r[0] for r in rows], pa.int64()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "total_value": pa.array([r[2] / 100.0 for r in rows],
                                    pa.float64()),
        })

    def _emit_ready(self) -> pa.Table:
        wm = self.watermark_sec
        ready = [wid for wid in self.open if wid + self.width <= wm]
        if ready:
            floor = max(ready) + self.slide
            self.emit_floor = floor if self.emit_floor is None \
                else max(self.emit_floor, floor)
        return self._finalize(ready)

    def flush(self) -> pa.Table:
        """End of stream: emit every still-open window."""
        wids = list(self.open)
        if wids:
            floor = max(wids) + self.slide
            self.emit_floor = floor if self.emit_floor is None \
                else max(self.emit_floor, floor)
        return self._finalize(wids)

    # --------------------------------------------------------- durability
    def checkpoint(self, path: str) -> None:
        """Atomically persist the open-window state (tmp + rename)."""
        state = {
            "width": self.width, "slide": self.slide,
            "lateness": self.lateness,
            "ts_col": self.ts_col, "value_col": self.value_col,
            "max_seen_sec": self.max_seen_sec,
            "emit_floor": self.emit_floor,
            "late_dropped": self.late_dropped,
            "open": [[k, v[0], v[1]] for k, v in sorted(self.open.items())],
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, path)

    @classmethod
    def restore(cls, path: str) -> "StreamingWindowAggregator":
        with open(path) as f:
            st = json.load(f)
        agg = cls(width_sec=st["width"], slide_sec=st["slide"],
                  lateness_sec=st["lateness"], ts_col=st["ts_col"],
                  value_col=st["value_col"])
        agg.max_seen_sec = st["max_seen_sec"]
        agg.emit_floor = st["emit_floor"]
        agg.late_dropped = st["late_dropped"]
        agg.open = {int(k): [int(c), int(s)] for k, c, s in st["open"]}
        return agg


def stream_window_agg(chunks, *, width_sec: int = 3600,
                      slide_sec: int | None = None,
                      lateness_sec: float = float("inf"),
                      ts_col: str = "ts",
                      value_col: str = "value") -> pa.Table:
    """Run a chunk iterable (Datasets / Tables / DataFrames, LSN order)
    through a :class:`StreamingWindowAggregator` and return ALL emitted
    windows (incremental finalizations + final flush), ordered by window.

    With the default infinite lateness this equals the batch
    ``sliding_window_agg`` over the concatenated stream — the oracle
    equivalence the driver gate checks."""
    agg = StreamingWindowAggregator(
        width_sec=width_sec, slide_sec=slide_sec, lateness_sec=lateness_sec,
        ts_col=ts_col, value_col=value_col)
    outs = [agg.ingest(c) for c in chunks]
    outs.append(agg.flush())
    parts = [t for t in outs if len(t)]
    if not parts:  # fully-empty stream: concat_tables([]) raises
        return _empty_out()
    tbl = pa.concat_tables(parts)
    return tbl.sort_by("window_start_sec")
