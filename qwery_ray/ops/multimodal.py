"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool map_batches stages.

The container has no image/audio codecs, so the DECODE kernels are stubbed
(STUB: marked below) behind a deterministic fake — but the Ray-side plumbing
(schema, batch sizing, actor signature, output layout) is real and tested:
this is exactly the shape a PIL/ffmpeg-backed stage drops into.

Design notes for 100 TB: binary payloads are wide — these stages use small
``batch_size`` (default 64) so batch × concurrency fits worker heaps, keep
``batch_format="pyarrow"`` end-to-end (binary columns do NOT round-trip well
through pandas), and never ship payloads to the driver.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

MAGIC = b"FIMG"  # deterministic fake image container: FIMG|w:u16|h:u16|payload


def synth_binary_images(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake 'image' rows: binary payload + typed metadata —
    the multimodal table schema (binary + width/height/format)."""
    rng = np.random.default_rng(seed)
    blobs, widths, heights, fmts, ids = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(4, 64))
        h = int(rng.integers(4, 64))
        payload = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        blobs.append(MAGIC + struct.pack("<HH", w, h) + payload)
        widths.append(w)
        heights.append(h)
        fmts.append("fimg")
        ids.append(i)
    return pa.table({
        "image_id": pa.array(ids, type=pa.int64()),
        "data": pa.array(blobs, type=pa.binary()),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "format": pa.array(fmts, type=pa.string()),
    })


class DecodeImage:
    """Actor-pool decode stage: binary → fixed-size float feature vector.

    STUB: a real deployment replaces ``_decode`` with PIL/torchvision; the
    fake parses the FIMG container deterministically so tests exercise real
    bytes→array→feature flow. Raises on non-FIMG data the way a real decoder
    would raise on corrupt images (caller chooses skip/fail policy)."""

    def __init__(self, data_col: str = "data", strict: bool = True):
        self.data_col = data_col
        self.strict = strict

    def _decode(self, blob: bytes) -> np.ndarray | None:
        if blob is None or not blob.startswith(MAGIC):
            if self.strict:
                raise NotImplementedError(
                    "real image decode requires PIL/libjpeg (not in this "
                    "container); only FIMG fakes are decodable")
            return None
        w, h = struct.unpack("<HH", blob[4:8])
        return np.frombuffer(blob[8:8 + w * h], dtype=np.uint8).reshape(h, w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for blob in batch.column(self.data_col).to_pylist():
            img = self._decode(blob)
            if img is None:
                feats.append(None)
                continue
            # 8-byte feature: mean, std, min, max, histogram quartiles
            q = np.percentile(img, [25, 50, 75])
            feats.append([float(img.mean()), float(img.std()),
                          float(img.min()), float(img.max()),
                          float(q[0]), float(q[1]), float(q[2]),
                          float(img.size)])
        return batch.append_column(
            "features", pa.array(feats, type=pa.list_(pa.float32())))


class ResizeImage:
    """STUB resize: nearest-neighbor on the fake container (a real stage
    swaps in PIL.Image.resize). Demonstrates binary-in/binary-out layout."""

    def __init__(self, target: tuple[int, int] = (16, 16),
                 data_col: str = "data"):
        self.target = target
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th = self.target
        out = []
        for blob in batch.column(self.data_col).to_pylist():
            if blob is None or not blob.startswith(MAGIC):
                out.append(None)
                continue
            w, h = struct.unpack("<HH", blob[4:8])
            img = np.frombuffer(blob[8:8 + w * h], dtype=np.uint8).reshape(h, w)
            yi = (np.arange(th) * h // th)[:, None]
            xi = (np.arange(tw) * w // tw)[None, :]
            resized = img[yi, xi]
            out.append(MAGIC + struct.pack("<HH", tw, th) + resized.tobytes())
        tbl = batch.set_column(
            batch.column_names.index(self.data_col),
            self.data_col, pa.array(out, type=pa.binary()))
        widths = pa.array([tw] * len(batch), type=pa.int32())
        heights = pa.array([th] * len(batch), type=pa.int32())
        tbl = tbl.set_column(tbl.column_names.index("width"), "width", widths)
        return tbl.set_column(tbl.column_names.index("height"), "height", heights)


class FrameSample:
    """STUB video frame-sampler: treats the payload as concatenated FIMG
    frames, emits every nth frame as its own row (flat-map shape)."""

    def __init__(self, every_n: int = 2, data_col: str = "data"):
        self.every_n = every_n
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, frame_idx = [], [], []
        for vid, blob in zip(batch.column("image_id").to_pylist(),
                             batch.column(self.data_col).to_pylist()):
            if blob is None:
                continue
            off, i = 0, 0
            while off + 8 <= len(blob) and blob[off:off + 4] == MAGIC:
                w, h = struct.unpack("<HH", blob[off + 4:off + 8])
                end = off + 8 + w * h
                if i % self.every_n == 0:
                    ids.append(vid)
                    frames.append(blob[off:end])
                    frame_idx.append(i)
                off, i = end, i + 1
        return pa.table({
            "image_id": pa.array(ids, type=pa.int64()),
            "frame_index": pa.array(frame_idx, type=pa.int64()),
            "data": pa.array(frames, type=pa.binary()),
        })


def image_pipeline(table: pa.Table, *, concurrency: int = 2,
                   batch_size: int = 64) -> rd.Dataset:
    """The reference multimodal pipeline shape: decode (actor pool) →
    feature extraction, small batches, Arrow throughout."""
    ds = rd.from_arrow(table)
    return ds.map_batches(DecodeImage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
