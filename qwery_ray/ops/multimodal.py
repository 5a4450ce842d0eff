"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool map_batches stages.

Decode is REAL for formats stdlib can handle (see ops/imagecodec.py): PNG
(8-bit gray/RGB/RGBA), BMP (24-bit), PPM/PGM, WAV PCM — plus the FIMG
deterministic fake used by tests. Compressed formats that need native
codecs (JPEG, MP4, ...) raise NotImplementedError (STUB: marked below) —
a PIL/ffmpeg-backed ``_decode`` drops into the same stage shape.

Design notes for 100 TB: binary payloads are wide — these stages use small
``batch_size`` (default 64) so batch × concurrency fits worker heaps, keep
``batch_format="pyarrow"`` end-to-end (binary columns do NOT round-trip well
through pandas), and never ship payloads to the driver.
"""

from __future__ import annotations

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

    Decodes PNG/BMP/PPM/baseline-JPEG (pure numpy codecs, see
    ops.imagecodec) and the FIMG test fake.
    STUB: progressive JPEG, WebP, AVIF, ... still need native codecs and
    raise NotImplementedError — swap ``_decode`` for PIL/torchvision in a
    real deployment (caller chooses skip/fail policy via ``strict``)."""

    def __init__(self, data_col: str = "data", strict: bool = True):
        self.data_col = data_col
        self.strict = strict

    def _decode(self, blob: bytes) -> np.ndarray | None:
        from .imagecodec import (JPEG_MAGIC, PNG_MAGIC, decode_bmp,
                                 decode_jpeg, decode_png, decode_ppm)

        try:
            if blob is None:
                raise ValueError("null payload")
            if blob.startswith(MAGIC):
                w, h = struct.unpack("<HH", blob[4:8])
                return np.frombuffer(blob[8:8 + w * h],
                                     dtype=np.uint8).reshape(h, w)
            if blob.startswith(PNG_MAGIC):
                return decode_png(blob)
            if blob.startswith(JPEG_MAGIC):
                return decode_jpeg(blob)
            if blob.startswith(b"BM"):
                return decode_bmp(blob)
            if blob[:2] in (b"P5", b"P6"):
                return decode_ppm(blob)
            if blob[:6] in (b"GIF87a", b"GIF89a"):
                from .imagecodec import decode_gif

                return decode_gif(blob)
            raise NotImplementedError(
                "compressed image formats (WebP/AVIF/...) need native "
                "codecs not present in this container")
        except (NotImplementedError, ValueError, IndexError, KeyError,
                struct.error):  # malformed/truncated payloads included
            if self.strict:
                raise
            return None

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
    """Nearest-neighbor resize over any decodable format. FIMG stays FIMG;
    real formats re-encode as PNG (binary-in/binary-out layout)."""

    def __init__(self, target: tuple[int, int] = (16, 16),
                 data_col: str = "data"):
        self.target = target
        self.data_col = data_col
        self._dec = DecodeImage(data_col, strict=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .imagecodec import encode_png

        tw, th = self.target
        out = []
        for blob in batch.column(self.data_col).to_pylist():
            img = self._dec._decode(blob)
            if img is None:
                out.append(None)
                continue
            h, w = img.shape[:2]
            yi = (np.arange(th) * h // th)[:, None]
            xi = (np.arange(tw) * w // tw)[None, :]
            resized = img[yi, xi]
            if blob.startswith(MAGIC):
                out.append(MAGIC + struct.pack("<HH", tw, th)
                           + resized.tobytes())
            else:
                out.append(encode_png(resized))
        tbl = batch.set_column(
            batch.column_names.index(self.data_col),
            self.data_col, pa.array(out, type=pa.binary()))
        widths = pa.array([tw] * len(batch), type=pa.int32())
        heights = pa.array([th] * len(batch), type=pa.int32())
        tbl = tbl.set_column(tbl.column_names.index("width"), "width", widths)
        return tbl.set_column(tbl.column_names.index("height"), "height", heights)


class FrameSample:
    """Video frame-sampler (flat-map shape): every nth frame becomes its
    own row. Two payload kinds:

    - REAL MP4/ISO-BMFF (``ftyp`` at offset 4): the container's sample
      tables map each encoded frame to a byte range — extraction needs no
      video decoder (see ops.mp4). Emitted payloads are the opaque
      encoded frames with their decode timestamps and keyframe flags.
    - the FIMG test fake: concatenated raw frames.

    Decoding the extracted H.264/H.265/AV1 payloads to pixels still needs
    native codecs and is out of scope here."""

    def __init__(self, every_n: int = 2, data_col: str = "data",
                 keyframes_only: bool = False):
        self.every_n = every_n
        self.data_col = data_col
        self.keyframes_only = keyframes_only

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .mp4 import extract_samples, looks_like_mp4

        ids, frames, frame_idx, tss, keys = [], [], [], [], []
        for vid, blob in zip(batch.column("image_id").to_pylist(),
                             batch.column(self.data_col).to_pylist()):
            if blob is None:
                continue
            if looks_like_mp4(blob):
                for idx, dts, key, payload in extract_samples(
                        blob, every_n=self.every_n,
                        keyframes_only=self.keyframes_only):
                    ids.append(vid)
                    frames.append(payload)
                    frame_idx.append(idx)
                    tss.append(dts)
                    keys.append(key)
                continue
            if blob[:6] in (b"GIF87a", b"GIF89a"):
                # animated GIF: composited frames re-encoded as PNG payloads
                from .imagecodec import encode_png, gif_frames

                for i, fr in enumerate(gif_frames(blob)):
                    if i % self.every_n:
                        continue
                    ids.append(vid)
                    frames.append(encode_png(fr))
                    frame_idx.append(i)
                    tss.append(float(i))
                    keys.append(True)
                continue
            off, i = 0, 0
            while off + 8 <= len(blob) and blob[off:off + 4] == MAGIC:
                w, h = struct.unpack("<HH", blob[off + 4:off + 8])
                end = off + 8 + w * h
                if i % self.every_n == 0:
                    ids.append(vid)
                    frames.append(blob[off:end])
                    frame_idx.append(i)
                    tss.append(float(i))
                    keys.append(True)
                off, i = end, i + 1
        return pa.table({
            "image_id": pa.array(ids, type=pa.int64()),
            "frame_index": pa.array(frame_idx, type=pa.int64()),
            "dts_sec": pa.array(tss, type=pa.float64()),
            "keyframe": pa.array(keys, type=pa.bool_()),
            "data": pa.array(frames, type=pa.binary()),
        })


def synth_png_images(n: int, seed: int = 7) -> pa.Table:
    """Real PNG rows (encoded with the stdlib codec) — gray and RGB mix."""
    from .imagecodec import encode_png

    rng = np.random.default_rng(seed)
    blobs, widths, heights, fmts, ids = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(4, 48))
        h = int(rng.integers(4, 48))
        if i % 2 == 0:
            arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        else:
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blobs.append(encode_png(np.asarray(arr)))
        widths.append(w)
        heights.append(h)
        fmts.append("png")
        ids.append(i)
    return pa.table({
        "image_id": pa.array(ids, type=pa.int64()),
        "data": pa.array(blobs, type=pa.binary()),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "format": pa.array(fmts, type=pa.string()),
    })


def synth_wav_audio(n: int, seed: int = 11, rate: int = 8000) -> pa.Table:
    """Real PCM WAV rows: seeded sine+noise clips with typed metadata."""
    from .imagecodec import encode_wav

    rng = np.random.default_rng(seed)
    blobs, secs, ids = [], [], []
    for i in range(n):
        dur = float(rng.uniform(0.1, 0.5))
        t = np.arange(int(dur * rate)) / rate
        freq = float(rng.uniform(100, 1500))
        wave_ = 0.6 * np.sin(2 * np.pi * freq * t) \
            + 0.05 * rng.standard_normal(len(t))
        blobs.append(encode_wav(wave_, rate))
        secs.append(dur)
        ids.append(i)
    return pa.table({
        "audio_id": pa.array(ids, type=pa.int64()),
        "data": pa.array(blobs, type=pa.binary()),
        "sample_rate": pa.array([rate] * n, type=pa.int32()),
        "duration_sec": pa.array(secs, type=pa.float32()),
    })


class AudioFeatures:
    """Actor-pool audio stage: WAV PCM → (duration, rms, zero-crossing
    rate, spectral centroid) via numpy rfft — the audio analog of
    DecodeImage's feature extraction."""

    def __init__(self, data_col: str = "data"):
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .imagecodec import decode_wav

        feats = []
        for blob in batch.column(self.data_col).to_pylist():
            if blob is None:
                feats.append(None)
                continue
            samples, rate = decode_wav(blob)
            mono = samples.mean(axis=1)
            dur = len(mono) / rate
            rms = float(np.sqrt(np.mean(mono ** 2))) if len(mono) else 0.0
            zcr = float(np.mean(np.abs(np.diff(np.sign(mono))) > 0)) \
                if len(mono) > 1 else 0.0
            spec = np.abs(np.fft.rfft(mono))
            freqs = np.fft.rfftfreq(len(mono), 1.0 / rate)
            centroid = float((spec * freqs).sum() / spec.sum()) \
                if spec.sum() else 0.0
            feats.append([float(dur), rms, zcr, centroid])
        return batch.append_column(
            "audio_features", pa.array(feats, type=pa.list_(pa.float32())))


def image_pipeline(table: pa.Table, *, concurrency: int = 2,
                   batch_size: int = 64) -> rd.Dataset:
    """The reference multimodal pipeline shape: decode (actor pool) →
    feature extraction, small batches, Arrow throughout."""
    ds = rd.from_arrow(table)
    return ds.map_batches(DecodeImage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
