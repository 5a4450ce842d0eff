"""Pure-stdlib image/audio codecs (zlib + wave + numpy — no PIL/ffmpeg).

Real decode for the uncompressed/deflate formats a training-data pipeline
meets in practice without native codecs:

- PNG (8-bit gray / RGB / RGBA, non-interlaced): zlib inflate + the five
  scanline filters (spec: https://www.w3.org/TR/png-3/), plus an encoder
  (filter 0, CRC32 chunks) for fixtures and resized output.
- BMP (24-bit uncompressed, bottom-up rows, 4-byte row padding).
- PPM/PGM (binary P6/P5).
- WAV PCM via the stdlib ``wave`` module.

JPEG/MP4 and friends still require native codecs — ``decode_image`` raises
``NotImplementedError`` for them (the caller's skip/fail policy applies).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------- PNG
def decode_png(blob: bytes) -> np.ndarray:
    if not blob.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,), ctype = struct.unpack(">I", blob[pos:pos + 4]), \
            blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if bit_depth != 8 or interlace != 0:
                raise NotImplementedError(
                    "PNG decoder supports 8-bit non-interlaced only")
            if color_type not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG color type {color_type} unsupported "
                    "(gray/RGB/RGBA only)")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw[off + 1:off + 1 + stride],
                            dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for x in range(channels, stride):
                cur[x] = (cur[x] + cur[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                cur[x] = (cur[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y].astype(np.int32)

    arr = out.reshape(height, width, channels)
    return arr[:, :, 0] if channels == 1 else arr


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + ctype + data + \
        struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit gray (H,W) / RGB (H,W,3) / RGBA (H,W,4) → PNG (filter 0)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        flat = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        color_type = 2 if arr.shape[2] == 3 else 6
        channels = arr.shape[2]
        flat = arr
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = flat.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(rows, 6))
            + _png_chunk(b"IEND", b""))


# ---------------------------------------------------------------------- BMP
def decode_bmp(blob: bytes) -> np.ndarray:
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", blob[10:14])[0]
    w, h = struct.unpack("<ii", blob[18:26])
    bpp = struct.unpack("<H", blob[28:30])[0]
    comp = struct.unpack("<I", blob[30:34])[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("BMP decoder supports 24-bit uncompressed")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    img = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        off = data_off + y * row_bytes
        row = np.frombuffer(blob[off:off + w * 3],
                            dtype=np.uint8).reshape(w, 3)
        img[h - 1 - y if bottom_up else y] = row[:, ::-1]  # BGR → RGB
    return img


# ------------------------------------------------------------------ PPM/PGM
def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary P5 (gray) / P6 (RGB)."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    channels = 1 if blob[:2] == b"P5" else 3
    arr = np.frombuffer(blob[pos:pos + w * h * channels], dtype=np.uint8)
    return arr.reshape(h, w) if channels == 1 else arr.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    tag = b"P5" if arr.ndim == 2 else b"P6"
    h, w = arr.shape[:2]
    return tag + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


# ---------------------------------------------------------------------- WAV
def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (float32 samples in [-1,1] shaped (n, channels), rate)."""
    import wave

    with wave.open(io.BytesIO(blob), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        width = wf.getsampwidth()
        channels = wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                   - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit WAV unsupported")
    return samples.reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float array in [-1,1] (n,) or (n, channels) → 16-bit PCM WAV."""
    import wave

    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()
