"""Pure-stdlib image/audio codecs (zlib + wave + numpy — no PIL/ffmpeg).

Real decode for the uncompressed/deflate formats a training-data pipeline
meets in practice without native codecs:

- PNG (8-bit gray / RGB / RGBA, non-interlaced): zlib inflate + the five
  scanline filters (spec: https://www.w3.org/TR/png-3/), plus an encoder
  (filter 0, CRC32 chunks) for fixtures and resized output.
- BMP (24-bit uncompressed, bottom-up rows, 4-byte row padding).
- PPM/PGM (binary P6/P5).
- WAV PCM via the stdlib ``wave`` module.
- JPEG baseline sequential (SOF0/1): full marker parse, huffman entropy
  decode, dequantize + IDCT, 1–2× chroma subsampling, restart markers;
  plus a 4:4:4 encoder for fixtures/round-trip tests (see module docs at
  the JPEG section below).

Progressive JPEG / WebP / MP4 and friends still require native codecs —
decoders raise ``NotImplementedError`` for them (the caller's skip/fail
policy applies).
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


# --------------------------------------------------------------------- JPEG
# Baseline sequential JFIF (SOF0), pure numpy: marker parse → canonical
# huffman entropy decode → dequantize → 8×8 IDCT (orthonormal DCT basis
# matmul) → chroma upsample → YCbCr→RGB. Supports gray + 3-component,
# sampling factors 1–2 (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), restart markers.
# Progressive (SOF2) / arithmetic / 12-bit raise NotImplementedError.
# The encoder emits 4:4:4 with uniform-length canonical huffman tables
# (legal incomplete trees — table choice is in-stream, so any decoder
# reads it); it exists to make fixtures and lossy round-trip tests
# possible without PIL/libjpeg. Python-loop entropy decode: fine for
# test-scale assets; swap for libjpeg bindings in production pipelines.

JPEG_MAGIC = b"\xff\xd8"

_ZZ = None  # zigzag order: sequence index -> flat (row*8+col) position


def _zigzag() -> np.ndarray:
    global _ZZ
    if _ZZ is None:
        cells = sorted(
            ((r, c) for r in range(8) for c in range(8)),
            key=lambda rc: (rc[0] + rc[1],
                            rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]))
        _ZZ = np.array([r * 8 + c for r, c in cells], dtype=np.int64)
    return _ZZ


def _dct_basis() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    c[0] /= np.sqrt(2)
    return c


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-stuffed marker (caller handles RSTn/EOI)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> bool:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker: entropy segment ends here
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # pad with zero bits past the marker (spec: segment is
                # 1-padded, trailing garbage bits are never consumed)
                self.acc <<= 8
                self.nbits += 8
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def next_marker(self) -> int | None:
        """Consume an aligned FF xx marker at the current byte position."""
        while self.buf[self.pos] != 0xFF:
            self.pos += 1
        while self.buf[self.pos + 1] == 0xFF:
            self.pos += 1
        m = self.buf[self.pos + 1]
        self.pos += 2
        return m


def _huff_decode_map(bits: list[int], vals: bytes) -> dict:
    """Canonical JPEG huffman: {(length, code) -> symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude category decode (spec F.12)."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    if not blob.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> map
    comps: list[dict] = []
    width = height = 0
    restart = 0
    pos = 2
    while True:
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data")
        (seglen,) = struct.unpack(">H", blob[pos:pos + 2])
        seg = blob[pos + 2:pos + seglen]
        if marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = seg[p + 17:p + 17 + n]
                huff[(tc_th >> 4, tc_th & 15)] = _huff_decode_map(bits, vals)
                p += 17 + n
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.float64)
                tbl[_zigzag()] = np.frombuffer(
                    seg[p + 1:p + 65], dtype=np.uint8)
                qt[pq_tq & 15] = tbl.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            _prec, height, width, nc = struct.unpack(">BHHB", seg[:6])
            if _prec != 8:
                raise NotImplementedError("12-bit JPEG")
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) is supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i:3 + 2 * i]
                for c in comps:
                    if c["id"] == cs:
                        c["dc"] = huff[(0, td_ta >> 4)]
                        c["ac"] = huff[(1, td_ta & 15)]
            pos += seglen
            break
        pos += seglen

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    basis = _dct_basis()
    zz = _zigzag()
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
              for c in comps]
    pred = [0] * len(comps)
    br = _BitReader(blob, pos)
    coeffs = np.zeros(64, dtype=np.float64)
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            br.align()
            mk = br.next_marker()
            if mk is None or not (0xD0 <= mk <= 0xD7):
                raise ValueError("expected restart marker")
            pred = [0] * len(comps)
            br.marker = None
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coeffs[:] = 0
                    t = _read_symbol(br, c["dc"])
                    if t:
                        pred[ci] += _extend(br.read(t), t)
                    coeffs[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _read_symbol(br, c["ac"])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index out of range")
                        coeffs[zz[k]] = _extend(br.read(s), s)
                        k += 1
                    block = basis.T @ (coeffs.reshape(8, 8) * q) @ basis
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = block + 128.0
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# JPEG Annex K.1/K.2 reference quantization tables (public spec constants)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64).reshape(8, 8)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _uniform_huff(symbols: set[int]) -> tuple[list[int], bytes, dict]:
    """All used symbols at one code length L with 2^L-1 >= k (the all-ones
    slot stays free, keeping the canonical tree incomplete — legal and
    what Annex K's own tables do). Returns (BITS, HUFFVAL, sym->(code,L))."""
    syms = sorted(symbols) or [0]
    k = len(syms)
    L = 1
    while (1 << L) - 1 < k:
        L += 1
    bits = [0] * 16
    bits[L - 1] = k
    codes = {s: (i, L) for i, s in enumerate(syms)}
    return bits, bytes(syms), codes


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """8-bit gray (H,W) or RGB (H,W,3) → baseline 4:4:4 JFIF JPEG."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr - 128.0]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y - 128.0, cb, cr]
    qts = [_scaled_q(_Q_LUMA, quality)] + \
        ([] if gray else [_scaled_q(_Q_CHROMA, quality)])
    basis = _dct_basis()
    zz = _zigzag()
    bh, bw = -(-h // 8), -(-w // 8)
    # pass 1: quantized coefficients per component block
    all_blocks: list[list[np.ndarray]] = []
    for ci, p in enumerate(planes):
        q = qts[min(ci, len(qts) - 1)]
        padded = np.pad(p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        blocks = []
        for by in range(bh):
            for bx in range(bw):
                blk = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                f = basis @ blk @ basis.T
                blocks.append(np.round(f / q).astype(np.int64))
        all_blocks.append(blocks)
    # pass 2: collect symbols, build uniform-length tables per class
    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    seqs: list[list[tuple]] = []  # per component: [(dcsym,bits),(acsym,bits)…]
    for ci, blocks in enumerate(all_blocks):
        tcls = 0 if ci == 0 else 1
        pred = 0
        seq: list[tuple] = []
        for blk in blocks:
            flat = blk.reshape(64)[zz]
            diff = int(flat[0]) - pred
            pred = int(flat[0])
            t = _category(diff)
            dc_syms[tcls].add(t)
            seq.append(("dc", t, diff))
            run = 0
            nz = np.nonzero(flat[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(flat[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms[tcls].add(0xF0)
                    seq.append(("ac", 0xF0, 0))
                    run -= 16
                s = _category(v)
                sym = (run << 4) | s
                ac_syms[tcls].add(sym)
                seq.append(("ac", sym, v))
                run = 0
            if last < 63:
                ac_syms[tcls].add(0x00)
                seq.append(("ac", 0x00, 0))
        seqs.append(seq)
    tables = []
    for tcls in range(2 if not gray else 1):
        dc_bits, dc_vals, dc_codes = _uniform_huff(dc_syms[tcls])
        ac_bits, ac_vals, ac_codes = _uniform_huff(ac_syms[tcls])
        tables.append((dc_bits, dc_vals, dc_codes, ac_bits, ac_vals, ac_codes))
    # pass 3: serialize
    out = bytearray(JPEG_MAGIC)
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for ti, q in enumerate(qts):
        z = np.zeros(64, dtype=np.uint8)
        z[:] = q.reshape(64)[zz].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti) + z.tobytes()
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, min(ci, len(qts) - 1)])
    for tcls, (dcb, dcv, _dc, acb, acv, _ac) in enumerate(tables):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(dcv), tcls) + bytes(dcb) + dcv
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(acv), 0x10 | tcls) + bytes(acb) + acv
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        tcls = 0 if ci == 0 else 1
        out += bytes([ci + 1, (tcls << 4) | tcls])
    out += b"\x00\x3f\x00"
    bw_ = _BitWriter()
    # interleave blocks MCU-wise: 4:4:4 ⇒ one block per component per MCU
    nblocks = bh * bw
    per_block: list[list[list[tuple]]] = []
    for ci, seq in enumerate(seqs):
        blocks, cur = [], []
        for item in seq:
            if item[0] == "dc" and cur:
                blocks.append(cur)
                cur = []
            cur.append(item)
        blocks.append(cur)
        per_block.append(blocks)
    for bi in range(nblocks):
        for ci in range(nc):
            tcls = 0 if ci == 0 else 1
            _dcb, _dcv, dc_codes, _acb, _acv, ac_codes = tables[tcls]
            for kind, sym, v in per_block[ci][bi]:
                code, L = (dc_codes if kind == "dc" else ac_codes)[sym]
                bw_.write(code, L)
                s = sym & 15 if kind == "ac" else sym
                if s:
                    bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------- GIF
# GIF87a/89a: LZW-compressed indexed color, optional interlace, multi-frame
# animation with per-frame disposal. The LZW code loop is Python (documented
# scope: test assets / metadata extraction, like the JPEG entropy loop —
# swap for a native codec at production pixel volume).

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """LZW decode (GIF variant: variable code width, CLEAR/EOI codes)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [(i,) for i in range(clear)] + [None, None]

    table = list(base)
    width = min_code_size + 1
    out: list[int] = []
    prev = None
    bitpos = 0
    total_bits = len(data) * 8
    while len(out) < n_pixels and bitpos + width <= total_bits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0:byte0 + 4], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


def _gif_subblocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = blob[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(blob[pos:pos + n])
        pos += n
    return b"".join(chunks), pos


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_frames(blob: bytes, max_frames: int | None = None):
    """All frames of a GIF as composited (H, W, 3) uint8 RGB arrays
    (disposal methods 0/1 leave, 2 restore-background, 3 restore-previous;
    transparency honored during composition)."""
    if blob[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    W, H = struct.unpack("<HH", blob[6:10])
    flags = blob[10]
    bg_index = blob[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(blob[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    frames = []
    transparent = None
    disposal = 0
    prev_canvas = None
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = blob[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control: disposal + transparency
                gce = blob[pos + 1:pos + 1 + blob[pos]]
                disposal = (gce[0] >> 2) & 7
                transparent = gce[3] if gce[0] & 1 else None
            _, pos = _gif_subblocks(blob, pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
        x, y, w, h = struct.unpack("<HHHH", blob[pos + 1:pos + 9])
        iflags = blob[pos + 9]
        pos += 10
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            lct = np.frombuffer(blob[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF frame has no color table")
        min_code = blob[pos]
        pos += 1
        data, pos = _gif_subblocks(blob, pos)
        idx = np.array(_gif_lzw_decode(data, min_code, w * h),
                       dtype=np.int32)
        if idx.size < w * h:
            idx = np.pad(idx, (0, w * h - idx.size))
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            rect = np.empty((h, w), dtype=np.int32)
            rows = idx.reshape(h, w)
            r = 0
            for start, step in _GIF_INTERLACE:
                for yy in range(start, h, step):
                    rect[yy] = rows[r]
                    r += 1
        else:
            rect = idx.reshape(h, w)
        if disposal == 3:
            prev_canvas = canvas.copy()
        region = canvas[y:y + h, x:x + w]
        rgb = lct[np.clip(rect, 0, len(lct) - 1)]
        if transparent is not None:
            opaque = rect != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            patch = canvas[y:y + h, x:x + w]
            patch[:] = gct[bg_index] if gct is not None and \
                bg_index < len(gct) else 0
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return frames


def decode_gif(blob: bytes) -> np.ndarray:
    """First frame as (H, W, 3) uint8 RGB."""
    return gif_frames(blob, max_frames=1)[0]


def encode_gif(frames, palette: np.ndarray, *, transparent=None,
               interlace_first: bool = False) -> bytes:
    """Minimal GIF89a encoder for index arrays (test fixture / round-trip
    partner of gif_frames). ``frames``: list of (H, W) uint8 index arrays
    sharing one palette (N, 3). LZW emits a CLEAR before every literal —
    bloated but spec-valid, and exercises the decoder's table resets."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    H, W = frames[0].shape
    n = max(2, int(palette.shape[0]))
    depth = max(1, (n - 1).bit_length())
    size_field = depth - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", W, H)
    out += bytes([0x80 | size_field, 0, 0])
    pal = np.zeros((2 << size_field, 3), dtype=np.uint8)
    pal[:palette.shape[0]] = palette
    out += pal.tobytes()
    min_code = max(2, depth)
    clear = 1 << min_code
    for fi, frame in enumerate(frames):
        if transparent is not None or len(frames) > 1:
            gce = bytes([0x21, 0xF9, 4,
                         (1 if transparent is not None else 0),
                         0, 0,
                         transparent if transparent is not None else 0, 0])
            out += gce
        iflags = 0x40 if (interlace_first and fi == 0) else 0
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, W, H) \
            + bytes([iflags])
        rows = frame
        if iflags:
            order = []
            for start, step in _GIF_INTERLACE:
                order.extend(range(start, H, step))
            rows = frame[np.array(order)]
        out += bytes([min_code])
        bits = bytearray()
        acc = 0
        nbits = 0
        width = min_code + 1
        for v in rows.reshape(-1):
            for code in (clear, int(v)):
                acc |= code << nbits
                nbits += width
                while nbits >= 8:
                    bits.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
        acc |= (clear + 1) << nbits       # EOI
        nbits += width
        while nbits > 0:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        for i in range(0, len(bits), 255):
            chunk = bits[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
