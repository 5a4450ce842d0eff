"""ISO-BMFF (MP4) sample-table parsing — real container plumbing, no codec.

Frame SAMPLING from an MP4 never needs a video decoder: the container's
sample tables (``moov/trak/mdia/minf/stbl``) map every encoded frame to an
absolute byte range in the file, its decode timestamp and whether it is a
sync (key) frame. This module walks the box tree per ISO/IEC 14496-12:

- ``stsz``  per-sample sizes            - ``stco``/``co64``  chunk offsets
- ``stsc``  sample→chunk run-lengths    - ``stts``  decode time deltas
- ``stss``  sync-sample numbers         - ``mdhd``  media timescale

``parse_samples`` returns one record per sample (offset, size, dts
seconds, keyframe); ``extract_samples`` slices the payload bytes out.
Decoding those H.264/H.265/AV1 payloads to pixels still requires native
codecs and stays out of scope (ops.multimodal raises for pixel decode) —
the sampling stage itself is fully real and works on standard MP4 files.

``mux_mp4`` writes a minimal single-track MP4 (ftyp + mdat + moov with a
correct stbl) so fixtures and round-trip tests need no ffmpeg.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

MP4_BRANDS = (b"isom", b"iso2", b"mp41", b"mp42", b"avc1", b"M4V ", b"qt  ")


def looks_like_mp4(blob: bytes) -> bool:
    return len(blob) >= 12 and blob[4:8] == b"ftyp"


@dataclass
class Mp4Sample:
    index: int          # 0-based sample number
    offset: int         # absolute byte offset in the file
    size: int           # payload bytes
    dts: float          # decode timestamp, seconds
    keyframe: bool


def _iter_boxes(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,), btype = struct.unpack(">I", buf[pos:pos + 4]), \
            buf[pos + 4:pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr:
            raise ValueError("corrupt MP4 box size")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, *path: bytes):
    """First box matching a nested type path; returns (body_start, body_end)."""
    lo, hi = start, end
    for want in path:
        found = None
        for btype, b0, b1 in _iter_boxes(buf, lo, hi):
            if btype == want:
                found = (b0, b1)
                break
        if found is None:
            return None
        lo, hi = found
    return lo, hi


def _video_trak(buf: bytes, mstart: int, mend: int):
    """The first trak whose hdlr is 'vide', else the first trak."""
    first = None
    for btype, b0, b1 in _iter_boxes(buf, mstart, mend):
        if btype != b"trak":
            continue
        if first is None:
            first = (b0, b1)
        h = _find(buf, b0, b1, b"mdia", b"hdlr")
        if h and buf[h[0] + 8:h[0] + 12] == b"vide":
            return b0, b1
    return first


def parse_samples(blob: bytes) -> list[Mp4Sample]:
    if not looks_like_mp4(blob):
        raise ValueError("not an MP4 (no ftyp)")
    moov = _find(blob, 0, len(blob), b"moov")
    if moov is None:
        raise ValueError("MP4 has no moov box (fragmented/streaming MP4 "
                         "with moof is not supported)")
    trak = _video_trak(blob, *moov)
    if trak is None:
        raise ValueError("MP4 has no trak")
    mdhd = _find(blob, *trak, b"mdia", b"mdhd")
    timescale = 1
    if mdhd:
        version = blob[mdhd[0]]
        timescale = struct.unpack(
            ">I", blob[mdhd[0] + (20 if version else 12):
                       mdhd[0] + (24 if version else 16)])[0] or 1
    stbl = _find(blob, *trak, b"mdia", b"minf", b"stbl")
    if stbl is None:
        raise ValueError("MP4 trak has no stbl")

    def table(name: bytes):
        loc = _find(blob, *stbl, name)
        return None if loc is None else loc

    # stsz: sample sizes (uniform or per-sample)
    loc = table(b"stsz")
    if loc is None:
        raise ValueError("MP4 stbl has no stsz")
    uniform, count = struct.unpack(">II", blob[loc[0] + 4:loc[0] + 12])
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack(
            f">{count}I", blob[loc[0] + 12:loc[0] + 12 + 4 * count]))
    # stco / co64: chunk offsets
    loc = table(b"stco")
    wide = False
    if loc is None:
        loc = table(b"co64")
        wide = True
    if loc is None:
        raise ValueError("MP4 stbl has no stco/co64")
    (nchunks,) = struct.unpack(">I", blob[loc[0] + 4:loc[0] + 8])
    fmt = "Q" if wide else "I"
    step = 8 if wide else 4
    chunk_offs = list(struct.unpack(
        f">{nchunks}{fmt}", blob[loc[0] + 8:loc[0] + 8 + step * nchunks]))
    # stsc: runs of (first_chunk, samples_per_chunk)
    loc = table(b"stsc")
    if loc is None:
        raise ValueError("MP4 stbl has no stsc")
    (nruns,) = struct.unpack(">I", blob[loc[0] + 4:loc[0] + 8])
    runs = [struct.unpack(">III", blob[loc[0] + 8 + 12 * i:
                                       loc[0] + 20 + 12 * i])
            for i in range(nruns)]
    # per-chunk sample counts from the stsc runs
    per_chunk = []
    for ri, (first, spc, _desc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else nchunks
        per_chunk.extend([spc] * (last - first + 1))
    # stts: decode deltas
    deltas: list[int] = []
    loc = table(b"stts")
    if loc is not None:
        (n,) = struct.unpack(">I", blob[loc[0] + 4:loc[0] + 8])
        for i in range(n):
            cnt, d = struct.unpack(
                ">II", blob[loc[0] + 8 + 8 * i:loc[0] + 16 + 8 * i])
            deltas.extend([d] * cnt)
    # stss: sync samples (absent ⇒ every sample is a keyframe)
    keys = None
    loc = table(b"stss")
    if loc is not None:
        (n,) = struct.unpack(">I", blob[loc[0] + 4:loc[0] + 8])
        keys = set(struct.unpack(
            f">{n}I", blob[loc[0] + 8:loc[0] + 8 + 4 * n]))

    out: list[Mp4Sample] = []
    si = 0
    dts = 0
    for ci, coff in enumerate(chunk_offs):
        off = coff
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            out.append(Mp4Sample(
                index=si, offset=off, size=sizes[si],
                dts=dts / timescale,
                keyframe=(keys is None or (si + 1) in keys)))
            off += sizes[si]
            dts += deltas[si] if si < len(deltas) else 0
            si += 1
    return out


def extract_samples(blob: bytes, every_n: int = 1,
                    keyframes_only: bool = False):
    """Yield (index, dts_seconds, keyframe, payload) for selected samples."""
    picked = 0
    for s in parse_samples(blob):
        if keyframes_only and not s.keyframe:
            continue
        if picked % max(1, every_n) == 0:
            yield s.index, s.dts, s.keyframe, blob[s.offset:s.offset + s.size]
        picked += 1


# ------------------------------------------------------------------- muxer
def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0,
          flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def mux_mp4(samples: list[bytes], timescale: int = 1000,
            sample_delta: int = 40, sync_every: int = 5,
            samples_per_chunk: int = 3) -> bytes:
    """Minimal single-video-track MP4: real box layout, opaque payloads.

    Payloads land in one mdat split into chunks of ``samples_per_chunk``;
    every ``sync_every``-th sample is marked sync in stss. The stsd entry
    is a generic box ('rawv') — structure is per spec, codec is opaque."""
    n = len(samples)
    mdat_payload = b"".join(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_pos = len(ftyp)
    data_start = mdat_pos + 8
    # chunk offsets
    chunk_offs = []
    off = data_start
    for i in range(0, n, samples_per_chunk):
        chunk_offs.append(off)
        off += sum(len(s) for s in samples[i:i + samples_per_chunk])
    dur = n * sample_delta
    stsd = _full(b"stsd", struct.pack(">I", 1)
                 + _box(b"rawv", b"\x00" * 6 + struct.pack(">H", 1)))
    stts = _full(b"stts", struct.pack(">III", 1, n, sample_delta))
    nchunks = len(chunk_offs)
    full_runs = [(1, samples_per_chunk, 1)]
    rem = n - (nchunks - 1) * samples_per_chunk
    if nchunks > 1 and rem != samples_per_chunk:
        full_runs.append((nchunks, rem, 1))
    stsc = _full(b"stsc", struct.pack(">I", len(full_runs))
                 + b"".join(struct.pack(">III", *r) for r in full_runs))
    stsz = _full(b"stsz", struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", struct.pack(">I", nchunks)
                 + b"".join(struct.pack(">I", o) for o in chunk_offs))
    stss = _full(b"stss", struct.pack(
        ">I", len(range(1, n + 1, sync_every)))
        + b"".join(struct.pack(">I", i)
                   for i in range(1, n + 1, sync_every)))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    vmhd = _full(b"vmhd", b"\x00" * 8, flags=1)
    dref = _full(b"dref", struct.pack(">I", 1) + _full(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, timescale, dur)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", struct.pack(">IIIII", 0, 0, 1, 0, dur)
                 + b"\x00" * 52, flags=7)
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, timescale, dur)
                 + struct.pack(">I", 0x00010000) + b"\x00" * 76)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
