"""Minimal pure-Python Avro binary codec (vendored — no external deps).

Covers what the reference's Avro path needs (core/sources/
AvroInputSource.scala:14-35 schema-driven decode of binary Avro records,
AvroOutputSource.scala the mirror): primitives, records, unions, arrays,
maps, enums, fixed, and the Object Container File framing (null/deflate
codecs). fastavro remains the fast path when importable (see avro.py);
this module keeps Avro working without it.

Implements the public Apache Avro 1.11 binary encoding specification:
zig-zag varint longs, length-prefixed bytes/strings, little-endian IEEE
float/double, block-encoded arrays/maps, union-index prefix, and the OCF
layout (magic 'Obj\\x01', metadata map, 16-byte sync marker, blocks).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Optional

MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


# ------------------------------------------------------------------ decode
def _read_long(buf) -> int:
    """Zig-zag varint."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


class _Schemas:
    """Named-type registry (records/enums/fixed can be referenced by name)."""

    def __init__(self):
        self.named: dict[str, Any] = {}

    def register(self, schema: dict):
        name = schema.get("name")
        if name:
            ns = schema.get("namespace")
            self.named[name] = schema
            if ns:
                self.named[f"{ns}.{name}"] = schema


def decode_value(schema, buf, reg: _Schemas):
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _decode_primitive(schema, buf)
        schema = reg.named[schema]  # named-type reference
    if isinstance(schema, list):  # union: index then value
        idx = _read_long(buf)
        return decode_value(schema[idx], buf, reg)
    t = schema["type"]
    if t in _PRIMITIVES:
        return _decode_primitive(t, buf)
    if t == "record":
        reg.register(schema)
        return {f["name"]: decode_value(f["type"], buf, reg)
                for f in schema["fields"]}
    if t == "enum":
        reg.register(schema)
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        reg.register(schema)
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(decode_value(schema["items"], buf, reg))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode()
                out[k] = decode_value(schema["values"], buf, reg)
        return out
    if isinstance(t, (dict, list)):  # nested type object
        return decode_value(t, buf, reg)
    raise ValueError(f"unsupported Avro type {t!r}")


def _decode_primitive(t: str, buf):
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode()
    raise ValueError(t)


# ------------------------------------------------------------------ encode
def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (((-v) << 1) - 1)


def _put_long(buf, v: int):
    z = _zigzag(v)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            break


def _put_bytes(buf, data: bytes):
    _put_long(buf, len(data))
    buf.write(data)


def encode_value(schema, value, buf, reg: _Schemas):
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _encode_primitive(schema, value, buf)
        schema = reg.named[schema]
    if isinstance(schema, list):  # union: pick first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value, reg):
                _put_long(buf, i)
                return encode_value(branch, value, buf, reg)
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema["type"]
    if t in _PRIMITIVES:
        return _encode_primitive(t, value, buf)
    if t == "record":
        reg.register(schema)
        for f in schema["fields"]:
            encode_value(f["type"], value.get(f["name"]), buf, reg)
        return
    if t == "enum":
        reg.register(schema)
        return _put_long(buf, schema["symbols"].index(value))
    if t == "fixed":
        reg.register(schema)
        return buf.write(value)
    if t == "array":
        if value:
            _put_long(buf, len(value))
            for item in value:
                encode_value(schema["items"], item, buf, reg)
        _put_long(buf, 0)
        return
    if t == "map":
        if value:
            _put_long(buf, len(value))
            for k, v in value.items():
                _put_bytes(buf, k.encode())
                encode_value(schema["values"], v, buf, reg)
        _put_long(buf, 0)
        return
    if isinstance(t, (dict, list)):
        return encode_value(t, value, buf, reg)
    raise ValueError(f"unsupported Avro type {t!r}")


def _matches(branch, value, reg: _Schemas) -> bool:
    t = branch if isinstance(branch, str) else branch.get("type")
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, bytes)
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    if t == "enum":
        return isinstance(value, str)
    return True


def _encode_primitive(t: str, value, buf):
    if t == "null":
        return
    if t == "boolean":
        return buf.write(b"\x01" if value else b"\x00")
    if t in ("int", "long"):
        return _put_long(buf, int(value))
    if t == "float":
        return buf.write(struct.pack("<f", float(value)))
    if t == "double":
        return buf.write(struct.pack("<d", float(value)))
    if t == "bytes":
        return _put_bytes(buf, value)
    if t == "string":
        return _put_bytes(buf, value.encode())
    raise ValueError(t)


# ------------------------------------------------------------ container file
def read_ocf(data: bytes) -> tuple[dict, list[dict]]:
    """Decode an Avro Object Container File → (schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    reg = _Schemas()
    records: list = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(decode_value(schema, bbuf, reg))
        if buf.read(16) != sync:
            raise ValueError("Avro sync marker mismatch (corrupt block)")
    return schema, records


def write_ocf(records: list, schema: dict, *, codec: str = "null",
              sync: Optional[bytes] = None) -> bytes:
    """Encode records into an Avro Object Container File (one block)."""
    reg = _Schemas()
    body = io.BytesIO()
    for r in records:
        encode_value(schema, r, body, reg)
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported Avro codec {codec!r}")
    sync = sync or b"\x00" * 16
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    _put_long(out, len(meta))
    for k, v in meta.items():
        _put_bytes(out, k.encode())
        _put_bytes(out, v)
    _put_long(out, 0)
    out.write(sync)
    _put_long(out, len(records))
    _put_long(out, len(block))
    out.write(block)
    out.write(sync)
    return out.getvalue()
