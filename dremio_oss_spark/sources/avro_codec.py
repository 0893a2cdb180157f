"""Minimal pure-Python Avro object-container-file codec.

Exists so the Iceberg metadata layer (`sources/iceberg.py`) can read real
manifest-list / manifest files — which the Avro spec stores as
object-container files — without an avro/fastavro dependency (absent in
this environment) or the spark-avro jar (not shipped with this distro).

Implements the public Avro 1.x binary encoding (avro.apache.org spec):
zigzag-varint ints/longs, length-prefixed bytes/strings, IEEE LE floats,
block-encoded arrays/maps, index-prefixed unions, field-ordered records,
and the container framing (magic, metadata map, sync markers, null or
deflate codec).  Decoding follows the file's embedded writer schema, so
field-id resolution rules are not needed — exactly how a generic Avro
datum reader works.

Scope: generic decode to dicts + a writer used for fixtures/tests.  The
metadata files this reads are KBs-to-MBs at any table scale — driver-side
parsing is the same plan-time cost every Iceberg reader pays.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# -- binary primitives ------------------------------------------------------
def _read_varint(buf: io.BufferedIOBase) -> int:
    shift, out = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("varint")
        v = b[0]
        out |= (v & 0x7F) << shift
        if not v & 0x80:
            break
        shift += 7
    return out


def _read_long(buf: io.BufferedIOBase) -> int:
    v = _read_varint(buf)
    return (v >> 1) ^ -(v & 1)


def _write_long(out: bytearray, n: int) -> None:
    # zigzag: python's arithmetic shift + xor yields the correct
    # non-negative encoding for any 64-bit value, no masking needed
    v = (n << 1) ^ (n >> 63)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


# -- schema-driven decode ---------------------------------------------------
class _Names:
    def __init__(self):
        self.types: dict[str, dict] = {}


def _decode(schema, buf: io.BufferedIOBase, names: _Names):
    if isinstance(schema, str):
        if schema in names.types:
            return _decode(names.types[schema], buf, names)
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) != b"\x00"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return buf.read(_read_long(buf))
        if t == "string":
            return buf.read(_read_long(buf)).decode("utf-8")
        raise ValueError(f"unknown type {t!r}")
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        return _decode(schema[idx], buf, names)
    t = schema["type"]
    if t == "record":
        if "name" in schema:
            names.types[schema["name"]] = schema
        return {
            f["name"]: _decode(f["type"], buf, names) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)  # block byte size, unused
                n = -n
            out.extend(_decode(schema["items"], buf, names) for _ in range(n))
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
                k = buf.read(_read_long(buf)).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
        return out
    if t == "enum":
        if "name" in schema:
            names.types[schema["name"]] = schema
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        if "name" in schema:
            names.types[schema["name"]] = schema
        return buf.read(schema["size"])
    return _decode(t, buf, names)  # {"type": "long", ...} wrapper


def read_avro_file(path: str) -> list[dict]:
    """Decode every record of an Avro object-container file."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro container file: {path}")
    meta = _decode({"type": "map", "values": "bytes"}, buf, _Names())
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    out: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        names = _Names()
        for _ in range(n):
            out.append(_decode(schema, bbuf, names))
        if buf.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return out


# -- schema-driven encode (fixture writer) ----------------------------------
def _encode(schema, val, out: bytearray, names: _Names) -> None:
    if isinstance(schema, str):
        if schema in names.types:
            return _encode(names.types[schema], val, out, names)
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if val else 0)
            return
        if t in ("int", "long"):
            _write_long(out, int(val))
            return
        if t == "float":
            out.extend(struct.pack("<f", float(val)))
            return
        if t == "double":
            out.extend(struct.pack("<d", float(val)))
            return
        if t == "bytes":
            _write_long(out, len(val))
            out.extend(val)
            return
        if t == "string":
            b = val.encode("utf-8")
            _write_long(out, len(b))
            out.extend(b)
            return
        raise ValueError(f"unknown type {t!r}")
    if isinstance(schema, list):  # union: first branch whose type fits
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if val is None and bt == "null":
                _write_long(out, i)
                return
            if val is not None and bt != "null":
                _write_long(out, i)
                _encode(branch, val, out, names)
                return
        raise ValueError("no matching union branch")
    t = schema["type"]
    if t == "record":
        if "name" in schema:
            names.types[schema["name"]] = schema
        for f in schema["fields"]:
            _encode(f["type"], val[f["name"]], out, names)
        return
    if t == "array":
        if val:
            _write_long(out, len(val))
            for x in val:
                _encode(schema["items"], x, out, names)
        _write_long(out, 0)
        return
    if t == "map":
        if val:
            _write_long(out, len(val))
            for k, v in val.items():
                kb = k.encode("utf-8")
                _write_long(out, len(kb))
                out.extend(kb)
                _encode(schema["values"], v, out, names)
        _write_long(out, 0)
        return
    raise ValueError(f"cannot encode {t!r}")


def write_avro_file(path: str, schema: dict, records: list[dict]) -> None:
    """Write an object-container file (null codec) — fixture writer."""
    out = bytearray()
    out.extend(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8")}
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        _write_long(out, len(kb))
        out.extend(kb)
        _write_long(out, len(v))
        out.extend(v)
    _write_long(out, 0)
    sync = b"\x00" * 16
    out.extend(sync)
    body = bytearray()
    names = _Names()
    for r in records:
        _encode(schema, r, body, names)
    _write_long(out, len(records))
    _write_long(out, len(body))
    out.extend(body)
    out.extend(sync)
    with open(path, "wb") as f:
        f.write(bytes(out))
