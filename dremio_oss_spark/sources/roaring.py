"""Roaring bitmap codec for Delta deletion vectors (pure Python).

Delta Lake's merge-on-read DELETE stores deleted ROW INDEXES per data
file as a serialized `RoaringBitmapArray` (delta.io PROTOCOL.md,
"Deletion Vectors"; bitmap layout per the public RoaringFormatSpec).
This module implements the subset needed to read and write them:

- 64-bit positions are split (high32 = bitmap index, low32 = value) —
  the RoaringBitmapArray "portable" layout: 4-byte LE magic, 8-byte LE
  bitmap count, then each 32-bit bitmap in the standard portable
  RoaringBitmap serialization.
- Each 32-bit bitmap: LE cookie (12346 = no run containers — the only
  kind this encoder emits; the decoder also accepts 12347 with run
  containers), per-container key/cardinality headers, optional offset
  table, then array (≤4096 values, uint16s) or bitset (1024 uint64
  words) containers.  Run containers decode to ranges.

Everything here is self-describing bytes — no bitmap library in the
container, and the decoder handles externally-produced files'
run-container form.
"""

from __future__ import annotations

import struct

MAGIC = 1681511377  # RoaringBitmapArray portable magic
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_ARRAY_MAX = 4096


def _decode_rbm32(buf: bytes, off: int) -> tuple[list[int], int]:
    """One standard portable 32-bit RoaringBitmap at `off` ->
    (sorted values, next offset)."""
    (cookie,) = struct.unpack_from("<i", buf, off)
    off += 4
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        runbits = buf[off:off + nbytes]
        off += nbytes

        def has_run(i: int) -> bool:
            return bool((runbits[i // 8] >> (i % 8)) & 1)

        has_offsets = n >= 4
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, off)
        off += 4

        def has_run(i: int) -> bool:
            return False

        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys, cards = [], []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", buf, off)
        keys.append(k)
        cards.append(c + 1)
        off += 4
    if has_offsets:
        off += 4 * n  # sequential read; offsets unused
    vals: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        if has_run(i):
            (nruns,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(nruns):
                s, ln = struct.unpack_from("<HH", buf, off)
                off += 4
                vals.extend(range(base + s, base + s + ln + 1))
        elif cards[i] <= _ARRAY_MAX:
            vals.extend(
                base + v for v in
                struct.unpack_from(f"<{cards[i]}H", buf, off))
            off += 2 * cards[i]
        else:
            words = struct.unpack_from("<1024Q", buf, off)
            off += 8192
            for wi, w in enumerate(words):
                wbase = base + wi * 64
                while w:
                    b = (w & -w).bit_length() - 1
                    vals.append(wbase + b)
                    w &= w - 1
    return vals, off


def _encode_rbm32(values: list[int]) -> bytes:
    """Sorted uint32 values -> standard portable serialization
    (cookie 12346: array/bitset containers only, offset table present)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = [struct.pack("<ii", _COOKIE_NO_RUN, len(keys))]
    for k in keys:
        out.append(struct.pack("<HH", k, len(containers[k]) - 1))
    # offset table: container payload positions from the stream start
    header = 8 + 4 * len(keys) + 4 * len(keys)
    offsets, pos = [], header
    payloads = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            payload = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payload = struct.pack("<1024Q", *words)
        offsets.append(pos)
        pos += len(payload)
        payloads.append(payload)
    out.extend(struct.pack("<i", o) for o in offsets)
    out.extend(payloads)
    return b"".join(out)


def decode_rbm_array(buf: bytes) -> list[int]:
    """Serialized RoaringBitmapArray -> sorted 64-bit positions."""
    (magic,) = struct.unpack_from("<i", buf, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    (n,) = struct.unpack_from("<q", buf, 4)
    off = 12
    out: list[int] = []
    for i in range(n):
        vals, off = _decode_rbm32(buf, off)
        hi = i << 32
        out.extend(hi | v for v in vals)
    return out


def encode_rbm_array(positions: list[int]) -> bytes:
    """Sorted (or not) 64-bit positions -> serialized RoaringBitmapArray."""
    by_hi: dict[int, set[int]] = {}
    for p in positions:
        by_hi.setdefault(p >> 32, set()).add(p & 0xFFFFFFFF)
    n = (max(by_hi) + 1) if by_hi else 0
    parts = [struct.pack("<iq", MAGIC, n)]
    for i in range(n):
        parts.append(_encode_rbm32(sorted(by_hi.get(i, []))))
    return b"".join(parts)
