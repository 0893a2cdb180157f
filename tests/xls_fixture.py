"""Test-only BIFF8 .xls writer: builds a minimal-but-conformant OLE2
compound file ([MS-CFB]) holding a BIFF8 Workbook stream ([MS-XLS]) so
the reader can be exercised without any Excel dependency.  Emits the
record set real workbooks use: SST + LABELSST for strings, NUMBER / RK
for numerics, BOOLERR for booleans."""

from __future__ import annotations

import struct

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB,
                                    0x07CC, 0, 0))


def _sst(strings: list[str]) -> bytes:
    body = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        enc = s.encode("utf-16-le")
        body += struct.pack("<HB", len(s), 0x01) + enc
    return _rec(0x00FC, body)


def _rk_encode(v: int) -> int:
    return ((v & 0x3FFFFFFF) << 2) | 2  # integer RK


def write_xls(path: str, rows: list[list], sheet_name: str = "Sheet1",
              use_rk_for_ints: bool = True) -> None:
    strings: list[str] = []
    sidx: dict[str, int] = {}
    for r in rows:
        for v in r:
            if isinstance(v, str) and v not in sidx:
                sidx[v] = len(strings)
                strings.append(v)

    cell_recs = b""
    for ri, r in enumerate(rows):
        for ci, v in enumerate(r):
            if v is None:
                continue
            if isinstance(v, str):
                cell_recs += _rec(0x00FD, struct.pack(
                    "<HHHI", ri, ci, 0, sidx[v]))
            elif isinstance(v, bool):
                cell_recs += _rec(0x0205, struct.pack(
                    "<HHHBB", ri, ci, 0, int(v), 0))
            elif isinstance(v, int) and use_rk_for_ints \
                    and -(2 ** 29) < v < 2 ** 29:
                cell_recs += _rec(0x027E, struct.pack(
                    "<HHHI", ri, ci, 0, _rk_encode(v)))
            else:
                cell_recs += _rec(0x0203, struct.pack(
                    "<HHHd", ri, ci, 0, float(v)))
    sheet = _bof(0x0010) + cell_recs + _rec(0x000A, b"")

    name8 = sheet_name.encode("latin-1")
    # globals: BOF, BOUNDSHEET (lbPlyPos patched below), SST, EOF
    bs_payload = struct.pack("<IHBB", 0, 0, len(name8), 0x00) + name8
    globals_recs = (_bof(0x0005)
                    + _rec(0x0085, bs_payload)
                    + _sst(strings)
                    + _rec(0x000A, b""))
    lb_ply_pos = len(globals_recs)
    globals_recs = globals_recs.replace(
        struct.pack("<HH", 0x0085, len(bs_payload))
        + struct.pack("<I", 0),
        struct.pack("<HH", 0x0085, len(bs_payload))
        + struct.pack("<I", lb_ply_pos), 1)
    workbook = globals_recs + sheet

    # pad past the 4096-byte mini-stream cutoff: the stream then lives
    # in the regular FAT chain (trailing zeros sit after EOF records)
    if len(workbook) < 4096:
        workbook += b"\x00" * (4096 - len(workbook))
    if len(workbook) % 512:
        workbook += b"\x00" * (512 - len(workbook) % 512)
    n_stream = len(workbook) // 512

    # sectors: [0]=FAT, [1]=directory, [2..]=stream
    fat = [_FATSECT, _ENDOFCHAIN] + \
        [3 + i for i in range(n_stream - 1)] + [_ENDOFCHAIN]
    fat += [_FREESECT] * (128 - len(fat))
    fat_sect = struct.pack("<128I", *fat)

    def dirent(name: str, etype: int, start: int, size: int) -> bytes:
        n = (name + "\x00").encode("utf-16-le")
        e = bytearray(128)
        e[0:len(n)] = n
        struct.pack_into("<H", e, 64, len(n))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, _FREESECT, _FREESECT, _FREESECT)
        struct.pack_into("<IQ", e, 116, start, size)
        return bytes(e)

    directory = (dirent("Root Entry", 5, _ENDOFCHAIN, 0)
                 + dirent("Workbook", 2, 2, len(workbook))
                 + b"\x00" * 256)

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major (v3, 512B)
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<HH", header, 30, 9, 6)    # sector/mini powers
    struct.pack_into("<II", header, 44, 1, 1)    # n_fat, dir_start
    struct.pack_into("<III", header, 56, 4096, _ENDOFCHAIN, 0)
    struct.pack_into("<II", header, 68, _ENDOFCHAIN, 0)
    difat = [0] + [_FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)

    with open(path, "wb") as f:
        f.write(bytes(header) + fat_sect + directory + workbook)
