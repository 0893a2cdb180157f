"""Minimal legacy Excel (.xls) reader: OLE2 compound file + BIFF8.

Reference: dremio-oss reads BOTH Excel formats through POI
(`exec/store/easy/excel/ExcelRecordReader.java:43`); the container has
no POI/xlrd equivalent, so this implements the two PUBLIC
specifications directly:

- [MS-CFB]: the OLE2 Compound File Binary container — sector FAT,
  directory tree, mini-stream for small streams.
- [MS-XLS]: the BIFF8 record stream — BOF/BOUNDSHEET globals, the SST
  shared-string table (with CONTINUE-record splits), and the cell
  records LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR / FORMULA
  (cached numeric result).

Scope matches the engine's Excel surface: first (or named) worksheet,
cells as python values; formatting, charts, and formulas' text are out
of scope.  Files are workbook-sized (MBs), parsed on the driver like
every other easy-format reader.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE


def _chain(data: bytes, fat: list[int], start: int, sect_size: int,
           offset: int) -> bytes:
    """Follow a FAT chain from `start`, concatenating sectors."""
    out = bytearray()
    s = start
    seen = 0
    while s != _ENDOFCHAIN and s != _FREESECT:
        pos = offset + s * sect_size
        out += data[pos:pos + sect_size]
        s = fat[s]
        seen += 1
        if seen > len(fat) + 1:
            raise ValueError("cyclic FAT chain")
    return bytes(out)


def _read_cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name is in `names`."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    sect_pow, mini_pow = struct.unpack_from("<HH", data, 30)
    sect_size, mini_size = 1 << sect_pow, 1 << mini_pow
    n_fat, dir_start = struct.unpack_from("<II", data, 44)
    mini_cutoff, minifat_start, n_minifat = struct.unpack_from(
        "<III", data, 56)
    difat_start, n_difat = struct.unpack_from("<II", data, 68)

    # DIFAT: 109 entries in the header, then chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    s = difat_start
    for _ in range(n_difat):
        pos = (s + 1) * sect_size  # v3 and v4 sector addressing
        entries = struct.unpack_from(f"<{sect_size // 4}I", data, pos)
        difat += entries[:-1]
        s = entries[-1]
    fat: list[int] = []
    for fs in difat:
        if fs in (_FREESECT, _ENDOFCHAIN):
            continue
        pos = (fs + 1) * sect_size
        fat += struct.unpack_from(f"<{sect_size // 4}I", data, pos)

    directory = _chain(data, fat, dir_start, sect_size, sect_size)
    root_start = root_size = None
    target = None
    for off in range(0, len(directory), 128):
        entry = directory[off:off + 128]
        if len(entry) < 128:
            break
        name_len = struct.unpack_from("<H", entry, 64)[0]
        if name_len < 2:
            continue
        name = entry[:name_len - 2].decode("utf-16-le", "replace")
        etype = entry[66]
        start, size = struct.unpack_from("<IQ", entry, 116)
        if etype == 5:  # root: holds the mini-stream container
            root_start, root_size = start, size
        elif etype == 2 and name in names and target is None:
            target = (start, size)
    if target is None:
        raise ValueError(f"no stream named {names} in compound file")
    start, size = target
    if size >= mini_cutoff:
        return _chain(data, fat, start, sect_size, sect_size)[:size]
    # small stream: bytes live in the ROOT entry's mini-stream,
    # chained through the miniFAT in 64-byte mini sectors
    minifat_raw = _chain(data, fat, minifat_start, sect_size, sect_size)
    minifat = list(struct.unpack_from(
        f"<{len(minifat_raw) // 4}I", minifat_raw))
    container = _chain(data, fat, root_start, sect_size, sect_size)[:root_size]
    out = bytearray()
    s = start
    seen = 0
    while s != _ENDOFCHAIN and s != _FREESECT:
        out += container[s * mini_size:(s + 1) * mini_size]
        s = minifat[s]
        seen += 1
        if seen > len(minifat) + 1:  # corrupt/crafted miniFAT
            raise ValueError("cyclic miniFAT chain")
    return bytes(out[:size])


def _rk_value(rk: int) -> float | int:
    """Decode an RK-compressed number ([MS-XLS] 2.5.198.112)."""
    f100 = rk & 1
    fint = rk & 2
    if fint:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend 30 bits
            v -= 0x40000000
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0]
    if f100:
        v = v / 100
        if fint and float(v).is_integer():
            v = int(v)
    return v


class _Records:
    """Iterator over BIFF records with CONTINUE-aware payload reads."""

    def __init__(self, stream: bytes, pos: int = 0):
        self.stream = stream
        self.pos = pos

    def __iter__(self):
        while self.pos + 4 <= len(self.stream):
            op, ln = struct.unpack_from("<HH", self.stream, self.pos)
            data = self.stream[self.pos + 4:self.pos + 4 + ln]
            self.pos += 4 + ln
            yield op, data
            if op == 0x000A:  # EOF of this substream
                return


def _read_unicode_str(buf: bytes, off: int,
                      len16: bool = True) -> tuple[str, int]:
    """XLUnicodeString: [cch][grbit][chars]; returns (text, next_off)."""
    if len16:
        cch = struct.unpack_from("<H", buf, off)[0]
        off += 2
    else:
        cch = buf[off]
        off += 1
    grbit = buf[off]
    off += 1
    # [MS-XLS] header after grbit: [cRun:2 if fRichSt][cbExtRst:4 if fExtSt]
    crun = 0
    ext = 0
    if grbit & 0x08:
        crun = struct.unpack_from("<H", buf, off)[0]
        off += 2
    if grbit & 0x04:
        ext = struct.unpack_from("<I", buf, off)[0]
        off += 4
    if grbit & 0x01:
        text = buf[off:off + 2 * cch].decode("utf-16-le", "replace")
        off += 2 * cch
    else:
        text = buf[off:off + cch].decode("latin-1")
        off += cch
    off += crun * 4 + ext
    return text, off


def _parse_sst(parts: list[bytes]) -> list[str]:
    """The shared-string table, possibly split across CONTINUE records.
    Each CONTINUE restarts mid-string with a fresh grbit byte, so the
    parser walks strings across part boundaries explicitly."""
    strings: list[str] = []
    part_i, off = 0, 8  # skip cstTotal/cstUnique
    total = struct.unpack_from("<I", parts[0], 4)[0]

    def remaining() -> int:
        return len(parts[part_i]) - off

    def advance_part() -> None:
        nonlocal part_i, off
        part_i += 1
        off = 0

    while len(strings) < total and part_i < len(parts):
        if remaining() < 3:
            advance_part()
            continue
        buf = parts[part_i]
        cch = struct.unpack_from("<H", buf, off)[0]
        off += 2
        grbit = buf[off]
        off += 1
        crun = 0
        ext = 0
        if grbit & 0x08:
            crun = struct.unpack_from("<H", buf, off)[0]
            off += 2
        if grbit & 0x04:
            ext = struct.unpack_from("<I", buf, off)[0]
            off += 4
        chars: list[str] = []
        need = cch
        wide = bool(grbit & 0x01)
        while need > 0:
            buf = parts[part_i]
            avail = (len(buf) - off) // (2 if wide else 1)
            take = min(need, avail)
            raw = buf[off:off + take * (2 if wide else 1)]
            chars.append(raw.decode("utf-16-le" if wide else "latin-1",
                                    "replace"))
            off += take * (2 if wide else 1)
            need -= take
            if need > 0:
                advance_part()
                wide = bool(parts[part_i][off] & 0x01)
                off += 1
        strings.append("".join(chars))
        skip = crun * 4 + ext
        while skip > 0:
            if remaining() >= skip:
                off += skip
                skip = 0
            else:
                skip -= remaining()
                advance_part()
    return strings


def read_xls_rows(path: str, sheet: str | None = None) -> list[list]:
    """Parse a BIFF8 .xls workbook; returns the selected (default:
    first) worksheet as a dense list of rows."""
    with open(path, "rb") as f:
        data = f.read()
    wb = _read_cfb_stream(data, ("Workbook", "Book"))

    sheets: list[tuple[int, str]] = []  # (stream offset, name)
    sst: list[str] = []
    pending_sst: list[bytes] | None = None
    for op, rec in _Records(wb):
        if op == 0x00FC:  # SST
            pending_sst = [rec]
        elif op == 0x003C and pending_sst is not None:  # CONTINUE
            pending_sst.append(rec)
        elif pending_sst is not None:
            sst = _parse_sst(pending_sst)
            pending_sst = None
        if op == 0x0085:  # BOUNDSHEET
            pos = struct.unpack_from("<I", rec, 0)[0]
            name, _ = _read_unicode_str(rec, 6, len16=False)
            sheets.append((pos, name))
    if pending_sst is not None:
        sst = _parse_sst(pending_sst)
    if not sheets:
        raise ValueError(f"no worksheets in {path}")
    target = sheets[0]
    if sheet is not None:
        target = next((s for s in sheets if s[1] == sheet), None)
        if target is None:  # silent first-sheet fallback hid typos
            raise ValueError(f"no sheet named {sheet!r} in {path}")

    cells: dict[tuple[int, int], object] = {}
    for op, rec in _Records(wb, target[0]):
        if op == 0x00FD:  # LABELSST
            rw, col, _ixfe, isst = struct.unpack_from("<HHHI", rec, 0)
            cells[(rw, col)] = sst[isst] if isst < len(sst) else None
        elif op == 0x0203:  # NUMBER
            rw, col, _ixfe = struct.unpack_from("<HHH", rec, 0)
            cells[(rw, col)] = struct.unpack_from("<d", rec, 6)[0]
        elif op == 0x027E:  # RK
            rw, col, _ixfe, rk = struct.unpack_from("<HHHI", rec, 0)
            cells[(rw, col)] = _rk_value(rk)
        elif op == 0x00BD:  # MULRK
            rw, col_first = struct.unpack_from("<HH", rec, 0)
            col_last = struct.unpack_from("<H", rec, len(rec) - 2)[0]
            for i in range(col_last - col_first + 1):
                rk = struct.unpack_from("<I", rec, 4 + i * 6 + 2)[0]
                cells[(rw, col_first + i)] = _rk_value(rk)
        elif op == 0x0204:  # LABEL (inline string)
            rw, col, _ixfe = struct.unpack_from("<HHH", rec, 0)
            cells[(rw, col)], _ = _read_unicode_str(rec, 6)
        elif op == 0x0205:  # BOOLERR
            rw, col, _ixfe, v, is_err = struct.unpack_from(
                "<HHHBB", rec, 0)
            cells[(rw, col)] = None if is_err else bool(v)
        elif op == 0x0006:  # FORMULA: cached numeric result when plain
            rw, col, _ixfe = struct.unpack_from("<HHH", rec, 0)
            raw = rec[6:14]
            if raw[6:8] != b"\xff\xff":
                cells[(rw, col)] = struct.unpack("<d", raw)[0]
    if not cells:
        return []
    max_r = max(r for r, _ in cells)
    max_c = max(c for _, c in cells)
    return [[cells.get((r, c)) for c in range(max_c + 1)]
            for r in range(max_r + 1)]
