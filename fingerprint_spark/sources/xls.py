"""Legacy .xls (BIFF8) byte codec — stdlib only.

Reference: src/document/xlsx.rs:12-21 — calamine's ``open_workbook_auto``
accepts BOTH .xlsx and legacy .xls; round 2 routed .xls bytes to the
zip codec, which refused them (E_PARSE). This module closes that gap
from the public specs:

- MS-CFB: the OLE2 compound-file container (512-byte sectors, FAT
  chains, miniFAT/ministream for streams under the 4096-byte cutoff,
  directory entries) -> the ``Workbook`` stream.
- BIFF8 (MS-XLS): workbook-globals substream (BOUNDSHEET sheet
  directory, SST shared strings incl. CONTINUE-record splits) and
  per-sheet substreams (LABELSST / LABEL / NUMBER / RK / MULRK /
  BOOLERR cells).
- BIFF5 (the 'Book' stream calamine also accepts): minimal read —
  ANSI BOUNDSHEET names + inline LABEL byte strings (decoded latin-1;
  CODEPAGE not honored — documented subset limit), numeric records
  shared with BIFF8. Encrypted workbooks are refused with a clear
  ValueError (the E_PARSE skip path).

Output shape = the engine's grid model (dict[sheet] -> dense row-major
grid of strings), identical to xlsx.py / csv — the whole spreadsheet
assertion family runs unchanged on .xls bytes.

``make_xls`` writes a REAL minimal CFB+BIFF8 workbook for fixtures
(ministream when small, FAT stream when large), so tests feed genuine
legacy bytes through the same reader a real corpus would.
"""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD


# ---------------------------------------------------------------------------
# CFB container (MS-CFB)
# ---------------------------------------------------------------------------


def _read_chain(payload: bytes, fat: list[int], start: int, ssz: int) -> bytes:
    out = bytearray()
    sec = start
    seen = 0
    while sec != _ENDOFCHAIN and sec != _FREESECT:
        off = 512 + sec * ssz
        out += payload[off : off + ssz]
        if sec >= len(fat):
            raise ValueError("cfb: chain walks off the FAT")
        sec = fat[sec]
        seen += 1
        if seen > len(fat) + 1:
            raise ValueError("cfb: FAT chain cycle")
    return bytes(out)


def cfb_streams(payload: bytes) -> dict[str, bytes]:
    """CFB bytes -> {stream_name: stream_bytes} (top-level streams)."""
    if not payload.startswith(CFB_MAGIC):
        raise ValueError("not a compound file (bad magic)")
    if len(payload) < 512:
        raise ValueError("cfb: truncated header")
    ssz = 1 << struct.unpack("<H", payload[30:32])[0]
    mssz = 1 << struct.unpack("<H", payload[32:34])[0]
    n_fat = struct.unpack("<I", payload[44:48])[0]
    first_dir = struct.unpack("<I", payload[48:52])[0]
    mini_cutoff = struct.unpack("<I", payload[56:60])[0]
    first_minifat = struct.unpack("<I", payload[60:64])[0]
    n_minifat = struct.unpack("<I", payload[64:68])[0]
    first_difat = struct.unpack("<I", payload[68:72])[0]
    # DIFAT: 109 header entries + optional DIFAT sector chain
    difat = list(struct.unpack("<109I", payload[76:512]))
    sec = first_difat
    while sec not in (_ENDOFCHAIN, _FREESECT):
        off = 512 + sec * ssz
        ents = struct.unpack(f"<{ssz // 4}I", payload[off : off + ssz])
        difat.extend(ents[:-1])
        sec = ents[-1]
    fat: list[int] = []
    for s in difat[:n_fat]:
        if s in (_FREESECT, _ENDOFCHAIN):
            continue
        off = 512 + s * ssz
        fat.extend(struct.unpack(f"<{ssz // 4}I", payload[off : off + ssz]))

    directory = _read_chain(payload, fat, first_dir, ssz)
    entries = []
    for i in range(0, len(directory), 128):
        e = directory[i : i + 128]
        if len(e) < 128:
            break
        name_len = struct.unpack("<H", e[64:66])[0]
        if name_len == 0:
            continue
        name = e[: max(0, name_len - 2)].decode("utf-16le", "replace")
        otype = e[66]
        start = struct.unpack("<I", e[116:120])[0]
        size = struct.unpack("<Q", e[120:128])[0]
        entries.append((name, otype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    minifat: list[int] = []
    ministream = b""
    if root is not None and n_minifat and first_minifat not in (
        _ENDOFCHAIN, _FREESECT,
    ):
        mf = _read_chain(payload, fat, first_minifat, ssz)
        minifat = list(struct.unpack(f"<{len(mf) // 4}I", mf))
        ministream = _read_chain(payload, fat, root[2], ssz)

    streams: dict[str, bytes] = {}
    for name, otype, start, size in entries:
        if otype != 2:  # stream objects only
            continue
        if size < mini_cutoff and minifat:
            out = bytearray()
            sec = start
            seen = 0
            while sec not in (_ENDOFCHAIN, _FREESECT):
                out += ministream[sec * mssz : (sec + 1) * mssz]
                if sec >= len(minifat):
                    raise ValueError("cfb: mini chain walks off the miniFAT")
                sec = minifat[sec]
                seen += 1
                if seen > len(minifat) + 1:
                    raise ValueError("cfb: miniFAT chain cycle")
            streams[name] = bytes(out[:size])
        else:
            streams[name] = _read_chain(payload, fat, start, ssz)[:size]
    return streams


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------

_R_BOF = 0x0809
_R_EOF = 0x000A
_R_BOUNDSHEET = 0x0085
_R_SST = 0x00FC
_R_CONTINUE = 0x003C
_R_LABELSST = 0x00FD
_R_LABEL = 0x0204
_R_NUMBER = 0x0203
_R_RK = 0x027E
_R_MULRK = 0x00BD
_R_BOOLERR = 0x0205
_R_FILEPASS = 0x002F


def _records(stream: bytes):
    """Yield (record_id, offset_of_data, data)."""
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        rid, rlen = struct.unpack("<HH", stream[pos : pos + 4])
        data = stream[pos + 4 : pos + 4 + rlen]
        yield rid, pos, data
        pos += 4 + rlen


class _SSTCursor:
    """Reader over SST + CONTINUE payload chunks. BIFF8 strings may
    split at any chunk boundary; a split inside CHARACTER DATA restarts
    with a fresh option-flags byte on the next chunk."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.chunks[self.ci]) - self.pos

    def _advance_chunk(self) -> bool:
        if self.ci + 1 >= len(self.chunks):
            return False
        self.ci += 1
        self.pos = 0
        return True

    def read_raw(self, n: int) -> bytes:
        """n bytes of NON-character data (lengths/counts never restate
        flags across a boundary)."""
        out = bytearray()
        while n:
            if self._remaining() == 0 and not self._advance_chunk():
                raise ValueError("sst: truncated")
            take = min(n, self._remaining())
            c = self.chunks[self.ci]
            out += c[self.pos : self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read_raw(2))[0]
        flags = self.read_raw(1)[0]
        rich = (flags & 0x08) != 0
        ext = (flags & 0x04) != 0
        n_rich = struct.unpack("<H", self.read_raw(2))[0] if rich else 0
        n_ext = struct.unpack("<I", self.read_raw(4))[0] if ext else 0
        wide = (flags & 0x01) != 0
        out = []
        left = cch
        while left:
            if self._remaining() == 0:
                if not self._advance_chunk():
                    raise ValueError("sst: truncated string")
                # continuation restates the high-byte flag
                wide = (self.read_raw(1)[0] & 0x01) != 0
            avail = self._remaining()
            width = 2 if wide else 1
            take = min(left, avail // width)
            if take == 0:
                # a wide char split across the boundary: pull 2 raw bytes
                out.append(self.read_raw(2).decode("utf-16le", "replace"))
                left -= 1
                continue
            raw = self.chunks[self.ci][self.pos : self.pos + take * width]
            self.pos += take * width
            out.append(raw.decode("utf-16le" if wide else "latin-1", "replace"))
            left -= take
        if n_rich:
            self.read_raw(4 * n_rich)
        if n_ext:
            self.read_raw(n_ext)
        return "".join(out)


def _short_string(data: bytes, pos: int) -> str:
    """BIFF8 short unicode string (8-bit length) — BOUNDSHEET names."""
    cch = data[pos]
    wide = data[pos + 1] & 0x01
    raw = data[pos + 2 : pos + 2 + cch * (2 if wide else 1)]
    return raw.decode("utf-16le" if wide else "latin-1", "replace")


def _rk_value(rk: int) -> float:
    mul100 = rk & 0x01
    as_int = rk & 0x02
    if as_int:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend 30 bits
            v -= 0x40000000
        val = float(v)
    else:
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return val / 100.0 if mul100 else val


def _num_text(v: float) -> str:
    """Float -> verbatim-style text matching the xlsx codec's numbers."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def xls_to_sheets(payload: bytes) -> dict[str, list[list[str]]]:
    """Legacy .xls bytes -> {sheet_name: dense grid of strings}. BIFF8
    ('Workbook' stream, unicode SST) and minimal BIFF5 ('Book' stream:
    inline LABEL byte strings decoded latin-1 — the CODEPAGE record is
    not honored, a documented subset limit — plus the shared NUMBER/RK/
    MULRK/BOOLERR handlers; calamine reads BIFF5 too,
    src/document/xlsx.rs:12-21). Raises ValueError on non-CFB /
    encrypted input (E_PARSE path)."""
    streams = cfb_streams(payload)
    wb = streams.get("Workbook")
    biff5 = False
    if wb is None:
        wb = streams.get("Book")
        if wb is None:
            raise ValueError("not an xls (no Workbook stream)")
        biff5 = True

    # workbook-globals pass: sheet directory + shared strings
    bounds: list[tuple[int, str]] = []
    sst: list[str] = []
    sst_chunks: list[bytes] | None = None
    depth = 0
    for rid, _off, data in _records(wb):
        if sst_chunks is not None and rid != _R_CONTINUE:
            cur = _SSTCursor(sst_chunks)
            n_unique = struct.unpack("<I", cur.read_raw(4))[0]
            for _ in range(n_unique):
                sst.append(cur.read_string())
            sst_chunks = None
        if rid == _R_BOF:
            depth += 1
            if depth > 1:
                break  # first sheet substream reached
        elif rid == _R_EOF:
            depth -= 1
            if depth <= 0:
                break
        elif rid == _R_FILEPASS:
            raise ValueError("encrypted .xls not supported")
        elif rid == _R_BOUNDSHEET:
            pos = struct.unpack("<I", data[0:4])[0]
            if biff5:
                # BIFF5 name: cch(1) + ANSI bytes (no unicode flag)
                cch = data[6]
                name5 = data[7 : 7 + cch].decode("latin-1", "replace")
                bounds.append((pos, name5))
            else:
                bounds.append((pos, _short_string(data, 6)))
        elif rid == _R_SST:
            sst_chunks = [data[4:]]  # skip cstTotal; keep cstUnique+strings
            # cstUnique lives at data[4:8] — kept inside the cursor
        elif rid == _R_CONTINUE and sst_chunks is not None:
            sst_chunks.append(data)

    sheets: dict[str, list[list[str]]] = {}
    for pos, name in bounds:
        cells: dict[tuple[int, int], str] = {}
        max_r = max_c = -1

        def put(r: int, c: int, v: str):
            nonlocal max_r, max_c
            cells[(r, c)] = v
            max_r = max(max_r, r)
            max_c = max(max_c, c)

        for rid, _off, data in _records(wb[pos:]):
            if rid == _R_EOF:
                break
            if rid == _R_LABELSST:
                r, c, _xf, idx = struct.unpack("<HHHI", data[:10])
                if idx >= len(sst):
                    # corrupt workbook: surface E_PARSE (ValueError
                    # contract), never fabricate cell text from the index
                    raise ValueError(
                        f"xls: SST index {idx} out of range ({len(sst)})"
                    )
                put(r, c, sst[idx])
            elif rid == _R_LABEL:
                r, c = struct.unpack("<HH", data[:4])
                if biff5:
                    # BIFF5 inline string: cch(2) + ANSI bytes
                    (cch,) = struct.unpack("<H", data[6:8])
                    put(r, c, data[8 : 8 + cch].decode("latin-1", "replace"))
                else:
                    cur = _SSTCursor([data[6:]])
                    put(r, c, cur.read_string())
            elif rid == _R_NUMBER:
                r, c, _xf = struct.unpack("<HHH", data[:6])
                (v,) = struct.unpack("<d", data[6:14])
                put(r, c, _num_text(v))
            elif rid == _R_RK:
                r, c, _xf, rk = struct.unpack("<HHHI", data[:10])
                put(r, c, _num_text(_rk_value(rk)))
            elif rid == _R_MULRK:
                r, c0 = struct.unpack("<HH", data[:4])
                n = (len(data) - 6) // 6
                for i in range(n):
                    (rk,) = struct.unpack(
                        "<I", data[4 + 6 * i + 2 : 4 + 6 * i + 6]
                    )
                    put(r, c0 + i, _num_text(_rk_value(rk)))
            elif rid == _R_BOOLERR:
                r, c, _xf, v, is_err = struct.unpack("<HHHBB", data[:8])
                if not is_err:
                    put(r, c, "TRUE" if v else "FALSE")
        grid = (
            [
                [cells.get((r, c), "") for c in range(max_c + 1)]
                for r in range(max_r + 1)
            ]
            if max_r >= 0
            else []
        )
        sheets[name] = grid
    return sheets


# ---------------------------------------------------------------------------
# fixture writer: real CFB + BIFF8 bytes
# ---------------------------------------------------------------------------


def _biff_rec(rid: int, data: bytes) -> bytes:
    return struct.pack("<HH", rid, len(data)) + data


def _biff_workbook(sheets: dict[str, list[list[str]]]) -> bytes:
    """Minimal BIFF8 Workbook stream: globals (BOUNDSHEETs + SST) then
    one substream per sheet with LABELSST / NUMBER cells."""
    strings: list[str] = []
    str_idx: dict[str, int] = {}

    def intern(s: str) -> int:
        if s not in str_idx:
            str_idx[s] = len(strings)
            strings.append(s)
        return str_idx[s]

    sheet_cells = []
    for grid in sheets.values():
        recs = bytearray()
        for r, row in enumerate(grid):
            for c, v in enumerate(row):
                if v == "":
                    continue
                try:
                    num = float(v)
                    is_num = v.strip() == v and v != ""
                except ValueError:
                    num, is_num = 0.0, False
                if is_num:
                    recs += _biff_rec(
                        _R_NUMBER, struct.pack("<HHHd", r, c, 15, num)
                    )
                else:
                    recs += _biff_rec(
                        _R_LABELSST,
                        struct.pack("<HHHI", r, c, 15, intern(v)),
                    )
        sheet_cells.append(bytes(recs))

    def uni(s: str) -> bytes:
        raw = s.encode("latin-1", "strict") if all(ord(ch) < 256 for ch in s) else None
        if raw is not None:
            return struct.pack("<HB", len(s), 0) + raw
        return struct.pack("<HB", len(s), 1) + s.encode("utf-16le")

    # real BIFF caps record payloads at 8224 bytes: split the string
    # table into SST + CONTINUE records at string boundaries (legal per
    # MS-XLS; also exercises the reader's continuation cursor)
    sst_parts: list[bytes] = []
    cur = bytearray(struct.pack("<II", len(strings), len(strings)))
    for s in strings:
        enc = uni(s)
        if len(cur) + len(enc) > 8000 and len(cur) > 8:
            sst_parts.append(bytes(cur))
            cur = bytearray()
        cur += enc
    sst_parts.append(bytes(cur))

    bof_globals = _biff_rec(
        _R_BOF, struct.pack("<HHHIII", 0x0600, 0x0005, 0x0DBB, 0, 0, 0)
    )
    bof_sheet = struct.pack("<HHHIII", 0x0600, 0x0010, 0x0DBB, 0, 0, 0)
    eof = _biff_rec(_R_EOF, b"")

    sst_recs = _biff_rec(_R_SST, sst_parts[0]) + b"".join(
        _biff_rec(_R_CONTINUE, p) for p in sst_parts[1:]
    )

    # layout: globals size depends on BOUNDSHEET positions -> fixed-point
    # (names are fixed-size, positions are u32 — one extra pass settles)
    names = list(sheets)
    bs_recs_len = sum(
        4 + 4 + 2 + 2 + len(n.encode("latin-1", "replace")) for n in names
    )
    globals_len = len(bof_globals) + bs_recs_len + len(sst_recs) + len(eof)
    positions = []
    pos = globals_len
    for cells in sheet_cells:
        positions.append(pos)
        pos += len(_biff_rec(_R_BOF, bof_sheet)) + len(cells) + len(eof)

    out = bytearray(bof_globals)
    for n, p in zip(names, positions):
        nm = n.encode("latin-1", "replace")
        out += _biff_rec(
            _R_BOUNDSHEET,
            struct.pack("<IHBB", p, 0, len(n), 0) + nm,
        )
    out += sst_recs
    out += eof
    for cells in sheet_cells:
        out += _biff_rec(_R_BOF, bof_sheet) + cells + eof
    return bytes(out)


def _biff_workbook5(sheets: dict[str, list[list[str]]]) -> bytes:
    """Minimal BIFF5 Book stream: globals (ANSI BOUNDSHEETs, no SST)
    then one substream per sheet with inline LABEL / NUMBER cells."""
    sheet_cells = []
    for grid in sheets.values():
        recs = bytearray()
        for r, row in enumerate(grid):
            for c, v in enumerate(row):
                if v == "":
                    continue
                try:
                    num = float(v)
                    is_num = v.strip() == v and v != ""
                except ValueError:
                    num, is_num = 0.0, False
                if is_num:
                    recs += _biff_rec(
                        _R_NUMBER, struct.pack("<HHHd", r, c, 15, num)
                    )
                else:
                    raw = v.encode("latin-1", "replace")
                    recs += _biff_rec(
                        _R_LABEL,
                        struct.pack("<HHHH", r, c, 15, len(raw)) + raw,
                    )
        sheet_cells.append(bytes(recs))

    bof_globals = _biff_rec(
        _R_BOF, struct.pack("<HHHH", 0x0500, 0x0005, 0x0DBB, 0x07CC)
    )
    bof_sheet = struct.pack("<HHHH", 0x0500, 0x0010, 0x0DBB, 0x07CC)
    eof = _biff_rec(_R_EOF, b"")

    names = list(sheets)
    bs_recs_len = sum(
        4 + 4 + 2 + 1 + len(n.encode("latin-1", "replace")) for n in names
    )
    globals_len = len(bof_globals) + bs_recs_len + len(eof)
    positions = []
    pos = globals_len
    for cells in sheet_cells:
        positions.append(pos)
        pos += len(_biff_rec(_R_BOF, bof_sheet)) + len(cells) + len(eof)

    out = bytearray(bof_globals)
    for n, p in zip(names, positions):
        nm = n.encode("latin-1", "replace")
        out += _biff_rec(
            _R_BOUNDSHEET,
            struct.pack("<IHB", p, 0, len(nm)) + nm,
        )
    out += eof
    for cells in sheet_cells:
        out += _biff_rec(_R_BOF, bof_sheet) + cells + eof
    return bytes(out)


def _dir_entry(name: str, otype: int, start: int, size: int,
               child: int = _FREESECT) -> bytes:
    raw = name.encode("utf-16le") + b"\x00\x00"
    e = bytearray(128)
    e[: len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = otype
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, _FREESECT, _FREESECT, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def make_xls(
    sheets: dict[str, list[list[str]]], biff5: bool = False
) -> bytes:
    """{name: grid} -> REAL .xls bytes: BIFF8 (or, with biff5=True,
    BIFF5 with inline ANSI LABELs in a 'Book' stream) inside a v3 CFB
    container (ministream when the workbook stream is under the 4096
    cutoff — the layout real small .xls files use)."""
    stream = _biff_workbook5(sheets) if biff5 else _biff_workbook(sheets)
    use_mini = len(stream) < 4096

    sectors: list[bytes] = []

    def pad512(b: bytes) -> list[bytes]:
        out = []
        for i in range(0, len(b), 512):
            out.append(b[i : i + 512].ljust(512, b"\x00"))
        return out or [b"\x00" * 512]

    fat: list[int] = []

    def add(chunks: list[bytes]) -> tuple[int, int]:
        """Append a chain; return (first_sector, last_sector)."""
        first = len(sectors)
        for j, ch in enumerate(chunks):
            sectors.append(ch)
            fat.append(len(sectors) if j < len(chunks) - 1 else _ENDOFCHAIN)
        return first, len(sectors) - 1

    # sector 0: the FAT itself
    sectors.append(b"")  # placeholder
    fat.append(_FATSECT)

    if use_mini:
        mini = stream.ljust((len(stream) + 63) & ~63, b"\x00")
        n_mini = len(mini) // 64
        minifat_entries = [
            i + 1 if i < n_mini - 1 else _ENDOFCHAIN for i in range(n_mini)
        ]
        mf_bytes = b"".join(struct.pack("<I", v) for v in minifat_entries)
        minifat_first, _ = add(pad512(mf_bytes))
        ministream_first, _ = add(pad512(mini))
        wb_start, wb_dirsize = 0, len(stream)  # mini-sector 0
        root_start, root_size = ministream_first, len(mini)
        n_minifat_sectors = (len(mf_bytes) + 511) // 512
    else:
        wb_start, _ = add(pad512(stream))
        wb_dirsize = len(stream)
        root_start, root_size = _ENDOFCHAIN, 0
        minifat_first, n_minifat_sectors = _ENDOFCHAIN, 0

    directory = (
        _dir_entry("Root Entry", 5, root_start, root_size, child=1)
        + _dir_entry("Book" if biff5 else "Workbook", 2, wb_start, wb_dirsize)
        + b"\x00" * 256
    )
    dir_first, _ = add(pad512(directory))

    # finalize FAT (one sector is plenty: <=128 entries)
    if len(fat) > 128:
        raise ValueError("fixture workbook too large for single-FAT writer")
    fat_bytes = b"".join(
        struct.pack("<I", v) for v in fat + [_FREESECT] * (128 - len(fat))
    )
    sectors[0] = fat_bytes

    header = bytearray(512)
    header[0:8] = CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major v3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)       # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)       # 64-byte mini sectors
    struct.pack_into("<I", header, 44, 1)       # one FAT sector
    struct.pack_into("<I", header, 48, dir_first)
    struct.pack_into("<I", header, 56, 4096)    # mini cutoff
    struct.pack_into("<I", header, 60, minifat_first)
    struct.pack_into("<I", header, 64, n_minifat_sectors)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [0] + [_FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + b"".join(sectors)
