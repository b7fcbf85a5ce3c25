"""Legacy binary .xls (BIFF8) string-grid reader — stdlib only.

Parity target: the reference's LineParser reads .xls through its
spreadsheet extension (src/Transforms/LineParser.php:60-75); here the
format is decoded directly so the S7 claim needs no external reader:

- CFB/OLE2 compound container ([MS-CFB]): header → FAT via DIFAT →
  directory stream → the "Workbook" stream, with the mini-FAT path for
  streams under the 4096-byte cutoff (small real-world workbooks land
  in the mini stream).
- BIFF8 records ([MS-XLS]): SST (+CONTINUE) shared strings, the first
  worksheet via BOUNDSHEET, then LABELSST / LABEL / NUMBER / RK /
  MULRK cells until the sheet EOF.

Output matches parse_xlsx_bytes: (1-based row number, [cell strings])
pairs, sparse columns filled with "". Cached formula results and
everything style-related are ignored — this is a string GRID reader,
exactly the slice LineParser consumes (headLine/dataLine/endLine over
delimited-ish rows). Runs on executors inside the same binaryFile →
mapInPandas batch as the xlsx path (operators/line_parser.py).
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_MINI_CUTOFF = 4096


def _chain(fat: list[int], start: int) -> list[int]:
    """Walk a FAT/miniFAT chain with a cycle guard."""
    out, seen, s = [], set(), start
    while s not in (_ENDOFCHAIN, _FREESECT) and s < len(fat):
        if s in seen:
            raise ValueError("xls: cyclic sector chain")
        seen.add(s)
        out.append(s)
        s = fat[s]
    return out


def _cfb_stream(content: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name matches (CFB walk:
    header → DIFAT → FAT → directory; mini-FAT for small streams)."""
    if content[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2/CFB file (bad magic); modern .xlsx renamed to .xls?")
    sector_shift, mini_shift = struct.unpack_from("<HH", content, 30)
    ssz, msz = 1 << sector_shift, 1 << mini_shift
    n_fat, dir_start = struct.unpack_from("<II", content, 44)[0], struct.unpack_from("<I", content, 48)[0]
    minifat_start, n_minifat = struct.unpack_from("<II", content, 60)
    difat_start, n_difat = struct.unpack_from("<II", content, 68)

    def sector(i: int) -> bytes:
        # Sector 0 starts right after the header, which occupies one
        # full sector: offset (i+1)*ssz. For v3 (512-byte sectors)
        # that equals the familiar 512 + i*512; for v4 (4096-byte
        # sectors) the first sector is at 4096, not 512.
        off = (i + 1) * ssz
        return content[off : off + ssz]

    # DIFAT: 109 entries in the header, then chained DIFAT sectors.
    difat = list(struct.unpack_from("<109I", content, 76))
    s = difat_start
    for _ in range(n_difat):
        raw = sector(s)
        difat.extend(struct.unpack_from(f"<{ssz // 4 - 1}I", raw, 0))
        s = struct.unpack_from("<I", raw, ssz - 4)[0]
    fat: list[int] = []
    for fs in difat[:n_fat]:
        if fs == _FREESECT:
            break
        fat.extend(struct.unpack_from(f"<{ssz // 4}I", sector(fs), 0))

    directory = b"".join(sector(s) for s in _chain(fat, dir_start))
    entries = []
    for off in range(0, len(directory) - 127, 128):
        name_len = struct.unpack_from("<H", directory, off + 64)[0]
        name = directory[off : off + max(0, name_len - 2)].decode("utf-16-le", "replace")
        etype = directory[off + 66]
        start, size = struct.unpack_from("<IQ", directory, off + 116)
        entries.append((name, etype, start, size))
    if not entries or entries[0][1] != 5:
        raise ValueError("xls: missing CFB root entry")
    root_start = entries[0][2]

    for name, etype, start, size in entries:
        if etype == 2 and name in names:
            if size >= _MINI_CUTOFF:
                data = b"".join(sector(s) for s in _chain(fat, start))
            else:
                mini_fat: list[int] = []
                for fs in _chain(fat, minifat_start)[:n_minifat]:
                    mini_fat.extend(struct.unpack_from(f"<{ssz // 4}I", sector(fs), 0))
                mini_stream = b"".join(sector(s) for s in _chain(fat, root_start))
                data = b"".join(
                    mini_stream[s * msz : (s + 1) * msz] for s in _chain(mini_fat, start)
                )
            return data[:size]
    raise ValueError(f"xls: no {'/'.join(names)} stream in compound file")


def _records(stream: bytes, pos: int = 0):
    while pos + 4 <= len(stream):
        opcode, length = struct.unpack_from("<HH", stream, pos)
        yield opcode, pos + 4, length
        pos += 4 + length


def _unicode_string(buf: bytes, pos: int) -> tuple[str, int]:
    """XLUnicodeString ([MS-XLS] 2.5.294): cch, grbit, optional rich/ext
    headers, chars (8- or 16-bit), then rich runs / ext data skipped."""
    cch, grbit = struct.unpack_from("<HB", buf, pos)
    pos += 3
    c_run = cb_ext = 0
    if grbit & 0x08:  # fRichSt
        c_run = struct.unpack_from("<H", buf, pos)[0]
        pos += 2
    if grbit & 0x04:  # fExtSt
        cb_ext = struct.unpack_from("<i", buf, pos)[0]
        pos += 4
    if grbit & 0x01:  # fHighByte: UTF-16LE
        text = buf[pos : pos + 2 * cch].decode("utf-16-le", "replace")
        pos += 2 * cch
    else:  # compressed: low bytes of UTF-16
        text = buf[pos : pos + cch].decode("latin-1")
        pos += cch
    return text, pos + 4 * c_run + cb_ext


def _parse_sst(stream: bytes, pos: int, length: int) -> list[str]:
    """SST record + CONTINUEs. Strings may split across CONTINUE
    boundaries; a split resumes with a fresh grbit byte, so the spill
    is re-decoded with the continued width ([MS-XLS] 2.4.265)."""
    n_unique = struct.unpack_from("<I", stream, pos + 4)[0]
    # Collect the SST payload and each CONTINUE's payload separately —
    # offsets where a fresh grbit appears are block starts.
    blocks = [(pos + 8, length - 8)]
    nxt = pos + length
    for opcode, dpos, dlen in _records(stream, nxt):
        if opcode != 0x003C:
            break
        blocks.append((dpos, dlen))
    strings: list[str] = []
    bi, bpos = 0, blocks[0][0]
    bend = blocks[0][0] + blocks[0][1]

    def ensure_block() -> None:
        nonlocal bi, bpos, bend
        while bpos >= bend and bi + 1 < len(blocks):
            bi += 1
            bpos, bend = blocks[bi][0], blocks[bi][0] + blocks[bi][1]

    while len(strings) < n_unique:
        ensure_block()
        cch, grbit = struct.unpack_from("<HB", stream, bpos)
        bpos += 3
        c_run = cb_ext = 0
        if grbit & 0x08:
            c_run = struct.unpack_from("<H", stream, bpos)[0]
            bpos += 2
        if grbit & 0x04:
            cb_ext = struct.unpack_from("<i", stream, bpos)[0]
            bpos += 4
        chars: list[str] = []
        remaining = cch
        high = bool(grbit & 0x01)
        while remaining:
            # Character data resuming in a CONTINUE starts with a fresh
            # grbit byte ([MS-XLS] 2.5.294: the continued fragment may
            # switch width) — consume it HERE, explicitly; ensure_block
            # would advance past the boundary without eating it and the
            # grbit would decode as a character.
            if bpos >= bend or (bend - bpos) < (2 if high else 1):
                bi += 1
                bpos, bend = blocks[bi][0], blocks[bi][0] + blocks[bi][1]
                high = bool(stream[bpos] & 0x01)
                bpos += 1
            width = 2 if high else 1
            take = min(remaining, (bend - bpos) // width)
            raw = stream[bpos : bpos + take * width]
            chars.append(raw.decode("utf-16-le", "replace") if high else raw.decode("latin-1"))
            bpos += take * width
            remaining -= take
        # Rich-run / ExtRst payloads may themselves spill across a
        # CONTINUE; unlike character data they carry NO fresh grbit at
        # the boundary, so skip block-by-block — a flat `bpos += skip`
        # that overshoots the block end would get snapped to the next
        # block's START by ensure_block, silently desynchronizing every
        # following string.
        skip = 4 * c_run + cb_ext
        while skip:
            ensure_block()
            take = min(skip, bend - bpos)
            if take == 0:
                break  # malformed: ran out of CONTINUE data
            bpos += take
            skip -= take
        strings.append("".join(chars))
    return strings


def _rk_value(rk: int) -> float:
    if rk & 0x02:  # 30-bit signed integer
        v = float(rk >> 2 if rk >> 2 < (1 << 29) else (rk >> 2) - (1 << 30))
    else:  # high 30 bits of an IEEE double
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if rk & 0x01 else v


def _fmt_number(v: float) -> str:
    """Match the xlsx path's look: xlsx stores '3' / '9.5' as raw text;
    BIFF stores IEEE doubles — render integers without the '.0'.
    NaN/inf (corrupt or exotic cells) render as text instead of
    aborting the workbook (int(nan) raises)."""
    import math

    if not math.isfinite(v):
        return repr(v)
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)


def parse_xls_bytes(content: bytes, sheet_name: str | None = None) -> list[tuple[int, list[str]]]:
    """Decode one worksheet of a BIFF8 workbook into (1-based
    row_number, cells) pairs — the .xls twin of parse_xlsx_bytes.
    `sheet_name` selects by BOUNDSHEET name (reference LineParser's
    mandatory `sheet` knob); default = first worksheet."""
    wb = _cfb_stream(content, ("Workbook", "Book"))

    sst: list[str] = []
    first_sheet_off: int | None = None
    # Scan the WHOLE globals substream: per MS-XLS the SST record comes
    # AFTER the BOUNDSHEET8 records in real Excel output, so finding the
    # target sheet must not stop the scan (an early break would leave
    # sst empty and every LABELSST cell would decode as "").
    for opcode, pos, length in _records(wb):
        if opcode == 0x00FC:  # SST
            sst = _parse_sst(wb, pos, length)
        elif opcode == 0x0085:  # BOUNDSHEET8
            lbPlyPos = struct.unpack_from("<I", wb, pos)[0]
            if wb[pos + 5] == 0x00:  # sheet-type byte: worksheet
                if sheet_name is not None:
                    # short XLUnicodeString: cch, grbitChr, rgch
                    cch = wb[pos + 6]
                    if wb[pos + 7] & 1:
                        name = wb[pos + 8 : pos + 8 + 2 * cch].decode("utf-16-le")
                    else:
                        name = wb[pos + 8 : pos + 8 + cch].decode("latin-1")
                    if name == sheet_name and first_sheet_off is None:
                        first_sheet_off = lbPlyPos
                elif first_sheet_off is None:
                    first_sheet_off = lbPlyPos
        elif opcode == 0x000A:  # EOF of the globals substream
            break

    if first_sheet_off is None:
        target = f"sheet {sheet_name!r}" if sheet_name is not None else "a worksheet BOUNDSHEET"
        raise ValueError(f"xls: workbook has no {target}")

    cells: dict[int, dict[int, str]] = {}

    def put(r: int, c: int, v: str) -> None:
        cells.setdefault(r, {})[c] = v

    depth = 0
    for opcode, pos, length in _records(wb, first_sheet_off):
        if opcode == 0x0809:  # nested BOF (charts etc.)
            depth += 1
        elif opcode == 0x000A:  # EOF
            depth -= 1
            if depth <= 0:
                break
        elif depth > 1:
            continue  # inside an embedded substream
        elif opcode == 0x00FD:  # LABELSST
            r, c, _ixfe, isst = struct.unpack_from("<HHHI", wb, pos)
            put(r, c, sst[isst] if isst < len(sst) else "")
        elif opcode == 0x0204:  # LABEL (inline string)
            r, c = struct.unpack_from("<HH", wb, pos)
            text, _ = _unicode_string(wb, pos + 6)
            put(r, c, text)
        elif opcode == 0x0203:  # NUMBER
            r, c = struct.unpack_from("<HH", wb, pos)
            put(r, c, _fmt_number(struct.unpack_from("<d", wb, pos + 6)[0]))
        elif opcode == 0x027E:  # RK
            r, c = struct.unpack_from("<HH", wb, pos)
            put(r, c, _fmt_number(_rk_value(struct.unpack_from("<I", wb, pos + 6)[0])))
        elif opcode == 0x00BD:  # MULRK
            r, c0 = struct.unpack_from("<HH", wb, pos)
            n = (length - 6) // 6
            for i in range(n):
                rk = struct.unpack_from("<I", wb, pos + 4 + 6 * i + 2)[0]
                put(r, c0 + i, _fmt_number(_rk_value(rk)))

    out: list[tuple[int, list[str]]] = []
    for r in sorted(cells):
        row = cells[r]
        width = max(row) + 1
        out.append((r + 1, [row.get(i, "") for i in range(width)]))
    return out
