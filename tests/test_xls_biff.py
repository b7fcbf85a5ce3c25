"""BIFF8 .xls reader (operators/xls.py) against fixture workbooks
written by a minimal CFB+BIFF8 writer below — standards-shaped enough
to exercise the real decode paths: DIFAT→FAT→directory walk, the
mini-FAT path (streams < 4096 bytes) AND the regular-FAT path (padded
streams), SST shared strings incl. a CONTINUE split, RK/NUMBER/MULRK
numerics, and sparse rows."""

from __future__ import annotations

import struct

import pytest

from rabbit_data_pipeline_spark.operators.line_parser import parse_lines
from rabbit_data_pipeline_spark.operators.xls import parse_xls_bytes

# ---------------------------------------------------------------- writer


def _biff_rec(opcode: int, data: bytes) -> bytes:
    return struct.pack("<HH", opcode, len(data)) + data


def _ucs(text: str) -> bytes:
    """XLUnicodeString, compressed when latin-1 fits."""
    try:
        raw = text.encode("latin-1")
        return struct.pack("<HB", len(text), 0) + raw
    except UnicodeEncodeError:
        return struct.pack("<HB", len(text), 1) + text.encode("utf-16-le")


def _build_workbook_stream(rows: list[list[object]], sst_split: bool = False) -> bytes:
    """Globals (BOF, SST, BOUNDSHEET, EOF) + one sheet substream.
    Strings go through SST/LABELSST like Excel writes them; numbers as
    NUMBER records. sst_split forces the SST payload into a CONTINUE
    at a string boundary."""
    shared: list[str] = []
    for row in rows:
        for v in row:
            if isinstance(v, str) and v not in shared:
                shared.append(v)

    sheet_recs = b"".join(
        [
            _biff_rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0)),  # sheet BOF
        ]
        + [
            _biff_rec(0x00FD, struct.pack("<HHHI", ri, ci, 0, shared.index(v)))
            if isinstance(v, str)
            else _biff_rec(0x0203, struct.pack("<HHH", ri, ci, 0) + struct.pack("<d", float(v)))
            for ri, row in enumerate(rows)
            for ci, v in enumerate(row)
            if v is not None
        ]
        + [_biff_rec(0x000A, b"")]
    )

    if sst_split and len(shared) > 1:
        head = struct.pack("<II", len(shared), len(shared)) + b"".join(_ucs(s) for s in shared[:1])
        sst = _biff_rec(0x00FC, head) + _biff_rec(0x003C, b"".join(_ucs(s) for s in shared[1:]))
    else:
        payload = struct.pack("<II", len(shared), len(shared)) + b"".join(_ucs(s) for s in shared)
        sst = _biff_rec(0x00FC, payload)

    bof = _biff_rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))  # globals BOF

    def boundsheet(lb_ply_pos: int) -> bytes:
        # lbPlyPos, grbit(visible/worksheet), cch, grbit(compressed), name
        data = struct.pack("<I", lb_ply_pos) + bytes([0, 0]) + struct.pack("<B", 6) + b"\x00" + b"Sheet1"
        return _biff_rec(0x0085, data)

    # BOUNDSHEET lbPlyPos = offset of the sheet BOF; its own length is
    # position-independent, so one placeholder pass fixes the offset.
    globals_len = len(bof) + len(sst) + len(boundsheet(0)) + 4  # + EOF record
    globals_block = bof + sst + boundsheet(globals_len) + _biff_rec(0x000A, b"")
    assert len(globals_block) == globals_len
    return globals_block + sheet_recs


def _cfb_wrap(stream: bytes, pad_to_fat: bool = False) -> bytes:
    """Wrap one stream named 'Workbook' in a minimal CFB container.
    pad_to_fat=True pads the stream past the 4096-byte mini cutoff so
    it lands in regular FAT sectors; otherwise it goes through the
    mini stream + mini FAT (what Excel does for small workbooks)."""
    ssz, msz = 512, 64
    if pad_to_fat and len(stream) < 4096:
        stream = stream + b"\x00" * (4096 - len(stream))
    use_mini = len(stream) < 4096

    def sectors_of(data: bytes, size: int) -> int:
        return (len(data) + size - 1) // size

    def pad(data: bytes, size: int) -> bytes:
        return data + b"\x00" * (sectors_of(data, size) * size - len(data))

    def dirent(name: str, etype: int, start: int, size: int, child: int = 0xFFFFFFFF) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = raw + b"\x00" * (64 - len(raw))
        e += struct.pack("<H", len(raw))
        e += bytes([etype, 1])  # type, black
        e += struct.pack("<III", 0xFFFFFFFF, 0xFFFFFFFF, child)
        e += b"\x00" * 16 + b"\x00" * 4 + b"\x00" * 16  # clsid, state, times
        e += struct.pack("<IQ", start, size)
        return e

    # Sector layout: [0]=FAT, [1]=directory, then payload sectors.
    if use_mini:
        mini_stream = pad(stream, msz)
        n_mini_sects = sectors_of(mini_stream, ssz)
        n_minifat_entries = sectors_of(stream, msz)
        # chains within the mini FAT
        minifat = list(range(1, n_minifat_entries)) + [0xFFFFFFFE]
        minifat_sector = pad(struct.pack(f"<{len(minifat)}I", *minifat), ssz)
        # sectors: 0 FAT, 1 dir, 2 miniFAT, 3.. ministream
        fat = [0xFFFFFFFD, 0xFFFFFFFE, 0xFFFFFFFE]
        mini_start = 3
        chain = list(range(mini_start + 1, mini_start + n_mini_sects)) + [0xFFFFFFFE]
        fat += chain
        directory = (
            dirent("Root Entry", 5, mini_start, len(mini_stream), child=1)
            + dirent("Workbook", 2, 0, len(stream))
            + dirent("", 0, 0, 0)
            + dirent("", 0, 0, 0)
        )
        body = pad(struct.pack(f"<{len(fat)}I", *fat), ssz) + pad(directory, ssz) + minifat_sector + pad(mini_stream, ssz)
        minifat_start, n_minifat, first_dir = 2, 1, 1
    else:
        n_sects = sectors_of(stream, ssz)
        data_start = 2
        fat = [0xFFFFFFFD, 0xFFFFFFFE]
        chain = list(range(data_start + 1, data_start + n_sects)) + [0xFFFFFFFE]
        fat += chain
        directory = (
            dirent("Root Entry", 5, 0xFFFFFFFE, 0, child=1)
            + dirent("Workbook", 2, data_start, len(stream))
            + dirent("", 0, 0, 0)
            + dirent("", 0, 0, 0)
        )
        body = pad(struct.pack(f"<{len(fat)}I", *fat), ssz) + pad(directory, ssz) + pad(stream, ssz)
        minifat_start, n_minifat, first_dir = 0xFFFFFFFE, 0, 1

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major (512-byte sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<HH", header, 30, 9, 6)  # sector / mini shifts
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, first_dir)  # first directory sector
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<II", header, 60, minifat_start, n_minifat)
    struct.pack_into("<II", header, 68, 0xFFFFFFFE, 0)  # no DIFAT sectors
    difat = [0] + [0xFFFFFFFF] * 108  # FAT at sector 0
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + body


def write_xls(path: str, rows: list[list[object]], pad_to_fat: bool = False, sst_split: bool = False) -> None:
    with open(path, "wb") as f:
        f.write(_cfb_wrap(_build_workbook_stream(rows, sst_split=sst_split), pad_to_fat=pad_to_fat))


# ----------------------------------------------------------------- tests

GRID = [["name", "qty", "price"], ["ham", 3, 9.5], ["eggs", 5, 0.25]]


@pytest.mark.parametrize("pad_to_fat", [False, True], ids=["ministream", "fat"])
def test_parse_xls_bytes_grid(tmp_path, pad_to_fat):
    p = str(tmp_path / "t.xls")
    write_xls(p, GRID, pad_to_fat=pad_to_fat)
    rows = parse_xls_bytes(open(p, "rb").read())
    assert rows == [
        (1, ["name", "qty", "price"]),
        (2, ["ham", "3", "9.5"]),
        (3, ["eggs", "5", "0.25"]),
    ]


def test_parse_xls_sst_continue_split(tmp_path):
    p = str(tmp_path / "split.xls")
    write_xls(p, [["alpha", "bravo", "charlie"], ["alpha", "bravo", "charlie"]], sst_split=True)
    rows = parse_xls_bytes(open(p, "rb").read())
    assert rows[0] == (1, ["alpha", "bravo", "charlie"])


def test_parse_xls_sparse_row(tmp_path):
    p = str(tmp_path / "sparse.xls")
    write_xls(p, [["k", None, "v"]])
    rows = parse_xls_bytes(open(p, "rb").read())
    assert rows == [(1, ["k", "", "v"])]


def test_rk_decoding():
    from rabbit_data_pipeline_spark.operators.xls import _rk_value

    assert _rk_value(30 << 2 | 0x02) == 30.0  # 30-bit int
    assert _rk_value((-7 & ((1 << 30) - 1)) << 2 | 0x02) == -7.0  # negative int
    packed = struct.unpack("<Q", struct.pack("<d", 2.5))[0]
    assert _rk_value((packed >> 32) & 0xFFFFFFFC) == 2.5  # truncated double
    assert _rk_value((1250 << 2) | 0x03) == 12.5  # int with /100 flag


def test_parse_lines_xls_end_to_end(spark, tmp_path):
    p = str(tmp_path / "inv.xls")
    write_xls(p, GRID)
    df = parse_lines(spark, p, file_type="xls", rename={"qty": "n"}, add_fields={"src": "xls"})
    got = {(r.name, r.n, r.price, r.src) for r in df.collect()}
    assert got == {("ham", "3", "9.5", "xls"), ("eggs", "5", "0.25", "xls")}


def test_parse_lines_xls_line_range_multifile(spark, tmp_path):
    for i, fname in enumerate(["a.xls", "b.xls"]):
        write_xls(
            str(tmp_path / fname),
            [["k", "v"], [f"f{i}-r1", 1], [f"f{i}-r2", 2], [f"f{i}-r3", 3]],
        )
    df = parse_lines(
        spark, [str(tmp_path / "a.xls"), str(tmp_path / "b.xls")],
        file_type="xls", data_line=3, end_line=4,
    )
    assert {r.k for r in df.collect()} == {"f0-r2", "f1-r2"}


def _sst_rec(payload: bytes) -> bytes:
    return _biff_rec(0x00FC, payload)


def _wrap_custom_sst(sst_blocks: list[bytes], labels: list[tuple[int, int, int]]) -> bytes:
    """Workbook stream with a hand-built SST (first block is the SST
    record, the rest CONTINUEs) and LABELSST cells (row, col, isst)."""
    bof_g = _biff_rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    sst = _sst_rec(sst_blocks[0]) + b"".join(_biff_rec(0x003C, b) for b in sst_blocks[1:])

    def boundsheet(lb):
        return _biff_rec(0x0085, struct.pack("<I", lb) + bytes([0, 0]) + struct.pack("<B", 6) + b"\x00" + b"Sheet1")

    globals_len = len(bof_g) + len(sst) + len(boundsheet(0)) + 4
    sheet = (
        _biff_rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
        + b"".join(_biff_rec(0x00FD, struct.pack("<HHHI", r, c, 0, i)) for r, c, i in labels)
        + _biff_rec(0x000A, b"")
    )
    stream = bof_g + sst + boundsheet(globals_len) + _biff_rec(0x000A, b"") + sheet
    return _cfb_wrap(stream)


def test_sst_mid_string_continue_split():
    """Character data resuming in a CONTINUE starts with a fresh grbit
    byte — it must be consumed, not decoded as a character."""
    # one string "hello-world" (11 chars), split after 5 chars
    head = struct.pack("<II", 1, 1) + struct.pack("<HB", 11, 0) + b"hello"
    cont = b"\x00" + b"-world"  # fresh grbit (compressed) + remaining chars
    blob = _wrap_custom_sst([head, cont], [(0, 0, 0)])
    assert parse_xls_bytes(blob) == [(1, ["hello-world"])]


def test_sst_mid_string_continue_width_switch():
    """The continued fragment may switch to 16-bit chars (grbit bit 0)."""
    head = struct.pack("<II", 1, 1) + struct.pack("<HB", 4, 0) + b"ab"
    cont = b"\x01" + "éü".encode("utf-16-le")
    blob = _wrap_custom_sst([head, cont], [(0, 0, 0)])
    assert parse_xls_bytes(blob) == [(1, ["abéü"])]


def test_sst_rich_run_spill_across_continue():
    """A rich string whose formatting-run bytes spill into the next
    CONTINUE must not desynchronize the following strings (runs carry
    NO fresh grbit at the boundary, unlike character data)."""
    # string 1: "rich", fRichSt, 3 runs (12 bytes) of which 8 spill
    s1 = struct.pack("<HB", 4, 0x08) + struct.pack("<H", 3) + b"rich" + b"\xaa" * 4
    cont = b"\xbb" * 8 + struct.pack("<HB", 5, 0) + b"after"
    head = struct.pack("<II", 2, 2) + s1
    blob = _wrap_custom_sst([head, cont], [(0, 0, 0), (0, 1, 1)])
    assert parse_xls_bytes(blob) == [(1, ["rich", "after"])]


def test_number_nan_inf_cells_do_not_abort(tmp_path):
    from rabbit_data_pipeline_spark.operators.xls import _fmt_number

    assert _fmt_number(float("nan")) == "nan"
    assert _fmt_number(float("inf")) == "inf"
    p = str(tmp_path / "nan.xls")
    write_xls(p, [["k", float("nan")], ["x", 1]])
    rows = parse_xls_bytes(open(p, "rb").read())
    assert rows == [(1, ["k", "nan"]), (2, ["x", "1"])]


def test_not_a_cfb_file_raises():
    with pytest.raises(ValueError, match="bad magic"):
        parse_xls_bytes(b"PK\x03\x04 this is a zip actually" + b"\x00" * 600)


def test_parse_xls_sheet_by_name(tmp_path):
    """`sheet_name` selects the worksheet via its BOUNDSHEET name —
    reference LineParser's mandatory `sheet` knob for Excel."""
    from rabbit_data_pipeline_spark.operators.xls import parse_xls_bytes

    def sheet_block(sst_idx: int) -> bytes:
        return b"".join(
            [
                _biff_rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0)),
                _biff_rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, sst_idx)),
                _biff_rec(0x000A, b""),
            ]
        )

    shared = ["first-val", "second-val"]
    payload = struct.pack("<II", 2, 2) + b"".join(_ucs(s) for s in shared)
    sst = _biff_rec(0x00FC, payload)
    bof = _biff_rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))

    def boundsheet(lb: int, name: bytes) -> bytes:
        data = struct.pack("<I", lb) + bytes([0, 0]) + struct.pack("<B", len(name)) + b"\x00" + name
        return _biff_rec(0x0085, data)

    # Real-world MS-XLS record order: BOUNDSHEETs BEFORE the SST — the
    # parser must keep scanning for the SST after the sheet is found.
    glen = len(bof) + len(sst) + len(boundsheet(0, b"alpha")) + len(boundsheet(0, b"beta")) + 4
    s1 = sheet_block(0)
    globals_block = (
        bof + boundsheet(glen, b"alpha") + boundsheet(glen + len(s1), b"beta") + sst + _biff_rec(0x000A, b"")
    )
    assert len(globals_block) == glen
    stream = globals_block + s1 + sheet_block(1)
    content = _cfb_wrap(stream)

    assert parse_xls_bytes(content) == [(1, ["first-val"])]
    assert parse_xls_bytes(content, sheet_name="beta") == [(1, ["second-val"])]
    assert parse_xls_bytes(content, sheet_name="alpha") == [(1, ["first-val"])]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no sheet"):
        parse_xls_bytes(content, sheet_name="gamma")
