"""Native xlsx parsing (stdlib zip+XML, mapInPandas distribution).

The fixture writer emits a standards-shaped workbook (content types,
workbook, sheet, sharedStrings) so the parser is exercised against the
same member layout real producers emit — shared strings, inline
strings, numeric cells, and sparse rows with A1-style references.
"""

from __future__ import annotations

import zipfile

import pytest

from rabbit_data_pipeline_spark.operators.line_parser import parse_lines, parse_xlsx_bytes

_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'


def _col_ref(i: int) -> str:
    name = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        name = chr(65 + rem) + name
    return name


def write_xlsx(path: str, rows: list[list[object]], skip_cols: set[tuple[int, int]] = frozenset()) -> None:
    """Minimal valid xlsx: strings go through sharedStrings (like real
    producers), numbers inline as <v>. (row, col) in skip_cols are
    omitted entirely — sparse-row case."""
    shared: list[str] = []
    sheet_rows = []
    for ri, row in enumerate(rows):
        cells = []
        for ci, val in enumerate(row):
            if (ri, ci) in skip_cols:
                continue
            ref = f"{_col_ref(ci)}{ri + 1}"
            if isinstance(val, str):
                if val not in shared:
                    shared.append(val)
                cells.append(f'<c r="{ref}" t="s"><v>{shared.index(val)}</v></c>')
            else:
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
        sheet_rows.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')
    sheet = f'<?xml version="1.0"?><worksheet {_NS}><sheetData>{"".join(sheet_rows)}</sheetData></worksheet>'
    sst = (
        f'<?xml version="1.0"?><sst {_NS} count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/></Types>',
        )
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {_NS}><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>',
        )
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)


def test_parse_xlsx_bytes_shared_inline_sparse(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(
        p,
        [["name", "qty", "note"], ["ham", 3, "x"], ["eggs", 5, "gap-here"]],
        skip_cols={(2, 1)},  # eggs row has no qty cell
    )
    rows = parse_xlsx_bytes(open(p, "rb").read())
    assert rows[0] == (1, ["name", "qty", "note"])
    assert rows[1] == (2, ["ham", "3", "x"])
    assert rows[2] == (3, ["eggs", "", "gap-here"])  # sparse cell -> empty, no shift


def test_parse_xlsx_bytes_omitted_rows_keep_numbers(tmp_path):
    """ECMA-376 producers omit empty rows entirely; the sheet's own r
    attributes must drive line numbering or headLine/dataLine shift."""
    import zipfile

    p = str(tmp_path / "gaps.xlsx")
    sheet = (
        f'<?xml version="1.0"?><worksheet {_NS}><sheetData>'
        '<row r="2"><c r="A2"><v>20</v></c></row>'
        '<row r="5"><c r="A5"><v>50</v></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    assert parse_xlsx_bytes(open(p, "rb").read()) == [(2, ["20"]), (5, ["50"])]


def test_parse_xlsx_first_sheet_numeric_order(tmp_path):
    """sheet2 must beat sheet10 (numeric, not lexicographic, order)."""
    import zipfile

    p = str(tmp_path / "many.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        for n, val in [(10, "ten"), (2, "two")]:
            z.writestr(
                f"xl/worksheets/sheet{n}.xml",
                f'<?xml version="1.0"?><worksheet {_NS}><sheetData>'
                f'<row r="1"><c r="A1" t="inlineStr"><is><t>{val}</t></is></c></row>'
                "</sheetData></worksheet>",
            )
    assert parse_xlsx_bytes(open(p, "rb").read()) == [(1, ["two"])]


def test_parse_xlsx_unreferenced_cell_after_sparse(tmp_path):
    """Cells without r= land at prev_col+1 (ECMA-376 §18.3.1.4) — the
    old len(cells) placement collided with an already-placed sparse
    referenced cell (<c r="B1">x</c><c>y</c> overwrote x)."""
    import zipfile

    p = str(tmp_path / "noref.xlsx")
    sheet = (
        f'<?xml version="1.0"?><worksheet {_NS}><sheetData>'
        '<row r="1"><c r="B1" t="inlineStr"><is><t>x</t></is></c>'
        '<c t="inlineStr"><is><t>y</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    assert parse_xlsx_bytes(open(p, "rb").read()) == [(1, ["", "x", "y"])]


def test_parse_xlsx_first_sheet_from_workbook_rels(tmp_path):
    """Display order comes from workbook.xml + rels, not member names:
    a workbook whose first <sheet> resolves to sheet2.xml must read
    sheet2, even though sheet1.xml exists."""
    import zipfile

    rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    doc_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    p = str(tmp_path / "reordered.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {_NS} xmlns:r="{doc_ns}"><sheets>'
            '<sheet name="Second" sheetId="1" r:id="rId7"/>'
            '<sheet name="First" sheetId="2" r:id="rId8"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{rel_ns}">'
            '<Relationship Id="rId7" Type="t" Target="worksheets/sheet2.xml"/>'
            '<Relationship Id="rId8" Type="t" Target="worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        for n, val in [(1, "one"), (2, "two")]:
            z.writestr(
                f"xl/worksheets/sheet{n}.xml",
                f'<?xml version="1.0"?><worksheet {_NS}><sheetData>'
                f'<row r="1"><c r="A1" t="inlineStr"><is><t>{val}</t></is></c></row>'
                "</sheetData></worksheet>",
            )
    assert parse_xlsx_bytes(open(p, "rb").read()) == [(1, ["two"])]


def test_parse_xlsx_chartsheet_first_falls_to_worksheet(tmp_path):
    """A workbook whose first display tab is a CHARTsheet has no row
    grid; the resolver must skip it (only xl/worksheets/ targets) and
    read the first real worksheet instead of returning zero rows."""
    import zipfile

    rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    doc_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    p = str(tmp_path / "chartfirst.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {_NS} xmlns:r="{doc_ns}"><sheets>'
            '<sheet name="Chart" sheetId="1" r:id="rId1"/>'
            '<sheet name="Data" sheetId="2" r:id="rId2"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{rel_ns}">'
            '<Relationship Id="rId1" Type="c" Target="chartsheets/sheet1.xml"/>'
            '<Relationship Id="rId2" Type="w" Target="worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        z.writestr(
            "xl/chartsheets/sheet1.xml",
            f'<?xml version="1.0"?><chartsheet {_NS}></chartsheet>',
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet {_NS}><sheetData>'
            '<row r="1"><c r="A1" t="inlineStr"><is><t>data</t></is></c></row>'
            "</sheetData></worksheet>",
        )
    assert parse_xlsx_bytes(open(p, "rb").read()) == [(1, ["data"])]


def test_parse_lines_xlsx_trailing_empty_header_cell_agrees(spark, tmp_path):
    """Touched-but-empty trailing styled cells must not trip the
    multi-file header-agreement check: ['k','v'] == ['k','v','']."""
    import zipfile

    write_xlsx(str(tmp_path / "t1.xlsx"), [["k", "v"], ["a", 1]])
    p2 = str(tmp_path / "t2.xlsx")
    sheet = (
        f'<?xml version="1.0"?><worksheet {_NS}><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>v</t></is></c>'
        '<c r="C1"></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>b</t></is></c>'
        '<c r="B2"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(p2, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    df = parse_lines(spark, [str(tmp_path / "t1.xlsx"), p2], file_type="xlsx")
    assert {(r.k, r.v) for r in df.collect()} == {("a", "1"), ("b", "2")}


def test_parse_lines_xlsx_multifile_header_mismatch_raises(spark, tmp_path):
    write_xlsx(str(tmp_path / "h1.xlsx"), [["a", "b"], ["1", "2"]])
    write_xlsx(str(tmp_path / "h2.xlsx"), [["a", "DIFFERENT"], ["1", "2"]])
    with pytest.raises(Exception, match="disagree on the header"):
        parse_lines(
            spark,
            [str(tmp_path / "h1.xlsx"), str(tmp_path / "h2.xlsx")],
            file_type="xlsx",
        ).collect()


def test_parse_lines_xlsx_header_and_opts(spark, tmp_path):
    p = str(tmp_path / "inv.xlsx")
    write_xlsx(p, [["sku", "qty", "price"], ["a1", 2, 9.5], ["b2", 4, 1.25], ["c3", 6, 0.5]])
    df = parse_lines(
        spark, p, file_type="xlsx", rename={"qty": "n"}, add_fields={"src": "xl"}, id_key="rid"
    )
    rows = {(r.sku, r.n, r.price, r.src) for r in df.collect()}
    assert rows == {("a1", "2", "9.5", "xl"), ("b2", "4", "1.25", "xl"), ("c3", "6", "0.5", "xl")}
    assert df.select("rid").distinct().count() == 3


def test_parse_lines_xlsx_line_range_multifile(spark, tmp_path):
    for i, fname in enumerate(["x1.xlsx", "x2.xlsx"]):
        write_xlsx(
            str(tmp_path / fname),
            [["k", "v"], [f"f{i}-r1", 1], [f"f{i}-r2", 2], [f"f{i}-r3", 3]],
        )
    # dataLine=3, endLine=4 -> only the second data row of EACH file.
    df = parse_lines(
        spark, [str(tmp_path / "x1.xlsx"), str(tmp_path / "x2.xlsx")],
        file_type="xlsx", data_line=3, end_line=4,
    )
    assert {r.k for r in df.collect()} == {"f0-r2", "f1-r2"}


def test_xls_parses_natively_now(spark, tmp_path):
    """Legacy .xls routes through the BIFF8 reader (tests/test_xls_biff.py)
    instead of raising — a zip renamed .xls still fails loudly."""
    from rabbit_data_pipeline_spark.operators.xls import parse_xls_bytes

    with pytest.raises(ValueError, match="bad magic"):
        parse_xls_bytes(b"not-a-cfb" + b"\x00" * 100)
