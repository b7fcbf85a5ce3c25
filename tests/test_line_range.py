"""LineParser line-range path (headLine/dataLine/endLine beyond the
native csv reader's reach): per-FILE 1-based numbering via
binaryFile → mapInPandas — no Python-RDD round-trip (the old
zipWithIndex spelling pickled every line through the RDD API and
numbered lines across the concatenation of all input files)."""

from __future__ import annotations

import pytest

from rabbit_data_pipeline_spark.operators.line_parser import _read_text_indexed, parse_lines


def _write(p, lines):
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_line_range_per_file_numbering(spark, tmp_path):
    """dataLine/endLine address lines WITHIN each file (reference reads
    files serially one at a time, LineParser.php:88-110) — global
    numbering would pick these rows from only the first file."""
    f1 = _write(tmp_path / "a.csv", ["junk", "k,v", "a,1", "a,2", "a,3"])
    f2 = _write(tmp_path / "b.csv", ["junk", "k,v", "b,1", "b,2", "b,3"])
    df = parse_lines(spark, [f1, f2], file_type="csv", head_line=2, data_line=4, end_line=5)
    assert {(r.k, r.v) for r in df.collect()} == {("a", "2"), ("b", "2")}


def test_line_range_no_python_rdd_roundtrip(spark, tmp_path):
    """The plan must be binaryFile scan → MapInPandas (Arrow), never a
    Scan ExistingRDD (the signature of driver-side createDataFrame over
    a pickled zipWithIndex RDD)."""
    f = _write(tmp_path / "c.csv", ["h1,h2", "x,1", "y,2"])
    df = parse_lines(spark, f, file_type="csv", head_line=1, data_line=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "ExistingRDD" not in plan
    indexed_plan = _read_text_indexed(spark, f)._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in indexed_plan


def test_line_range_crlf_and_trailing_newline(spark, tmp_path):
    p = tmp_path / "crlf.csv"
    p.write_bytes(b"k,v\r\nx,1\r\ny,2\r\n")
    df = parse_lines(spark, str(p), file_type="csv", head_line=1, data_line=2, end_line=3)
    assert [(r.k, r.v) for r in df.collect()] == [("x", "1")]


def test_line_range_multifile_header_mismatch_raises(spark, tmp_path):
    f1 = _write(tmp_path / "m1.csv", ["junk", "a,b", "1,2"])
    f2 = _write(tmp_path / "m2.csv", ["junk", "a,DIFFERENT", "1,2"])
    with pytest.raises(Exception, match="disagree on the header"):
        parse_lines(spark, [f1, f2], file_type="csv", head_line=2, data_line=3).collect()


def test_find_files_chain_passes_glob_not_paths(spark, tmp_path):
    """FindFiles → LineParser: the listing's load spec must flow
    through as a glob; the matched paths must NOT be collected to the
    driver (at millions of files the path list is the bottleneck)."""
    from types import SimpleNamespace

    from rabbit_data_pipeline_spark.operators.line_parser import _line_parser
    from rabbit_data_pipeline_spark.sources.files import find_files

    _write(tmp_path / "a.csv", ["k,v", "a,1"])
    _write(tmp_path / "b.csv", ["k,v", "b,2"])
    (tmp_path / "skip.json").write_text("{}")
    files = find_files(spark, scan_dir=str(tmp_path), extensions=["csv"])
    assert getattr(files, "__rdps_listing__", None) is not None

    def _no_collect(*_a, **_k):
        raise AssertionError("plugin collected paths through the driver")

    files.select = _no_collect  # instance shadow: fallback path would call it
    sch = SimpleNamespace(spark=spark)
    df = _line_parser(sch, {"fileType": "csv"}, [files])
    assert {(r.k, r.v) for r in df.collect()} == {("a", "1"), ("b", "2")}


def test_find_files_chain_glob_scan_dir_parses_same_set(spark, tmp_path):
    """When scan_dir itself contains a glob, the listing spec must
    reproduce the EXACT load expression find_files used — otherwise
    the parser reads a different file set than the one listed."""
    from types import SimpleNamespace

    from rabbit_data_pipeline_spark.operators.line_parser import _line_parser
    from rabbit_data_pipeline_spark.sources.files import find_files

    (tmp_path / "sub1").mkdir()
    (tmp_path / "sub2").mkdir()
    _write(tmp_path / "sub1" / "a.csv", ["k,v", "a,1"])
    _write(tmp_path / "sub2" / "b.csv", ["k,v", "b,2"])
    _write(tmp_path / "toplevel.csv", ["k,v", "TOP,9"])  # NOT under the glob
    files = find_files(spark, scan_dir=str(tmp_path) + "/sub*", extensions=["csv"])
    listed = {r.path.rsplit("/", 1)[-1] for r in files.collect()}
    assert listed == {"a.csv", "b.csv"}
    sch = SimpleNamespace(spark=spark)
    df = _line_parser(sch, {"fileType": "csv"}, [files])
    assert {(r.k, r.v) for r in df.collect()} == {("a", "1"), ("b", "2")}


def test_find_files_chain_empty_listing_raises(spark, tmp_path):
    from types import SimpleNamespace

    from rabbit_data_pipeline_spark.operators.line_parser import _line_parser
    from rabbit_data_pipeline_spark.sources.files import find_files

    _write(tmp_path / "only.json.txt", [""])  # wrong extension
    files = find_files(spark, scan_dir=str(tmp_path), extensions=["csv"])
    with pytest.raises(Exception, match="no input files"):
        _line_parser(SimpleNamespace(spark=spark), {"fileType": "csv"}, [files])


def test_line_range_empty_range_clear_error(spark, tmp_path):
    f = _write(tmp_path / "short.csv", ["only-line"])
    with pytest.raises(ValueError, match="no data rows"):
        parse_lines(spark, f, file_type="csv", head_line=None, data_line=5)
    # with explicit columns an empty range is a valid empty frame
    df = parse_lines(spark, f, file_type="csv", head_line=None, data_line=5, columns=["a", "b"])
    assert df.count() == 0 and df.columns == ["a", "b"]


def test_line_range_no_header_width_inference(spark, tmp_path):
    f = _write(tmp_path / "nh.tsv", ["x\t1\tq", "y\t2\tr", "z\t3\ts"])
    df = parse_lines(spark, f, file_type="txt", head_line=None, data_line=2)
    assert df.columns == ["_c0", "_c1", "_c2"]
    assert {tuple(r) for r in df.collect()} == {("y", "2", "r"), ("z", "3", "s")}


def test_line_range_reads_gzip_like_fast_path(spark, tmp_path):
    """The line-range path must decompress .gz transparently, exactly
    like the native csv reader does at scan time."""
    import gzip

    from rabbit_data_pipeline_spark.operators.line_parser import parse_lines

    text = "h1,h2\n" + "\n".join(f"a{i},b{i}" for i in range(10)) + "\n"
    p = tmp_path / "data.csv.gz"
    p.write_bytes(gzip.compress(text.encode()))
    out = parse_lines(
        spark, str(p), file_type="csv", head_line=1, data_line=3, end_line=5
    ).collect()
    # end_line is exclusive (reference semantics, as in the tests above)
    assert [tuple(r) for r in out] == [("a1", "b1"), ("a2", "b2")]


# --------------------- reference knob parity: dataLine list / field / include


def test_data_line_list_includes_listed_and_tail(spark, tmp_path):
    """dataLine as a list: rows IN the list plus everything from
    max(list) on are data; the header row is never data
    (LineParser.php run loop)."""
    from rabbit_data_pipeline_spark.operators.line_parser import parse_lines

    p = tmp_path / "d.csv"
    p.write_text("h1,h2\nr2,x\nr3,x\nr4,x\nr5,x\nr6,x\n")
    df = parse_lines(
        spark, str(p), file_type="csv", head_line=1, data_line=[3, 5]
    )
    got = sorted(r["h1"] for r in df.collect())
    assert got == ["r3", "r5", "r6"]  # row 2 and 4 skipped, tail from 5


def test_field_line_attaches_shared_values(spark, tmp_path):
    """field/fieldLine: a designated row carries constant values that
    attach to every data row (doc/LineParser.md `field`)."""
    from rabbit_data_pipeline_spark.operators.line_parser import parse_lines

    p = tmp_path / "f.csv"
    p.write_text("h1,h2\nACME,2024-01\nr3a,r3b\nr4a,r4b\n")
    df = parse_lines(
        spark, str(p), file_type="csv", head_line=1, data_line=3,
        field={"company": 0, "period": 1}, field_line=2,
    )
    rows = {r["h1"]: (r["company"], r["period"]) for r in df.collect()}
    assert rows == {"r3a": ("ACME", "2024-01"), "r4a": ("ACME", "2024-01")}


def test_include_dict_applies_cell_transform(spark, tmp_path):
    """include as {index: SQL-expr-with-$col}: the reference evals PHP
    per cell; here the same contract runs as a JVM expression."""
    from rabbit_data_pipeline_spark.operators.line_parser import parse_lines

    p = tmp_path / "i.csv"
    p.write_text("code,qty\nab 12,3\ncd 45,4\n")
    df = parse_lines(
        spark, str(p), file_type="csv",
        include={0: "element_at(split($col, ' '), 1)", 1: None},
    )
    assert sorted(map(tuple, df.collect())) == [("ab", "3"), ("cd", "4")]


def test_xlsx_sheet_selection_by_name(spark, tmp_path):
    """`sheet` selects the worksheet by TAB NAME (mandatory in the
    reference for Excel; LineParser.php init guard)."""
    import zipfile

    from rabbit_data_pipeline_spark.operators.line_parser import parse_lines
    from tests.test_xlsx import _NS

    rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    doc_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    p = str(tmp_path / "multi.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {_NS} xmlns:r="{doc_ns}"><sheets>'
            '<sheet name="summary" sheetId="1" r:id="rId1"/>'
            '<sheet name="daily stats" sheetId="2" r:id="rId2"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{rel_ns}">'
            '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
            '<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>'
            "</Relationships>",
        )
        for n, (h, v) in [(1, ("wrong", "w1")), (2, ("name", "alice"))]:
            z.writestr(
                f"xl/worksheets/sheet{n}.xml",
                f'<?xml version="1.0"?><worksheet {_NS}><sheetData>'
                f'<row r="1"><c r="A1" t="inlineStr"><is><t>{h}</t></is></c></row>'
                f'<row r="2"><c r="A1" t="inlineStr"><is><t>{v}</t></is></c></row>'
                "</sheetData></worksheet>",
            )
    df = parse_lines(spark, p, file_type="xlsx", head_line=1, data_line=2, sheet="daily stats")
    assert [r["name"] for r in df.collect()] == ["alice"]
    import pytest as _pytest

    with _pytest.raises(Exception, match="no sheet"):
        parse_lines(spark, p, file_type="xlsx", head_line=1, data_line=2, sheet="nope").collect()
