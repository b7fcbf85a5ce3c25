"""LineParser `split`/`enclosure`/`escape` knob parity
(src/Transforms/LineParser.php:22,31-33, doc/LineParser.md): custom
record separator and fgetcsv-style quote/escape as first-class
parse_lines kwargs, on both the native-csv fast path and the
line-range path."""

from __future__ import annotations

from rabbit_data_pipeline_spark.operators.line_parser import _split_cells, parse_lines


def test_split_custom_record_separator_fast_path(spark, tmp_path):
    """`split` (reference default PHP_EOL) as record separator on the
    fast path — maps to the csv reader's lineSep."""
    p = tmp_path / "pipe_rows.csv"
    p.write_text("k,v|a,1|b,2|")
    df = parse_lines(spark, str(p), file_type="csv", split="|")
    assert {(r.k, r.v) for r in df.collect()} == {("a", "1"), ("b", "2")}


def test_split_custom_record_separator_line_range(spark, tmp_path):
    """`split` on the line-range path: per-file line numbers count
    records between the custom separator; a \\r next to it is content
    (only the default newline mode strips CRLF)."""
    p = tmp_path / "semi_rows.txt"
    p.write_text("junk;k\tv;a\t1;b\t2;c\t3;")
    df = parse_lines(
        spark, str(p), file_type="txt", split=";", head_line=2, data_line=3, end_line=5
    )
    assert {(r.k, r.v) for r in df.collect()} == {("a", "1"), ("b", "2")}


def test_enclosure_fast_path(spark, tmp_path):
    """`enclosure` (fgetcsv default '"') — a custom quote char keeps
    embedded delimiters inside one cell."""
    p = tmp_path / "quoted.csv"
    p.write_text("k,v\n'a,with,commas',1\nplain,2\n")
    df = parse_lines(spark, str(p), file_type="csv", enclosure="'")
    assert {(r.k, r.v) for r in df.collect()} == {("a,with,commas", "1"), ("plain", "2")}


def test_enclosure_line_range_header_and_body(spark, tmp_path):
    """Quote handling must agree between the driver-side header sniff
    and the JVM-side from_csv body parse."""
    p = tmp_path / "quoted_range.csv"
    p.write_text('junk\n"first,col",second\n"x,y",1\n"z,w",2\n')
    df = parse_lines(spark, str(p), file_type="csv", head_line=2, data_line=3, enclosure='"')
    assert list(df.columns) == ["first,col", "second"]
    assert {(r[0], r[1]) for r in df.collect()} == {("x,y", "1"), ("z,w", "2")}


def test_escape_fast_path(spark, tmp_path):
    """`escape` (fgetcsv default '\\\\') — escaped quote inside a
    quoted cell stays literal."""
    p = tmp_path / "escaped.csv"
    p.write_text('k,v\n"he said \\"hi\\"",1\n')
    df = parse_lines(spark, str(p), file_type="csv", enclosure='"', escape="\\")
    assert [(r.k, r.v) for r in df.collect()] == [('he said "hi"', "1")]


def test_escape_line_range_body(spark, tmp_path):
    p = tmp_path / "escaped_range.csv"
    p.write_text('junk\nk,v\n"a\\"b",1\nplain,2\n')
    df = parse_lines(
        spark, str(p), file_type="csv", head_line=2, data_line=3, enclosure='"', escape="\\"
    )
    assert {(r.k, r.v) for r in df.collect()} == {('a"b', "1"), ("plain", "2")}


def test_knobs_default_behavior_unchanged(spark, tmp_path):
    """No knobs → exact pre-knob behavior (newline records, plain
    comma split, CRLF stripped)."""
    p = tmp_path / "plain.csv"
    p.write_bytes(b"k,v\r\nx,1\r\n")
    df = parse_lines(spark, str(p), file_type="csv", head_line=1, data_line=2)
    assert [(r.k, r.v) for r in df.collect()] == [("x", "1")]


def test_split_cells_helper_parity():
    """Driver-side splitter (header/field rows) mirrors fgetcsv:
    quoted delimiters kept, doubled-quote mode without escape,
    backslash mode with it; plain split keeps trailing empties."""
    assert _split_cells("a,b,,", ",", None, None) == ["a", "b", "", ""]
    assert _split_cells('"a,b",c', ",", '"', None) == ["a,b", "c"]
    assert _split_cells('"a""b",c', ",", '"', None) == ['a"b', "c"]
    assert _split_cells('"a\\"b",c', ",", '"', "\\") == ['a"b', "c"]
    assert _split_cells("a\tb", "\t", "'", None) == ["a", "b"]
