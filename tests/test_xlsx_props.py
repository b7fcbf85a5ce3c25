"""Property test: random string/number grids round-trip through the
xlsx fixture writer and parse_xlsx_bytes cell-for-cell (sharedStrings
vs inline numerics, sparse refs, multi-row)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from rabbit_data_pipeline_spark.operators.line_parser import parse_xlsx_bytes
from tests.test_xlsx import write_xlsx

# XML-safe text (no control chars/&<>, no surrogates); the writer
# shares strings via sharedStrings exactly like real producers.
_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x2FA0, blacklist_characters="&<>\"'\x7f"
    ),
    min_size=0,
    max_size=12,
)
_num = st.integers(min_value=-(10**9), max_value=10**9)
_grid = st.lists(st.lists(st.one_of(_text, _num), min_size=1, max_size=6), min_size=1, max_size=8)


@settings(max_examples=40, deadline=None)
@given(grid=_grid)
def test_xlsx_roundtrip(grid, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("xp") / "t.xlsx")
    write_xlsx(p, grid)
    rows = parse_xlsx_bytes(open(p, "rb").read())
    expected = [(ri + 1, [str(v) for v in row]) for ri, row in enumerate(grid)]
    assert rows == expected
