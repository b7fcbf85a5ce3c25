"""Property tests (hypothesis) for the BIFF8 reader: any string/number
grid, in any of the writer's container layouts (mini-stream vs
regular FAT, SST split into a CONTINUE or not), must round-trip
through parse_xls_bytes cell-for-cell. No Spark needed — the parser
runs executor-side on raw bytes."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from rabbit_data_pipeline_spark.operators.xls import _fmt_number, parse_xls_bytes
from tests.test_xls_biff import _build_workbook_stream, _cfb_wrap

# Strings the SST writer supports: latin-1 (compressed) and wider
# unicode (utf-16 path), no embedded NULs.
_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FA0, blacklist_characters="\x00"),
    min_size=0,
    max_size=12,
)
_num = st.one_of(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
)
_cell = st.one_of(_text, _num)
_grid = st.lists(st.lists(_cell, min_size=1, max_size=6), min_size=1, max_size=8)


def _expected(rows):
    out = []
    for ri, row in enumerate(rows):
        cells = [v if isinstance(v, str) else _fmt_number(float(v)) for v in row]
        out.append((ri + 1, cells))
    return out


@settings(max_examples=40, deadline=None)
@given(grid=_grid, pad=st.booleans(), split=st.booleans())
def test_xls_roundtrip(grid, pad, split):
    blob = _cfb_wrap(_build_workbook_stream(grid, sst_split=split), pad_to_fat=pad)
    assert parse_xls_bytes(blob) == _expected(grid)
