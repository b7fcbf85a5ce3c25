"""The gate: every registered query vs its DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from rabbit_data_pipeline_spark.queries import registry
from tests.oracle import compare


def _cases():
    return sorted(registry().items())


@pytest.mark.parametrize("name", [n for n, _ in _cases()])
def test_query_matches_oracle(spark, sf_dir, name):
    q = registry()[name]
    df = q.builder(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 1, f"{name}: rows-only gate returned 0 rows (vacuous)"
        return
    result = compare(df, q.oracle, sf_dir)
    assert result["cols_match"], f"{name}: column mismatch {result}"
    assert result["rows_match"], f"{name}: row-count mismatch {result}"
    assert result["hash_match"], f"{name}: value-hash mismatch {result}"
    # Anti-vacuity (r5 verdict: five gates passed green while selecting 0
    # rows, proving nothing). A hash-equal empty result is no longer a
    # pass — every gate must adjudicate at least one row at the local sf.
    assert result["rows_spark"] >= 1, f"{name}: gate is vacuous (0 rows at local sf)"
