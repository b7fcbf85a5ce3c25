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
        assert df.count() >= 0  # rows-only check (driver's weaker gate)
        return
    result = compare(df, q.oracle, sf_dir)
    assert result["cols_match"], f"{name}: column mismatch {result}"
    assert result["rows_match"], f"{name}: row-count mismatch {result}"
    assert result["hash_match"], f"{name}: value-hash mismatch {result}"
