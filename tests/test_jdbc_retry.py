"""Code-conditional JDBC retry (reference Sinks/Pdo.php:87-101: retry
only the configured SQL error codes, with sleep between attempts)."""

from __future__ import annotations

import pytest

from rabbit_data_pipeline_spark.sinks.sql import (
    DEFAULT_RETRY_CODES,
    error_code_of,
    retry_on_codes,
)


class _Flaky:
    def __init__(self, failures: list[Exception]):
        self.failures = list(failures)
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.failures:
            raise self.failures.pop(0)
        return "ok"


def test_retryable_code_then_success():
    fn = _Flaky([RuntimeError("SQLSTATE[08S01]: server has gone away")])
    sleeps: list[float] = []
    assert retry_on_codes(fn, retries=3, _sleep=sleeps.append) == "ok"
    assert fn.calls == 2
    assert sleeps == [0.5]  # backoff * 2^0


def test_non_retryable_code_raises_immediately():
    """A constraint violation (23505) must not burn the retry budget."""
    fn = _Flaky([RuntimeError("SQLSTATE[23505]: unique violation")] * 3)
    with pytest.raises(RuntimeError, match="23505"):
        retry_on_codes(fn, retries=5, _sleep=lambda _: None)
    assert fn.calls == 1


def test_retryable_then_non_retryable():
    fn = _Flaky(
        [
            RuntimeError("SQLSTATE[40001]: serialization failure"),
            RuntimeError("SQLSTATE[42601]: syntax error"),
        ]
    )
    with pytest.raises(RuntimeError, match="42601"):
        retry_on_codes(fn, retries=5, _sleep=lambda _: None)
    assert fn.calls == 2


def test_budget_exhaustion_reraises_last():
    fn = _Flaky([RuntimeError("SQLSTATE[08006]: connection failure")] * 10)
    sleeps: list[float] = []
    with pytest.raises(RuntimeError, match="08006"):
        retry_on_codes(fn, retries=3, _sleep=sleeps.append)
    assert fn.calls == 3
    assert sleeps == [0.5, 1.0]  # exponential backoff between attempts


def test_retry_codes_none_retries_anything():
    fn = _Flaky([RuntimeError("no code at all")])
    assert retry_on_codes(fn, retries=2, retry_codes=None, _sleep=lambda _: None) == "ok"


def test_pdo_combined_state_and_vendor_code_retries():
    """Real PDO messages carry BOTH a generic SQLSTATE and the decisive
    vendor code: 'SQLSTATE[HY000] [2006] MySQL server has gone away'.
    The retry decision must consider every extractable code — matching
    only the first (HY000, not retryable) would give the exact
    transient failure the default list targets zero retries."""
    from rabbit_data_pipeline_spark.sinks.sql import error_codes_of

    msg = "SQLSTATE[HY000] [2006] MySQL server has gone away"
    assert set(error_codes_of(RuntimeError(msg))) >= {"HY000", "2006"}
    fn = _Flaky([RuntimeError(msg)])
    assert retry_on_codes(fn, retries=3, _sleep=lambda _: None) == "ok"
    assert fn.calls == 2


def test_vendor_code_and_jdbc_message_forms():
    assert error_code_of(RuntimeError("java.sql.SQLException: ... SQLState: 08S01")) == "08S01"
    assert error_code_of(RuntimeError("MySQL error code: 2013, lost connection")) == "2013"
    assert error_code_of(RuntimeError("nothing to see")) is None
    exc = RuntimeError("boring message")
    exc.sqlstate = "40P01"
    assert error_code_of(exc) == "40P01"
    assert "1213" in DEFAULT_RETRY_CODES
