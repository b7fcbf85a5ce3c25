"""Vet a candidate idle-record sidecar before committing it as the
canonical trend record (SCALING.md quiet-window policy, VERDICT r13
ask #4). Acceptance is mechanical:

- both per-segment hypervisor steals present and < 0.5%,
- zero stall events — a non-first run > 2x its query's min without a
  covering GC spike (first runs may carry warm-up; a GC spike > 30%
  of the run wall attributes the outlier to heap, not host),
- the stream probe ran AND reported a real throughput (a skipped
  probe — SPARK_GRAFT_NO_SCALE=1 or a non-default sf dir — is a
  different defect than a starved one, and the rejection trail says
  which; neither is acceptable for the canonical record).

A steal near-miss may carry an explicit machine-readable waiver
(VERDICT r14 ask #2) — ``vet_waiver`` in the sidecar — which this
tool VALIDATES and prints rather than trusts: the waiver must name
the segment, record the measured steal it was written for (a waiver
can't blanket-cover a later, worse record), stay under 2x the
threshold (ambient-noise near-misses only, never real contamination),
and carry at least one cross-validating CLEAN window (steal under the
threshold) whose independently-measured segment total the committed
record does not exceed by more than 5% — i.e. the steal provably did
not inflate the floor. An invalid waiver is itself a REJECT reason,
so "accepted near-miss" is a recorded, checkable state instead of a
SCALING.md footnote.

Exit 0 = ACCEPT, 1 = REJECT (each reason printed). The rejected
windows' vet output is the documented rejection trail.

Usage: python tools/vet_idle_record.py [BENCH_DETAIL.json]
"""

from __future__ import annotations

import json
import sys

STEAL_MAX_PCT = 0.5
WAIVER_STEAL_CAP_PCT = 2 * STEAL_MAX_PCT
CROSS_VAL_TOL_PCT = 5.0
STALL_RATIO = 2.0
GC_COVER_FRACTION = 0.3

# segment short-name → (steal key, segment-total key)
_SEGMENTS = {
    "sf01": ("host_steal_pct_sf01", "value"),
    "sf0.1": ("host_steal_pct_sf01", "value"),
    "sf1": ("host_steal_pct_sf1", "sf1_total"),
}


def _waiver_check(record: dict, steal_key: str, measured: float) -> tuple[bool, str]:
    """Return (covered, message). ``covered`` only when the waiver is
    mechanically valid for THIS record's measured steal; the message
    is a WAIVED line when covered, else the specific invalidity (which
    becomes a REJECT reason — a malformed waiver never silently
    falls back to the bare threshold message)."""
    w = record.get("vet_waiver")
    if not isinstance(w, dict):
        return False, ""
    seg = str(w.get("segment", ""))
    w_steal_key, total_key = _SEGMENTS.get(seg, (None, None))
    if w_steal_key != steal_key:
        return False, ""  # waiver names a different segment — not ours to judge
    w_steal = w.get("steal_pct")
    if not isinstance(w_steal, (int, float)):
        return False, f"vet_waiver for {seg} lacks a numeric steal_pct"
    if measured > w_steal:
        return False, (
            f"vet_waiver for {seg} was written for steal {w_steal}% but this "
            f"record measured {measured}% — a waiver never covers a worse record"
        )
    if w_steal >= WAIVER_STEAL_CAP_PCT:
        return False, (
            f"vet_waiver steal {w_steal}% >= {WAIVER_STEAL_CAP_PCT}% cap — "
            "near-miss waivers only, that's contamination"
        )
    xvals = w.get("cross_validated_by")
    if not isinstance(xvals, list) or not xvals:
        return False, f"vet_waiver for {seg} lacks cross_validated_by entries"
    total = record.get(total_key)
    if not isinstance(total, (int, float)):
        return False, f"vet_waiver for {seg} can't validate: record has no {total_key}"
    clean = []
    for x in xvals:
        if not isinstance(x, dict):
            return False, f"vet_waiver cross-validation entries must be dicts, got {x!r}"
        xs, xt = x.get("steal_pct"), x.get("total_sec")
        if not isinstance(xs, (int, float)) or not isinstance(xt, (int, float)):
            return False, (
                f"vet_waiver cross-validation entry {x.get('window')!r} lacks "
                "steal_pct/total_sec — entries must be independently checkable"
            )
        if xs < STEAL_MAX_PCT and total <= xt * (1 + CROSS_VAL_TOL_PCT / 100.0):
            clean.append(x)
    if not clean:
        return False, (
            f"vet_waiver for {seg}: no cross-validation entry is both clean "
            f"(steal < {STEAL_MAX_PCT}%) and within {CROSS_VAL_TOL_PCT}% of the "
            f"record's {total_key}={total}s — the steal may have inflated the floor"
        )
    wins = ", ".join(
        f"{x.get('window')}({x['steal_pct']}% -> {x['total_sec']}s)" for x in clean
    )
    return True, (
        f"WAIVED: {steal_key} = {measured}% >= {STEAL_MAX_PCT}% — explicit waiver, "
        f"cross-validated by clean window(s) {wins} vs record {total_key}={total}s"
    )


def vet(record: dict) -> tuple[bool, list[str], list[str]]:
    """Returns (accept, reject_reasons, waived_lines)."""
    reasons: list[str] = []
    waived: list[str] = []
    for seg in ("host_steal_pct_sf01", "host_steal_pct_sf1"):
        v = record.get(seg)
        if v is None:
            reasons.append(f"{seg} missing (pre-instrument record or failed snapshot)")
        elif v >= STEAL_MAX_PCT:
            covered, msg = _waiver_check(record, seg, v)
            if covered:
                waived.append(msg)
            elif msg:
                reasons.append(f"{seg} = {v}% >= {STEAL_MAX_PCT}% AND {msg}")
            else:
                reasons.append(f"{seg} = {v}% >= {STEAL_MAX_PCT}%")
    for section in ("queries_stats", "sf1_stats", "extended_stats", "sf1_extended_stats"):
        for name, s in (record.get(section) or {}).items():
            runs = s.get("runs", [])
            gc = s.get("gc_ms") or [None] * len(runs)
            mn = s.get("min", 0.0)
            for i, (r, g) in enumerate(zip(runs, gc)):
                if i > 0 and mn > 0 and r > STALL_RATIO * mn:
                    if g is not None and g > GC_COVER_FRACTION * r * 1000:
                        continue  # heap-attributed, not a host stall
                    reasons.append(
                        f"stall event {section}/{name} run{i}: {r}s vs min {mn}s (gc {g}ms)"
                    )
    # Distinguish "probe never ran" from "probe ran and starved"
    # (ADVICE r14): bench.py omits BOTH keys when the probe is skipped
    # (SPARK_GRAFT_NO_SCALE=1 / non-default sf dir) and records
    # stream_error when it refuses a starved 0.0 — the rejection trail
    # must say which defect this window had.
    if "stream_rows_per_sec" not in record and "stream_error" not in record:
        reasons.append(
            "stream probe not run (skipped: SPARK_GRAFT_NO_SCALE=1 or non-default "
            "sf dir) — the canonical record requires the probe"
        )
    elif not record.get("stream_rows_per_sec"):
        reasons.append(
            f"stream probe starved/errored: rows_per_sec={record.get('stream_rows_per_sec')} "
            f"stream_error={record.get('stream_error')!r}"
        )
    return (not reasons, reasons, waived)


def main(path: str = "BENCH_DETAIL.json") -> int:
    record = json.load(open(path))
    print(
        f"{path}: sf0.1 {record.get('value')}s sf1 {record.get('sf1_total')}s  "
        f"steal sf0.1 {record.get('host_steal_pct_sf01')}% sf1 {record.get('host_steal_pct_sf1')}%  "
        f"calib {record.get('host_calib_sec')}/{record.get('host_calib_par_sec')}  "
        f"stream {record.get('stream_rows_per_sec')}"
    )
    ok, reasons, waived = vet(record)
    for w in waived:
        print(w)
    for r in reasons:
        print(f"REJECT: {r}")
    print("VERDICT:", "ACCEPT" if ok else "REJECT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
