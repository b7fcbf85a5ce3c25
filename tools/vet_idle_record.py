"""Vet a candidate idle-record sidecar before committing it as the
canonical trend record (SCALING.md quiet-window policy, VERDICT r13
ask #4). Acceptance is mechanical:

- both per-segment hypervisor steals present and < 0.5%,
- zero stall events — a non-first run > 2x its query's min without a
  covering GC spike (first runs may carry warm-up; a GC spike > 30%
  of the run wall attributes the outlier to heap, not host),
- the stream probe reported a real throughput (a starved probe now
  records stream_error instead of 0.0 — either way, not acceptable
  for the canonical record).

Exit 0 = ACCEPT, 1 = REJECT (each reason printed). The rejected
windows' vet output is the documented rejection trail.

Usage: python tools/vet_idle_record.py [BENCH_DETAIL.json]
"""

from __future__ import annotations

import json
import sys

STEAL_MAX_PCT = 0.5
STALL_RATIO = 2.0
GC_COVER_FRACTION = 0.3


def vet(record: dict) -> tuple[bool, list[str]]:
    reasons: list[str] = []
    for seg in ("host_steal_pct_sf01", "host_steal_pct_sf1"):
        v = record.get(seg)
        if v is None:
            reasons.append(f"{seg} missing (pre-instrument record or failed snapshot)")
        elif v >= STEAL_MAX_PCT:
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
    if not record.get("stream_rows_per_sec"):
        reasons.append(
            f"stream probe unusable: rows_per_sec={record.get('stream_rows_per_sec')} "
            f"stream_error={record.get('stream_error')!r}"
        )
    return (not reasons, reasons)


def main(path: str = "BENCH_DETAIL.json") -> int:
    record = json.load(open(path))
    print(
        f"{path}: sf0.1 {record.get('value')}s sf1 {record.get('sf1_total')}s  "
        f"steal sf0.1 {record.get('host_steal_pct_sf01')}% sf1 {record.get('host_steal_pct_sf1')}%  "
        f"calib {record.get('host_calib_sec')}/{record.get('host_calib_par_sec')}  "
        f"stream {record.get('stream_rows_per_sec')}"
    )
    ok, reasons = vet(record)
    for r in reasons:
        print(f"REJECT: {r}")
    print("VERDICT:", "ACCEPT" if ok else "REJECT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
