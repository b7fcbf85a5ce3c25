#!/bin/sh
# Round gate (VERDICT r11 ask #4): the two-sided calibrated bench diff
# + record-divergence check, run as a ROUND STEP rather than ad hoc —
# bench_diff exits non-zero on any plan-moved or REAL-labeled breaker,
# so the attribution step cannot be skipped, and --idle always points
# at the committed canonical idle sidecar (SCALING.md policy) so a
# driver-window record is flagged the moment it diverges beyond its
# own calibration ratio.
#
# Usage:
#   tools/round_check.sh OLD_SIDECAR [NEW_SIDECAR]
#
# OLD_SIDECAR: last round's archived record (BENCH_DETAIL_r{N}.json).
# NEW_SIDECAR: defaults to BENCH_DETAIL_LAST.json (the most recent
# non-idle run — e.g. the driver's window) when present, else the
# canonical BENCH_DETAIL.json (comparing idle record to idle record).
set -e
cd "$(dirname "$0")/.."
OLD="${1:?usage: round_check.sh OLD_SIDECAR [NEW_SIDECAR]}"
if [ -n "$2" ]; then
  NEW="$2"
elif [ -f BENCH_DETAIL_LAST.json ]; then
  NEW="BENCH_DETAIL_LAST.json"
else
  NEW="BENCH_DETAIL.json"
fi
exec python tools/bench_diff.py "$OLD" "$NEW" --idle BENCH_DETAIL.json
