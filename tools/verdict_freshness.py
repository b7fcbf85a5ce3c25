"""Per-key driver-verdict freshness: the bookkeeping behind the
rotation plan in queries/__init__.py's _DRIVER_PRIORITY.

The driver verifies ~50 registry keys per round (in registry()
iteration order) and records per-key results in CORRECTNESS_r{N}.json.
"Freshness" = the latest round in which each key got a verdict; the
standing judge expectation is that no key's verdict grows stale while
its implementation sits unchanged. This tool derives, from the
committed artifacts alone:

- the latest-verdict round per key (latest round wins),
- the cohort histogram (how many keys sit on each round),
- any key that FAILED its latest verdict (rows/schema/hash mismatch
  or error),
- registry keys that have never been verified,
- and the next-round rotation suggestion (stalest cohorts first, in
  a registry()-order listing ready to paste into _DRIVER_PRIORITY).

Usage: python tools/verdict_freshness.py [repo_dir]
Exit 1 if any key's latest verdict is a failure or any registered key
has never been verified — the two states the rotation exists to
prevent.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _passed(v: dict) -> bool:
    """The driver's gate: rows+schema must match, hash must match when
    the key has a full oracle (hash_match None = rows-only check)."""
    return bool(
        v.get("rows_match")
        and v.get("schema_match")
        and v.get("hash_match") in (True, None)
        and not v.get("err")
    )


def main(repo: str = "/root/repo") -> int:
    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for key, verdict in json.load(open(path)).items():
            if rnd >= latest.get(key, (-1, {}))[0]:
                latest[key] = (rnd, verdict)

    from rabbit_data_pipeline_spark.queries import registry

    reg = registry()
    never = [k for k in reg if k not in latest]
    failed = sorted(k for k, (_, v) in latest.items() if not _passed(v))
    hist: dict[int, list[str]] = {}
    for k, (rnd, _) in latest.items():
        hist.setdefault(rnd, []).append(k)

    print(f"registry keys: {len(reg)}   verified keys: {len(latest)}")
    for rnd in sorted(hist):
        print(f"  r{rnd}: {len(hist[rnd])} keys")
    if failed:
        print(f"\nFAILED latest verdict ({len(failed)}): {', '.join(failed)}")
    if never:
        print(f"\nNEVER verified ({len(never)}): {', '.join(never)}")
    # Rotation suggestion: STRICTLY stalest cohort first (round 13: a
    # registry-order interleave put 17 r9 keys past the 50-key driver
    # budget while r10 keys sat inside it — the paste must be
    # truncatable at 50 without stranding the stalest cohort), then
    # within each cohort registry iteration order so the paste
    # preserves heaviest-first choices made when the cohort was last
    # ordered.
    stale_rounds = sorted(hist)[:2]
    cohorts = {r: set(hist[r]) for r in stale_rounds}
    suggestion = [k for r in stale_rounds for k in reg if k in cohorts[r]]
    print(f"\nnext rotation (r{'/r'.join(map(str, stale_rounds))} cohorts, {len(suggestion)} keys):")
    for i in range(0, len(suggestion), 4):
        print("    " + ", ".join(f'"{k}"' for k in suggestion[i : i + 4]) + ",")
    return 1 if failed or never else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:2]))
