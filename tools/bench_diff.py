"""Round-over-round bench comparison: plan hashes + timings.

Usage: python tools/bench_diff.py BENCH_DETAIL_r07.json BENCH_DETAIL.json

For each headline query — and, since round 9, each extended probe
(VERDICT r8 ask #1) — prints whether the normalized optimized-plan
hash moved (plan change — intended or regression, attribute it) and
the min-timing delta with the old round's spread so noise is
distinguishable from real movement (the r7 methodology: same hash +
delta inside the spread envelope = host noise; moved hash or a min
shifted past the spread = investigate). Exit code 1 when any hash
moved, so a round script can force the attribution step.
"""

from __future__ import annotations

import json
import sys


def _section(title, oh, nh, os_, oq, nq, deltas_out=None) -> list[str]:
    """Print one hash+timing table; returns the MOVED names. When
    `deltas_out` is given, every unmoved row's delta% is appended to
    it for the uniform-shift detector below."""
    moved = []
    print(f"\n[{title}]")
    print(f"{'query':24} {'plan':8} {'old_min':>8} {'new_min':>8} {'delta%':>7} {'old_spread%':>11}")
    for name in sorted(set(oh) | set(nh) | set(oq) | set(nq)):
        a, b = oh.get(name), nh.get(name)
        if a is None and b is None:
            plan = "-"  # timed but never hashed (pre-r9 extended rows)
        else:
            plan = "same" if a == b else ("NEW" if a is None else ("GONE" if b is None else "MOVED"))
        if plan == "MOVED":
            moved.append(name)
        om, nm = oq.get(name), nq.get(name)
        delta = f"{(nm - om) / om * 100:+.1f}" if om and nm else "-"
        spread = os_.get(name, {}).get("spread_pct", "-")
        print(f"{name:24} {plan:8} {om or '-':>8} {nm or '-':>8} {delta:>7} {spread:>11}")
        if deltas_out is not None and plan != "MOVED" and om and nm:
            deltas_out.append((nm - om) / om * 100)
    return moved


def _uniform_shift(deltas: list[float], min_rows: int = 10, floor_pct: float = 15.0) -> str | None:
    """The round-10 throttled-host lesson, mechanized: when nearly
    every SAME-plan query moves in the same direction by a similar
    magnitude, the cause is a host condition (CPU budget, noisy
    neighbor, thermal), not a plan regression — a regression moves
    specific plans, a throttle moves all of them. Returns the warning
    line, or None when the deltas don't fit the pattern."""
    if len(deltas) < min_rows:
        return None
    med = sorted(deltas)[len(deltas) // 2]
    if abs(med) < floor_pct:
        return None
    same_sign = sum(1 for d in deltas if (d > 0) == (med > 0) and abs(d) > 5.0)
    if same_sign / len(deltas) < 0.8:
        return None
    return (
        f"UNIFORM SHIFT: {same_sign}/{len(deltas)} same-plan queries moved "
        f"{'+' if med > 0 else ''}{med:.0f}% (median) in the same direction — "
        "the signature of a host-condition change, not a plan regression; "
        "re-run on an idle host before reading the totals as real"
    )


def main(old_path: str, new_path: str) -> int:
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    o_rules, n_rules = old.get("plan_hash_rules", "v1"), new.get("plan_hash_rules", "v1")
    if o_rules != n_rules:
        print(
            f"NOTE: hash rules differ ({o_rules} vs {n_rules}) — a MOVED row may be the rule "
            "change, not a plan change; run tools/hash_rules_replay.py to attribute mechanically"
        )
    deltas: list[float] = []
    moved = _section(
        "headline sf0.1",
        old.get("plan_hashes", {}),
        new.get("plan_hashes", {}),
        old.get("queries_stats", {}),
        old.get("queries", {}),
        new.get("queries", {}),
        deltas_out=deltas,
    )
    # sf1 timings share the sf0.1 plan hashes (same builders, same
    # normalized shape) — report the timing deltas against sf1 spreads.
    if old.get("sf1_queries") or new.get("sf1_queries"):
        _section(
            "headline sf1 (hashes shared with sf0.1)",
            {},
            {},
            old.get("sf1_stats", {}),
            old.get("sf1_queries", {}),
            new.get("sf1_queries", {}),
            deltas_out=deltas,
        )
    moved += _section(
        "extended sf0.1",
        old.get("extended_plan_hashes", {}),
        new.get("extended_plan_hashes", {}),
        old.get("extended_stats", {}),
        old.get("extended_queries", {}),
        new.get("extended_queries", {}),
    )
    if old.get("sf1_extended") or new.get("sf1_extended"):
        _section(
            "extended sf1 (hashes shared with sf0.1)",
            {},
            {},
            old.get("sf1_extended_stats", {}),
            old.get("sf1_extended", {}),
            new.get("sf1_extended", {}),
        )
    t_old, t_new = old.get("value"), new.get("value")
    if t_old and t_new:
        print(f"\ntotal: {t_old} -> {t_new} ({(t_new - t_old) / t_old * 100:+.1f}%)")
    s_old, s_new = old.get("sf1_total"), new.get("sf1_total")
    if s_old and s_new:
        print(f"sf1_total: {s_old} -> {s_new} ({(s_new - s_old) / s_old * 100:+.1f}%)")
    for key, label in (
        ("host_calib_sec", "host calibration (1-core)"),
        ("host_calib_par_sec", "host calibration (16-way)"),
    ):
        c_old, c_new = old.get(key), new.get(key)
        if c_old and c_new:
            print(
                f"\n{label}: {c_old} -> {c_new} s "
                f"({(c_new - c_old) / c_old * 100:+.1f}% — fixed CPU work; a shift here "
                "rescales every timing below it)"
            )
    s_o, s_n = old.get("host_steal_pct"), new.get("host_steal_pct")
    if s_o is not None and s_n is not None:
        print(
            f"host steal: {s_o}% -> {s_n}% of run CPU stolen by the hypervisor "
            "(sustained-load throttle the burst calibrations can't see)"
        )
    shift = _uniform_shift(deltas)
    if shift:
        print(f"\n{shift}")
    if moved:
        print(f"\nplan hashes MOVED ({len(moved)}): {', '.join(moved)} — attribute each before shipping")
    else:
        print("\nall plan hashes unchanged")
    return 1 if moved else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
