"""Round-over-round bench comparison: plan hashes + timings, with
calibration-backed {plan, host, real} attribution.

Usage:
  python tools/bench_diff.py OLD.json NEW.json [--idle IDLE.json]

For each headline query — and, since round 9, each extended probe
(VERDICT r8 ask #1) — prints whether the normalized optimized-plan
hash moved and the min-timing delta against the noise envelope (the
r7 methodology: same hash + delta inside the envelope = host noise;
moved hash or a min shifted past the envelope = investigate).

Since round 11 (VERDICT r10 ask #2) the old/new records both carry
host-calibration probes (fixed CPU work, serial + 16-way) and
per-run spreads, so every envelope-breaker gets a MECHANICAL label:

  plan          — the normalized plan hash moved; attribute the change
  host(calib)   — the calibration probes shifted by ~the same factor:
                  the machine got slower/faster, not the plan
  host(uniform) — calibration can't explain it, but nearly every
                  same-plan query moved the same direction by a
                  similar magnitude (the round-10 throttled-host
                  signature: sustained-load steal that burst
                  calibrations undersample)
  REAL          — same plan, quiet host, this query alone moved past
                  its envelope: a genuine performance change

--idle compares the NEW (official driver) record against the
committed idle-host sidecar (VERDICT r10 ask #3: the two can tell
opposite stories; the policy in SCALING.md makes the idle sidecar
canonical for trend and the official record the driver-of-record,
and this tool warns when they diverge beyond what their calibration
ratio explains).

Exit code 1 when any hash moved or any breaker is labeled REAL, so a
round script can force the attribution step.
"""

from __future__ import annotations

import json
import os
import sys

#: An envelope-breaker whose |delta - expected_shift| is inside the
#: envelope plus this slack still counts as explained — calibration
#: probes are themselves ±few-percent instruments.
_CALIB_SLACK_PCT = 10.0


def _calib_shifts_pct(old: dict, new: dict) -> list[float]:
    """How much fixed CPU work slowed down (+) or sped up (−) between
    the two records, as percents — BOTH the serial and 16-way probes
    (they can disagree in sign on a mixed window: single-core boost up,
    core budget down; a query explained by either is host-attributed).
    Empty when either side lacks the fields."""
    shifts = []
    for key in ("host_calib_sec", "host_calib_par_sec"):
        o, n = old.get(key), new.get(key)
        if o and n:
            shifts.append((n - o) / o * 100.0)
    return shifts


def _rows(oh, nh, os_, ns_, oq, nq) -> list[dict]:
    """One comparison row per query name: plan verdict, delta%, and
    the noise envelope (the larger of the two rounds' spreads — either
    side's jitter makes a min untrustworthy)."""
    rows = []
    for name in sorted(set(oh) | set(nh) | set(oq) | set(nq)):
        a, b = oh.get(name), nh.get(name)
        if a is None and b is None:
            plan = "-"  # timed but never hashed (pre-r9 extended rows)
        else:
            plan = "same" if a == b else ("NEW" if a is None else ("GONE" if b is None else "MOVED"))
        om, nm = oq.get(name), nq.get(name)
        delta = (nm - om) / om * 100.0 if om and nm else None
        spreads = [
            s.get(name, {}).get("spread_pct")
            for s in (os_, ns_)
            if isinstance(s.get(name, {}).get("spread_pct"), (int, float))
        ]
        rows.append(
            {
                "name": name,
                "plan": plan,
                "old_min": om,
                "new_min": nm,
                "delta_pct": delta,
                "envelope_pct": max(spreads) if spreads else None,
            }
        )
    return rows


def _uniform_shift(deltas: list[float], min_rows: int = 10, floor_pct: float = 15.0):
    """The round-10 throttled-host lesson, mechanized: when nearly
    every SAME-plan query moves in the same direction by a similar
    magnitude, the cause is a host condition (CPU budget, noisy
    neighbor, thermal), not a plan regression — a regression moves
    specific plans, a throttle moves all of them. Returns (warning
    line, median) or (None, None) when the deltas don't fit."""
    if len(deltas) < min_rows:
        return None, None
    med = sorted(deltas)[len(deltas) // 2]
    if abs(med) < floor_pct:
        return None, None
    same_sign = sum(1 for d in deltas if (d > 0) == (med > 0) and abs(d) > 5.0)
    if same_sign / len(deltas) < 0.8:
        return None, None
    return (
        f"UNIFORM SHIFT: {same_sign}/{len(deltas)} same-plan queries moved "
        f"{'+' if med > 0 else ''}{med:.0f}% (median) in the same direction — "
        "the signature of a host-condition change, not a plan regression; "
        "re-run on an idle host before reading the totals as real"
    ), med


def label_row(
    plan: str,
    delta_pct: float | None,
    envelope_pct: float | None,
    calib_shift_pct: float | None,
    uniform_median_pct: float | None,
) -> str:
    """The mechanical attribution (VERDICT r10 ask #2). Tried in
    evidence order: a moved hash is always 'plan'; a delta inside the
    noise envelope is not a finding at all; a breaker the calibration
    shift brackets is the host; a breaker riding a detected uniform
    shift is the host even when burst calibration missed the throttle
    (steal is sustained-load); what remains is REAL."""
    if plan == "MOVED":
        return "plan"
    if delta_pct is None:
        return ""
    if envelope_pct is None:
        # No spread stats on either side (pre-r9 records carried bare
        # mins): without an envelope a delta can't be called a breaker
        # — labeling every jitter REAL against an old record would flip
        # the exit code on pure noise. Same hash + no envelope = the
        # pre-r11 behavior: report the delta, attribute nothing.
        return ""
    # ADVICE r11 #1: spread_pct is rounded to 0.1, so two runs that tie
    # after rounding publish a 0.0 envelope — treating that as a real
    # bound makes ANY nonzero same-plan delta a breaker, and on a quiet
    # host (no calibration shift, no uniform shift) pure jitter would be
    # labeled REAL and flip the exit code. Floor the envelope at 1%: a
    # 0.0 spread is a measurement floor, not evidence of a noise-free
    # query.
    env = max(envelope_pct, 1.0)
    if abs(delta_pct) <= env:
        return "noise" if abs(delta_pct) > 5.0 else "same"
    # Either calibration probe (serial or 16-way) explaining the shift
    # is enough — on a mixed window the two can disagree in sign, and
    # picking only the max-magnitude one mislabeled improvements REAL
    # when the serial probe tracked them exactly.
    shifts = (
        calib_shift_pct
        if isinstance(calib_shift_pct, list)
        else ([calib_shift_pct] if calib_shift_pct is not None else [])
    )
    for shift in shifts:
        if (
            abs(shift) > 2.0
            and (delta_pct > 0) == (shift > 0)
            and abs(delta_pct - shift) <= env + _CALIB_SLACK_PCT
        ):
            return "host(calib)"
    if (
        uniform_median_pct is not None
        and (delta_pct > 0) == (uniform_median_pct > 0)
        and abs(delta_pct - uniform_median_pct) <= max(env, 2 * abs(uniform_median_pct))
    ):
        return "host(uniform)"
    return "REAL"


def record_divergence(official: dict, idle: dict, floor_pct: float = 10.0) -> str | None:
    """VERDICT r10 ask #3: warn when the official driver record and
    the committed idle-host sidecar diverge by more than their own
    calibration ratio explains (plus a noise floor). The two records
    measure the SAME code and plans; any honest gap between them is
    host conditions, and the calibration probes bound how much host
    the official window had. A gap beyond that bound means one of the
    records is not what it claims (wrong code, wrong scale, stale
    sidecar) — stop and reconcile before quoting either."""
    warns = []
    shifts = _calib_shifts_pct(idle, official)  # idle → official host factor
    for key, label in (("value", "sf0.1 total"), ("sf1_total", "sf1 total")):
        o, i = official.get(key), idle.get(key)
        if not (isinstance(o, (int, float)) and isinstance(i, (int, float)) and i):
            continue
        gap = (o - i) / i * 100.0
        # Calibration explains the gap only when a probe moved the SAME
        # direction: a faster-calibrating official host producing a
        # slower total is exactly the "one record is not what it
        # claims" case, not an explained one. Either probe counts
        # (mixed windows can split the two in sign).
        explained = max(
            (abs(s) for s in shifts if (s > 0) == (gap > 0)), default=0.0
        )
        if abs(gap) > explained + floor_pct:
            warns.append(
                f"official {label} {o} vs idle sidecar {i} ({gap:+.1f}%) exceeds the "
                f"calibration-explained {explained:.1f}% + {floor_pct:.0f}% floor"
            )
    if not warns:
        return None
    return (
        "RECORD DIVERGENCE: "
        + "; ".join(warns)
        + " — per SCALING.md policy the idle sidecar is canonical for trend; "
        "reconcile (re-run idle, check sf/scale fields) before quoting either total"
    )


def _floor_maps(floor_rec: dict) -> dict[str, dict[str, tuple[float, float]]]:
    """Per-section {query: (floor_min, floor_envelope_pct)} from a
    quiet floor record, keyed by the same section titles main()
    prints."""
    out: dict[str, dict[str, tuple[float, float]]] = {}
    for title, qkey, skey in (
        ("headline sf0.1", "queries", "queries_stats"),
        ("headline sf1 (hashes shared with sf0.1)", "sf1_queries", "sf1_stats"),
        ("extended sf0.1", "extended_queries", "extended_stats"),
        ("extended sf1 (hashes shared with sf0.1)", "sf1_extended", "sf1_extended_stats"),
    ):
        qs, st = floor_rec.get(qkey) or {}, floor_rec.get(skey) or {}
        out[title] = {
            n: (m, st.get(n, {}).get("spread_pct") or 0.0)
            for n, m in qs.items()
            if isinstance(m, (int, float)) and m > 0
        }
    return out


def _print_section(
    title: str,
    rows: list[dict],
    calib_shift,
    uniform_med,
    old_quarantined: bool = False,
    floor: dict[str, tuple[float, float]] | None = None,
) -> list[dict]:
    """Render one table; returns the envelope-breaker rows (labeled)."""
    breakers = []
    print(f"\n[{title}]")
    print(
        f"{'query':24} {'plan':8} {'old_min':>8} {'new_min':>8} {'delta%':>7} "
        f"{'envelope%':>9}  label"
    )
    for r in rows:
        lab = label_row(r["plan"], r["delta_pct"], r["envelope_pct"], calib_shift, uniform_med)
        # Round 13: an IMPROVEMENT flagged REAL against a record that
        # DECLARES itself trend-quarantined (r12: every idle window
        # carried stalls, so its floors are inflated) is a recovery
        # toward the true floor, not a regression — text_tokens sf1
        # sat at 1.11 s on the quiet r11 record, 1.85 s on the stalled
        # r12 one, 1.29 s on the quiet r13 one, and gating on the
        # -30% "regression" would fail every honest re-anchor. Only
        # the quarantine marker unlocks this relabel; slowdown-side
        # REALs still gate.
        if lab == "REAL" and old_quarantined and (r["delta_pct"] or 0) < 0:
            lab = "recovered"
        # Round 14: the row-scoped sibling of the quarantine relabel.
        # A quiet floor record (the last accepted-quiet window BEFORE
        # the old record — old's `floor_ref`, or --floor) bounds what
        # each row's steady-state min looks like on a clean host. An
        # improvement-side REAL on an unchanged plan where (a) the OLD
        # row sat above its quiet floor beyond the floor's own
        # envelope — i.e. the base min was residually inflated and had
        # documented headroom to recover — and (b) the NEW min hasn't
        # undershot the floor beyond the floor's OWN envelope (ADVICE
        # r14: the old 0.8*f_min bound let a run land up to 20% below
        # the best quiet floor ever measured and still downgrade; a
        # sub-envelope undershoot suggests a semantic change, e.g.
        # wrong data size, and stays REAL) is a floor recovery, not a
        # regression. Slowdown-side REALs are never touched.
        if lab == "REAL" and (r["delta_pct"] or 0) < 0 and floor:
            f = floor.get(r["name"])
            if f and r["old_min"] and r["new_min"]:
                f_min, f_env = f
                had_headroom = r["old_min"] > f_min * (1 + max(f_env, 1.0) / 100.0)
                sane = r["new_min"] >= f_min * (1 - max(f_env, 1.0) / 100.0)
                if had_headroom and sane:
                    lab = "recovered"
        if lab in ("plan", "host(calib)", "host(uniform)", "REAL", "recovered"):
            breakers.append({**r, "label": lab})
        d = f"{r['delta_pct']:+.1f}" if r["delta_pct"] is not None else "-"
        e = f"{r['envelope_pct']:.1f}" if r["envelope_pct"] is not None else "-"
        print(
            f"{r['name']:24} {r['plan']:8} {r['old_min'] or '-':>8} "
            f"{r['new_min'] or '-':>8} {d:>7} {e:>9}  {lab}"
        )
    return breakers


def main(
    old_path: str,
    new_path: str,
    idle_path: str | None = None,
    floor_path: str | None = None,
) -> int:
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    # Round 12: a timing comparison across SCALE FACTORS is garbage in
    # every row (bench.py writes BENCH_DETAIL_LAST.json for ANY
    # non-idle run — including an sf0.01 contract probe — and
    # round_check.sh prefers that file as NEW when present). Refuse
    # loudly rather than label a 10x data difference as host/REAL.
    sides = {}
    for label, rec, path in (("old", old, old_path), ("new", new, new_path)):
        sf = rec.get("sf")
        if isinstance(sf, (int, float)):
            sides[label] = (sf, path)
    if len(sides) == 2 and sides["old"][0] != sides["new"][0]:
        print(
            f"SCALE MISMATCH: {sides['old'][1]} is sf={sides['old'][0]} but "
            f"{sides['new'][1]} is sf={sides['new'][0]} — every delta below would "
            "compare different data sizes; pass records at the same scale "
            "(a stale BENCH_DETAIL_LAST.json from an sf-override probe is the usual cause)"
        )
        return 2
    o_rules, n_rules = old.get("plan_hash_rules", "v1"), new.get("plan_hash_rules", "v1")
    if o_rules != n_rules:
        print(
            f"NOTE: hash rules differ ({o_rules} vs {n_rules}) — a MOVED row may be the rule "
            "change, not a plan change; run tools/hash_rules_replay.py to attribute mechanically"
        )
    for side, rec in (("old", old), ("new", new)):
        w = rec.get("plan_hash_warnings")
        if w:
            print(f"NOTE: {side} record carries plan_hash_warnings (residual identity hashes): {w}")

    calib_shift = _calib_shifts_pct(old, new) or None

    sections = [
        (
            "headline sf0.1",
            _rows(
                old.get("plan_hashes", {}),
                new.get("plan_hashes", {}),
                old.get("queries_stats", {}),
                new.get("queries_stats", {}),
                old.get("queries", {}),
                new.get("queries", {}),
            ),
        ),
    ]
    # sf1 timings share the sf0.1 plan hashes (same builders, same
    # normalized shape) — report the timing deltas against sf1 spreads.
    if old.get("sf1_queries") or new.get("sf1_queries"):
        sections.append(
            (
                "headline sf1 (hashes shared with sf0.1)",
                _rows(
                    {},
                    {},
                    old.get("sf1_stats", {}),
                    new.get("sf1_stats", {}),
                    old.get("sf1_queries", {}),
                    new.get("sf1_queries", {}),
                ),
            )
        )
    sections.append(
        (
            "extended sf0.1",
            _rows(
                old.get("extended_plan_hashes", {}),
                new.get("extended_plan_hashes", {}),
                old.get("extended_stats", {}),
                new.get("extended_stats", {}),
                old.get("extended_queries", {}),
                new.get("extended_queries", {}),
            ),
        )
    )
    if old.get("sf1_extended") or new.get("sf1_extended"):
        sections.append(
            (
                "extended sf1 (hashes shared with sf0.1)",
                _rows(
                    {},
                    {},
                    old.get("sf1_extended_stats", {}),
                    new.get("sf1_extended_stats", {}),
                    old.get("sf1_extended", {}),
                    new.get("sf1_extended", {}),
                ),
            )
        )

    # Uniform-shift median over every same-plan delta, all sections —
    # computed BEFORE printing so the per-row labels can use it.
    all_deltas = [
        r["delta_pct"]
        for _, rows in sections
        for r in rows
        if r["plan"] != "MOVED" and r["delta_pct"] is not None
    ]
    shift_line, uniform_med = _uniform_shift(all_deltas)

    quarantine = old.get("trend_quarantine")
    if quarantine:
        print(
            f"\nNOTE: old record is trend-quarantined ({quarantine}) — its floors are "
            "not a sound baseline; improvement-side breakers below are labeled "
            "'recovered' (non-gating), and trend reads should use the last quiet record"
        )

    # Round 14: quiet-floor reference for row-scoped recovery labels.
    # --floor wins; else the old record can name its own floor record
    # (`floor_ref`, resolved next to the old record's file) — the
    # archived-record analogue of trend_quarantine for records whose
    # TOTALS were quiet but whose fast-row mins were documented as
    # mid-recovery (r13: text_tokens/ann_bruteforce sf1 still above
    # their r11 quiet floors).
    floor_maps: dict[str, dict[str, tuple[float, float]]] = {}
    fp = floor_path or old.get("floor_ref")
    if fp and floor_path is None:
        fp = os.path.join(os.path.dirname(os.path.abspath(old_path)), fp)
    if fp:
        try:
            floor_rec = json.load(open(fp))
            floor_maps = _floor_maps(floor_rec)
            print(
                f"\nNOTE: quiet-floor reference {os.path.basename(fp)} active — "
                "improvement-side REALs on rows whose old min sat above their "
                "quiet floor are labeled 'recovered' (non-gating)"
            )
        except (OSError, ValueError) as e:
            # ValueError covers json.JSONDecodeError: an existing-but-
            # corrupt floor file takes the documented ignore path
            # instead of crashing the diff (ADVICE r14).
            print(f"\nNOTE: quiet-floor reference {fp} unreadable ({e}) — ignored")

    breakers: list[dict] = []
    for title, rows in sections:
        breakers += _print_section(
            title,
            rows,
            calib_shift,
            uniform_med,
            old_quarantined=bool(quarantine),
            floor=floor_maps.get(title),
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
    if calib_shift is not None:
        print(
            "calibration shifts used for labels: "
            + ", ".join(f"{s:+.1f}%" for s in calib_shift)
        )
    s_o, s_n = old.get("host_steal_pct"), new.get("host_steal_pct")
    if s_o is not None and s_n is not None:
        print(
            f"host steal: {s_o}% -> {s_n}% of run CPU stolen by the hypervisor "
            "(sustained-load throttle the burst calibrations can't see)"
        )
    seg_n = [("sf0.1", new.get("host_steal_pct_sf01")), ("sf1", new.get("host_steal_pct_sf1"))]
    if any(v is not None for _, v in seg_n):
        # Round 13: a throttle confined to one segment (the discarded
        # r13 window: sf1-only, 2.5x on the iterative probes) is
        # diluted by the whole-run average — print the split so the
        # contaminated segment names itself. ADVICE r13 #1: a segment
        # whose snapshot failed (transient _cpu_times() error) has no
        # key — print '-' for it rather than 'None%'.
        parts = ", ".join(
            f"{seg} {v}%" if v is not None else f"{seg} -" for seg, v in seg_n
        )
        print(
            f"new-record steal by segment: {parts} "
            "(a lopsided split pins which segment's floors to distrust)"
        )
    if shift_line:
        print(f"\n{shift_line}")

    moved = [b["name"] for b in breakers if b["label"] == "plan"]
    real = [b["name"] for b in breakers if b["label"] == "REAL"]
    hosty = [b for b in breakers if b["label"].startswith("host")]
    if breakers:
        print(f"\nenvelope-breakers ({len(breakers)}):")
        for b in breakers:
            # a MOVED row can lack a timing delta (min missing/0.0 on
            # one side) — the plan attribution must still print
            d = f"{b['delta_pct']:+7.1f}%" if b["delta_pct"] is not None else "      -"
            print(f"  {b['name']:24} {d}  -> {b['label']}")
    if moved:
        print(f"\nplan hashes MOVED ({len(moved)}): {', '.join(moved)} — attribute each before shipping")
    else:
        print("\nall plan hashes unchanged")
    if hosty:
        print(f"host-attributed breakers: {len(hosty)} (calibration/uniform-shift explained)")
    recovered = [b["name"] for b in breakers if b["label"] == "recovered"]
    if recovered:
        print(
            f"recovered toward quiet floors ({len(recovered)}): {', '.join(recovered)}"
        )
    if real:
        print(f"REAL breakers ({len(real)}): {', '.join(real)} — investigate before shipping")

    if idle_path:
        idle = json.load(open(idle_path))
        # ADVICE r12 #2: the cross-scale refusal above only guards
        # old-vs-new; the idle sidecar's sf was never checked, so the
        # official-vs-idle divergence check (canonical for trend per
        # SCALING.md) could silently compare records at different
        # scale factors. Same refusal, same reason.
        i_sf, n_sf = idle.get("sf"), new.get("sf")
        if (
            isinstance(i_sf, (int, float))
            and isinstance(n_sf, (int, float))
            and i_sf != n_sf
        ):
            print(
                f"\nSCALE MISMATCH: idle sidecar {idle_path} is sf={i_sf} but "
                f"{new_path} is sf={n_sf} — the official-vs-idle divergence check "
                "would compare different data sizes; re-record the idle sidecar "
                "at the official record's scale"
            )
            return 2
        warn = record_divergence(new, idle)
        if warn:
            print(f"\n{warn}")
        else:
            print("\nofficial record agrees with the idle sidecar within the calibration bound")

    return 1 if (moved or real) else 0


if __name__ == "__main__":
    _usage = "usage: bench_diff.py OLD.json NEW.json [--idle IDLE.json] [--floor FLOOR.json]"
    _argv = sys.argv[1:]
    _opts = {"--idle": None, "--floor": None}
    for _flag in list(_opts):
        if _flag in _argv:
            _i = _argv.index(_flag)
            if _i + 1 >= len(_argv):
                print(_usage, file=sys.stderr)
                sys.exit(2)
            _opts[_flag] = _argv[_i + 1]
            _argv = _argv[:_i] + _argv[_i + 2 :]
    if len(_argv) != 2:
        print(_usage, file=sys.stderr)
        sys.exit(2)
    sys.exit(main(_argv[0], _argv[1], _opts["--idle"], _opts["--floor"]))
