"""Mechanical attribution for plan-hash RULE changes across rounds.

bench._plan_hash's normalization is versioned (v1 → v2 in round 9,
v2 → v3 in round 10); when two rounds' sidecars carry different rule
versions, a hash difference can be the rule change rather than a plan
change. This script closes that attribution mechanically: it REPLAYS
the old bench's exact builder-call sequence (1 warm-up build, then
runs_per_query + 1 builds per headline query in HEADLINE order —
builds only; execution allocates no expression ids) computing hashes
under the OLD round's rules, and compares them to the old sidecar. A
query whose replayed old-rules hash equals its sidecar hash has a
byte-identical old-rules-normalized plan — so any difference under
the new rules is the rule change alone, not a plan change.

History: round 9's v1→v2 strip of lambda names / RDD ids+call-sites
(`MapPartitionsRDD[778] at localCheckpoint at
NativeMethodAccessorImpl.java:0`) / JVM identity hashes
(`UnsafeArrayData@e4ee577e`) removed v1's dependence on the bench
process's CALL ORDER. Round 10's v2→v3 anchored the identity-hash
rule to a class-like token so quoted plan literals (e.g. a filter on
'user@deadbee') survive normalization; on every committed plan the
v3 text is byte-identical to v2's, which this script proves by
replaying a v2 sidecar.

Usage: python tools/hash_rules_replay.py BENCH_DETAIL_r09.json [sf_dir] [--execute]
Exit 1 if any replayed old-rules hash differs from the old sidecar (a
REAL plan move, attribute it the usual way).

--execute: also EXECUTE the warm-up and the timed runs per query
(noop sink), exactly like bench.main — needed for queries whose plan
embeds a localCheckpoint ExistingRDD (dedup_minhash) when replaying
v1 rules: the v1 text keeps the RDD id, and RDD ids count every job
run earlier in the session, so only an executed replay reproduces
them. Build-only (the default) is enough for every scan-lineage plan
— and for ALL plans under v2+ rules (RDD ids are normalized away) —
and runs in seconds. A build-only mismatch on a v1 ExistingRDD plan
prints a re-run hint instead of being trusted as a real move
(VERDICT r9 ask #4).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cheap_mode_hint(name: str, plan_text: str, rules: str, execute: bool) -> str | None:
    """The loud-before-wrong guard on build-only replays (VERDICT r9
    ask #4): under v1 rules an ExistingRDD scan keeps its session-
    monotonic RDD id in the hashed text, so a NON-executed replay
    mismatch on such a plan is expected, not evidence of a plan move.
    Returns the hint line to print, or None when the mismatch stands
    on its own (executed replay, v2+ rules, or no ExistingRDD)."""
    if execute or rules != "v1" or "ExistingRDD" not in plan_text:
        return None
    return (
        f"  hint: {name}'s plan embeds an ExistingRDD and v1 keeps RDD ids — "
        "re-run with --execute before calling this a real plan move"
    )


def main(old_path: str, sf_dir: str = "/root/testdata/sf0.1", execute: bool = False) -> int:
    import bench
    from rabbit_data_pipeline_spark.queries import registry
    from rabbit_data_pipeline_spark.queries.llm import dedup_minhash_scale
    from rabbit_data_pipeline_spark.session import get_spark

    old = json.load(open(old_path))
    old_hashes = old.get("plan_hashes", {})
    rules = old.get("plan_hash_rules", "v1")
    if rules == bench.PLAN_HASH_RULES:
        print(
            f"{old_path} already carries the current rules ({rules}); "
            "compare sidecars directly with tools/bench_diff.py"
        )
        return 0
    if rules not in ("v1", "v2", "v3"):
        # An unknown ruleset would fall through _normalize_plan's
        # version branches and silently get v1-era normalization —
        # every hash would mismatch and the tool would confidently
        # report 17 phantom plan moves. Refuse instead.
        print(
            f"{old_path} carries unknown hash rules {rules!r} — this replay "
            "build only knows v1/v2/v3; run the replay from the round that "
            "introduced those rules"
        )
        return 2

    spark = get_spark("hash-replay")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    overrides = {"dedup_minhash": dedup_minhash_scale}

    def _builder(name):
        return overrides.get(name) or (reg[name].builder if name in reg else None)

    def _run(df):
        if execute:
            df.write.format("noop").mode("overwrite").save()

    # Replay the old round's sequence: warm-up built q_filter_project
    # once, then each headline query was built runs_per_query (timed)
    # + 1 (hashed) times — read the run count from the sidecar itself:
    # v1 hashes depend on the exact number of prior builder calls, so
    # replaying a hardcoded 5 against a runs=3 sidecar would shift
    # every lambda counter and report phantom plan moves.
    runs = int(old.get("runs_per_query", 5))
    _run(_builder("q_filter_project")(spark, sf_dir))
    mismatched = []
    hints = []
    print(f"{'query':24} {'old (' + rules + ')':>14} {'replayed':>14} {'verdict'}")
    # Iterate only queries the OLD round actually hashed: a query
    # added to HEADLINE since then was never built in the old bench,
    # so building it here would shift the session-global lambda/RDD
    # counters and cascade phantom "PLAN MOVED" verdicts onto every
    # later query (assumes HEADLINE only ever grows in place — true
    # for r1..r10; a reordering would need the old round's list).
    skipped = [n for n in bench.HEADLINE if n not in old_hashes]
    for name in bench.HEADLINE:
        if name in skipped:
            continue
        b = _builder(name)
        if b is None:
            continue
        for _ in range(runs):
            _run(b(spark, sf_dir))
        df = b(spark, sf_dir)
        try:
            text = bench._plan_text(df)
            import hashlib

            h = hashlib.sha256(bench._normalize_plan(text, rules).encode()).hexdigest()[:12]
        except Exception as e:
            # bench._plan_hash publishes the sentinel VERBATIM, so the
            # replay must too — hashing it would make an identically
            # erroring plan look like a phantom PLAN MOVED.
            text = h = f"err:{type(e).__name__}"
        ref = old_hashes[name]
        ok = h == ref
        if not ok:
            mismatched.append(name)
            hint = _cheap_mode_hint(name, text, rules, execute)
            if hint:
                hints.append(hint)
        print(f"{name:24} {ref:>14} {h:>14} {'plan unchanged' if ok else 'PLAN MOVED'}")
    if skipped:
        print(f"skipped (absent from the old sidecar): {', '.join(skipped)}")
    if mismatched:
        print(
            f"\n{rules} replay mismatch ({len(mismatched)}): {', '.join(mismatched)} — "
            "real plan moves, attribute them"
        )
        for hint in hints:
            print(hint)
    else:
        print(
            f"\nall {rules} hashes reproduce the old sidecar: every "
            f"{bench.PLAN_HASH_RULES} difference is the rule change, not a plan change"
        )
    return 1 if mismatched else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--execute"]
    if not argv or len(argv) > 2:
        print("usage: python tools/hash_rules_replay.py OLD_SIDECAR.json [sf_dir] [--execute]")
        sys.exit(2)
    sys.exit(main(*argv, execute="--execute" in sys.argv))
