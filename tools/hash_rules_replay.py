"""One-shot attribution for the v1→v2 plan-hash rule change (round 9).

Round 9 strengthened bench._plan_hash's normalization (rules "v2"):
lambda-variable names (`lambda x_3` — a session-global counter), RDD
ids + call-sites (`MapPartitionsRDD[778] at localCheckpoint at
NativeMethodAccessorImpl.java:0` — monotonic id, and the reflective
frame name flips once the JVM inflates the accessor) and JVM identity
hashes (`UnsafeArrayData@e4ee577e`) are stripped. Under v1 those made
the hash depend on the bench process's CALL ORDER, not the plan —
stable only while bench.py's query sequence never changed.

Consequence: some r9 hashes differ from r8's even though no plan
moved. This script closes that attribution mechanically: it REPLAYS
the r8 bench's exact builder-call sequence (1 warm-up build, then 6
builds per headline query in HEADLINE order — 5 timed + 1 hashed —
builds only; execution allocates no expression ids) computing v1
hashes, and compares them to the r8 sidecar. A query whose replayed
v1 hash equals its r8 hash has a byte-identical v1-normalized plan —
so any v2 difference for it is the rule change alone, not a plan
change.

Usage: python tools/hash_rules_replay.py BENCH_DETAIL_r08.json [sf_dir] [--execute]
Exit 1 if any replayed v1 hash differs from the old sidecar (a REAL
plan move, attribute it the usual way).

--execute: also EXECUTE the warm-up and the 5 timed runs per query
(noop sink), exactly like bench.main — needed for queries whose plan
embeds a localCheckpoint ExistingRDD (dedup_minhash): the v1 text
keeps the RDD id, and RDD ids count every job run earlier in the
session, so only an executed replay reproduces them. Build-only (the
default) is enough for every scan-lineage plan and runs in seconds.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(old_path: str, sf_dir: str = "/root/testdata/sf0.1", execute: bool = False) -> int:
    import bench
    from rabbit_data_pipeline_spark.queries import registry
    from rabbit_data_pipeline_spark.queries.llm import dedup_minhash_scale
    from rabbit_data_pipeline_spark.session import get_spark

    old = json.load(open(old_path))
    old_hashes = old.get("plan_hashes", {})
    if old.get("plan_hash_rules", "v1") != "v1":
        print(f"{old_path} already carries {old['plan_hash_rules']} hashes; nothing to replay")
        return 0

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
    print(f"{'query':24} {'old (v1)':>14} {'replayed v1':>14} {'verdict'}")
    # Iterate only queries the OLD round actually hashed: a query
    # added to HEADLINE since then was never built in the old bench,
    # so building it here would shift the session-global lambda/RDD
    # counters and cascade phantom "PLAN MOVED" verdicts onto every
    # later query (assumes HEADLINE only ever grows in place — true
    # for r1..r9; a reordering would need the old round's list).
    skipped = [n for n in bench.HEADLINE if n not in old_hashes]
    for name in bench.HEADLINE:
        if name in skipped:
            continue
        b = _builder(name)
        if b is None:
            continue
        for _ in range(runs):
            _run(b(spark, sf_dir))
        h = bench._plan_hash(b(spark, sf_dir), rules="v1")
        ref = old_hashes[name]
        ok = h == ref
        if not ok:
            mismatched.append(name)
        print(f"{name:24} {ref:>14} {h:>14} {'plan unchanged' if ok else 'PLAN MOVED'}")
    if skipped:
        print(f"skipped (absent from the old sidecar): {', '.join(skipped)}")
    if mismatched:
        print(f"\nv1 replay mismatch ({len(mismatched)}): {', '.join(mismatched)} — real plan moves, attribute them")
    else:
        print("\nall v1 hashes reproduce the old sidecar: every v2 difference is the rule change, not a plan change")
    return 1 if mismatched else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--execute"]
    if not argv or len(argv) > 2:
        print("usage: python tools/hash_rules_replay.py OLD_SIDECAR.json [sf_dir] [--execute]")
        sys.exit(2)
    sys.exit(main(*argv, execute="--execute" in sys.argv))
