"""Hunt a quiet host window for the canonical idle record — and VET
the result AFTER the run, not just before launch.

Round-15 window 2 proved the probe-then-launch gate alone is
insufficient: two consecutive quiet 30 s steal probes cleared the
launch, then the host turned noisy mid-run (5.69% sf0.1 segment
steal, three uncovered stalls, a starved stream probe) and the run
overwrote the committed ``BENCH_DETAIL.json`` with a record its own
vet tool REJECTs. This tool makes the full discipline mechanical:

  probe until two consecutive quiet windows
    -> launch ``SPARK_GRAFT_IDLE_RECORD=1 python bench.py``
    -> vet the produced sidecar with ``tools/vet_idle_record.py``
    -> ACCEPT: stop, leave the record in the working tree
    -> REJECT: archive the record + vet output (the rejection
       trail), ``git checkout`` the committed record, keep hunting

Every window's vet output is archived next to its sidecar, so the
SCALING.md trail table can be written straight from the artifacts.

Usage: python tools/hunt_idle_record.py [--budget-hours H]
           [--max-windows N] [--start-window K] [--archive-dir DIR]
Exit 0 = a window ACCEPTed; 2 = budget exhausted while probing;
3 = max windows / budget exhausted without an ACCEPT.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

PROBE_SEC = 30
QUIET_STREAK = 2
STEAL_THRESH_PCT = 0.30


def hunt(
    probe,
    launch,
    vet,
    archive,
    restore,
    *,
    clock,
    budget_sec: float,
    max_windows: int,
    start_window: int = 1,
    log=lambda msg: None,
) -> int:
    """The decision loop, with every host interaction injected so the
    gate logic is testable without a 20-minute bench run.

    probe() -> float            one steal-percentage sample (blocks PROBE_SEC)
    launch(window) -> int       run the idle bench, return its exit code
    vet(window) -> (int, str)   vet the produced sidecar: (exit code, output)
    archive(window, vet_out)    save the rejected sidecar + vet text
    restore()                   put the committed record back in the tree
    clock() -> float            monotonic seconds (budget accounting)

    Returns the exit code documented in the module docstring. An
    ACCEPT requires BOTH the bench exit and the vet exit to be 0 — a
    crashed bench that leaves a stale-but-vettable sidecar behind must
    never be committed as a fresh record.
    """
    t0 = clock()
    window = start_window
    while window < start_window + max_windows:
        streak = 0
        while streak < QUIET_STREAK:
            if clock() - t0 > budget_sec:
                log("budget exhausted while probing")
                return 2
            steal = probe()
            streak = streak + 1 if steal < STEAL_THRESH_PCT else 0
            log(f"probe steal {steal:.3f}% (quiet streak {streak})")
        log(f"window {window}: launching idle record run")
        bench_rc = launch(window)
        vet_rc, vet_out = vet(window)
        log(f"window {window}: bench exit {bench_rc}, vet exit {vet_rc}")
        if bench_rc == 0 and vet_rc == 0:
            log(f"window {window}: ACCEPT — record left in the working tree")
            return 0
        archive(window, vet_out)
        restore()
        log(f"window {window}: REJECT archived; committed record restored")
        if clock() - t0 > budget_sec:
            log("budget exhausted after rejection")
            return 3
        window += 1
    log("max windows exhausted without an ACCEPT")
    return 3


# ---------------------------------------------------------------- CLI wiring


def _proc_stat_steal(sleep=time.sleep) -> float:
    def sample():
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return v[7], sum(v)

    s0, t0 = sample()
    sleep(PROBE_SEC)
    s1, t1 = sample()
    return 100.0 * (s1 - s0) / max(t1 - t0, 1)


def main(argv=None) -> int:
    import shutil
    import subprocess

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--budget-hours", type=float, default=4.0)
    ap.add_argument("--max-windows", type=int, default=12)
    ap.add_argument("--start-window", type=int, default=1)
    ap.add_argument("--archive-dir", default="/tmp")
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    detail = os.path.join(repo, "BENCH_DETAIL.json")

    def launch(window: int) -> int:
        env = dict(os.environ, SPARK_GRAFT_IDLE_RECORD="1")
        base = os.path.join(args.archive_dir, f"bench_hunt_w{window}")
        with open(base + ".out", "w") as out, open(base + ".err", "w") as err:
            return subprocess.run(
                [sys.executable, "bench.py"], cwd=repo, env=env, stdout=out, stderr=err
            ).returncode

    def vet(window: int):
        r = subprocess.run(
            [sys.executable, "tools/vet_idle_record.py", detail],
            cwd=repo,
            capture_output=True,
            text=True,
        )
        return r.returncode, r.stdout + r.stderr

    def archive(window: int, vet_out: str) -> None:
        base = os.path.join(args.archive_dir, f"bench_hunt_w{window}")
        shutil.copy(detail, base + "_detail.json")
        with open(base + "_vet.txt", "w") as fh:
            fh.write(vet_out)

    def restore() -> None:
        subprocess.run(["git", "checkout", "--", "BENCH_DETAIL.json"], cwd=repo)

    def log(msg: str) -> None:
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    return hunt(
        _proc_stat_steal,
        launch,
        vet,
        archive,
        restore,
        clock=time.monotonic,
        budget_sec=args.budget_hours * 3600,
        max_windows=args.max_windows,
        start_window=args.start_window,
        log=log,
    )


if __name__ == "__main__":
    sys.exit(main())
