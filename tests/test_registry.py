"""Registry hygiene: the driver's correctness gate checks keys in
iteration order and caps at 50 per round, so the priority list is the
round's verification budget — keep it spendable."""

from __future__ import annotations

from rabbit_data_pipeline_spark.queries import _DRIVER_PRIORITY, registry


def test_driver_priority_within_cap_unique_and_resolvable():
    reg = registry()
    assert len(_DRIVER_PRIORITY) <= 50, "entries beyond the driver's 50-key cap never run"
    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY), "duplicate wastes a slot"
    missing = [k for k in _DRIVER_PRIORITY if k not in reg]
    assert not missing, f"priority keys not in registry: {missing}"


def test_registry_iteration_starts_with_priority():
    names = list(registry())
    assert tuple(names[: len(_DRIVER_PRIORITY)]) == _DRIVER_PRIORITY


def test_every_query_has_unique_name_and_builder():
    reg = registry()
    assert len(reg) >= 94
    for name, q in reg.items():
        assert callable(q.builder), name
        assert q.name == name


def test_priority_front_loads_the_entire_stalest_cohort():
    """VERDICT r12 ask #2 regression: the rotation budget is 50 keys
    per round, so the STALEST verified cohort must fit entirely inside
    _DRIVER_PRIORITY — round 13 found a registry-order interleave had
    been pushing 17 r9 keys past the budget while fresher r10 keys sat
    inside it. The invariant is evaluated against the artifacts that
    EXISTED when the list was authored (_ROTATION_BASIS_ROUND): the
    driver appends CORRECTNESS_r{basis+1}.json at round end, which
    makes the next cohort stale by design — that's the NEXT round's
    rotation, not this list's failure. Re-authoring the list means
    bumping the basis."""
    import glob
    import json
    import os

    from rabbit_data_pipeline_spark.queries import _ROTATION_BASIS_ROUND

    repo = os.path.join(os.path.dirname(__file__), "..")
    rounds_seen = []
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        rounds_seen.append(rnd)
        if rnd > _ROTATION_BASIS_ROUND:
            continue
        for key in json.load(open(path)):
            latest[key] = max(latest.get(key, -1), rnd)
    if not rounds_seen:  # fresh clone without artifacts — nothing to pin
        return
    # the basis must not lag the artifacts by more than the one round
    # the driver appends after authoring — further behind means the
    # list was never re-authored for the new cohort state. Checked
    # BEFORE the verified-keys guard: pruned pre-basis artifacts would
    # empty `latest` while rounds_seen still proves the basis stale.
    assert max(rounds_seen) - _ROTATION_BASIS_ROUND <= 1, (
        f"rotation basis r{_ROTATION_BASIS_ROUND} is stale vs artifacts "
        f"r{max(rounds_seen)}: re-author _DRIVER_PRIORITY "
        "(tools/verdict_freshness.py prints the paste) and bump the basis"
    )
    reg = registry()
    verified = {k: r for k, r in latest.items() if k in reg}
    if not verified:
        return
    stalest = min(verified.values())
    cohort = sorted(k for k, r in verified.items() if r == stalest)
    stranded = [k for k in cohort if k not in _DRIVER_PRIORITY]
    if len(cohort) <= 50:
        assert not stranded, (
            f"stalest cohort (r{stalest}) keys missing from _DRIVER_PRIORITY: {stranded}"
        )
    else:
        # A cohort larger than the budget can't be fully covered; the
        # remainder is the next round's rotation. Still require most
        # of the budget spent on it — a handful of slots may
        # legitimately go to keys whose code changed this round (the
        # r12 pattern), but fresher-cohort filler must not crowd out
        # the stalest keys (the failure this test exists to catch).
        spent = sum(1 for k in _DRIVER_PRIORITY if k in cohort)
        assert spent >= 40, (
            f"only {spent}/50 budget slots go to the oversized stalest "
            f"cohort (r{stalest}, {len(cohort)} keys) — fresher keys are "
            "crowding out the keys the rotation exists to refresh"
        )
