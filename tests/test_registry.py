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
