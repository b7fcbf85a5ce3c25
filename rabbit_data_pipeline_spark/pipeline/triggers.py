"""Trigger semantics (reference Scheduler.php:72-112):

- ``cron: <crontab>``  → recurring schedule
- ``cron: <int >= 0>`` → run every N seconds
- ``cron: -1``         → run once
- absent               → run immediately, once

Batch tasks map -1/absent to a single run; intervals map to Structured
Streaming ``processingTime`` triggers when the pipeline is streaming,
or a driver-side loop for batch. Crontab strings are parsed with a
minimal 5-field matcher (no external deps).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from datetime import datetime


@dataclass(frozen=True)
class Trigger:
    kind: str  # "once" | "interval" | "cron"
    interval_sec: int | None = None
    cron: str | None = None

    def streaming_options(self) -> dict:
        """Options for DataStreamWriter.trigger(**opts)."""
        if self.kind == "interval" and self.interval_sec:
            return {"processingTime": f"{self.interval_sec} seconds"}
        return {"availableNow": True}


def parse_trigger(cron: str | int | None) -> Trigger:
    if cron is None:
        return Trigger("once")
    if isinstance(cron, int) or (isinstance(cron, str) and cron.lstrip("-").isdigit()):
        sec = int(cron)
        return Trigger("once") if sec < 0 else Trigger("interval", interval_sec=sec)
    return Trigger("cron", cron=str(cron))


def _match_field(expr: str, value: int) -> bool:
    for part in expr.split(","):
        if part == "*":
            return True
        if part.startswith("*/"):
            if value % int(part[2:]) == 0:
                return True
        elif "-" in part:
            lo, hi = part.split("-")
            if int(lo) <= value <= int(hi):
                return True
        elif part.isdigit() and int(part) == value:
            return True
    return False


def cron_matches(expr: str, when: datetime) -> bool:
    """5-field crontab match: minute hour day month weekday."""
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"bad cron expression: {expr}")
    values = (when.minute, when.hour, when.day, when.month, when.isoweekday() % 7)
    return all(_match_field(f, v) for f, v in zip(fields, values))


def run_on_trigger(trigger: Trigger, fn, max_runs: int = 1, sleep=time.sleep, now=datetime.now) -> int:
    """Driver-side batch loop: run `fn` per trigger firing, at most
    ``max_runs`` times (tests pin this; production passes a large n).

    Cron fires at most once per matched minute: the 30 s poll lands
    twice inside a minute, so without the last-fired guard every
    matched minute would run the task twice (the reference's
    Scheduler.php matches once per scheduler tick)."""
    runs = 0
    if trigger.kind == "once":
        fn()
        return 1
    if trigger.kind == "interval":
        while runs < max_runs:
            fn()
            runs += 1
            if runs < max_runs:
                sleep(trigger.interval_sec or 0)
        return runs
    last_fired: datetime | None = None
    while runs < max_runs:
        when = now()
        minute = when.replace(second=0, microsecond=0)
        if minute != last_fired and cron_matches(trigger.cron or "* * * * *", when):
            fn()
            runs += 1
            last_fired = minute
        sleep(30)
    return runs
