"""Scheduled events — parity with the reference's scheduled-events.json
(etl/events/ScheduledEvent.scala:14-60: {name, script, times[hh:mm[:ss]]},
next-day rollover, run script at each time).

The reference uses an akka scheduler; here the schedule is a pure function
(`next_run`) plus a caller-owned loop (`run_pending`) so tests inject the
clock — no daemon thread hiding in a data-plane library."""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass, field


@dataclass
class ScheduledEvent:
    name: str
    script: str
    times: list[str]  # "hh:mm" or "hh:mm:ss" local times
    last_run: dt.datetime | None = field(default=None, compare=False)

    def _today_at(self, now: dt.datetime, hhmmss: str) -> dt.datetime:
        parts = [int(p) for p in hhmmss.split(":")]
        while len(parts) < 3:
            parts.append(0)
        return now.replace(hour=parts[0], minute=parts[1], second=parts[2],
                           microsecond=0)

    def next_run(self, now: dt.datetime) -> dt.datetime:
        """Earliest scheduled time ≥ now (next-day rollover, reference
        ScheduledEvent.scala)."""
        candidates = []
        for t in self.times:
            at = self._today_at(now, t)
            if at < now:
                at += dt.timedelta(days=1)
            candidates.append(at)
        return min(candidates)

    def due(self, now: dt.datetime) -> bool:
        for t in self.times:
            at = self._today_at(now, t)
            if at <= now and (self.last_run is None or self.last_run < at):
                return True
        return False


class Scheduler:
    def __init__(self, events: list[ScheduledEvent], engine_factory=None):
        self.events = events
        from .triggers import _default_engine_factory

        self.engine_factory = engine_factory or _default_engine_factory

    @classmethod
    def from_config(cls, config_path: str, **kw) -> "Scheduler":
        with open(config_path) as f:
            cfg = json.load(f)
        events = [ScheduledEvent(e["name"], e["script"], list(e["times"]))
                  for e in cfg.get("events", [])]
        return cls(events, **kw)

    def run_pending(self, now: dt.datetime | None = None) -> list[str]:
        """Run every due event's script; returns the names that ran.
        Call from a cron / driver loop (caller owns the cadence)."""
        now = now or dt.datetime.now()
        ran = []
        for ev in self.events:
            if ev.due(now):
                eng = self.engine_factory()
                eng.sql(eng.expand_vars(ev.script))
                ev.last_run = now
                ran.append(ev.name)
        return ran
