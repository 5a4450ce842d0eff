"""Declarative ETL jobs: file triggers + inbox → work → archive/failed flow.

Re-expresses the reference's ETL orchestration (etl/ETLConfig.scala:20-47
trigger config, etl/triggers/Constraint.scala:5-65 filename constraints,
etl/actors/FileMoving.scala:29-48 inbox/work/archive/failed state machine) as
a driver-side controller over the Ray engine. The data plane of each job is a
compiled SQL script run by QweryEngine — distributed via Ray Data, unlike the
reference's one-JVM-thread-per-job model (SURVEY.md §3.2).

Config shape (triggers.json parity):

    {"triggers": [{
        "name": "company-lists",
        "constraints": [{"prefix": "company"}, {"suffix": ".csv"}],
        "script": "INSERT INTO '{{ work.file.base }}.json' (…) SELECT …"
    }]}

Scope variables exposed to scripts mirror the reference's ``work.file.*``
bindings (WorkflowManagementActor.processFile).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class Constraint:
    """Filename constraint (reference etl/triggers/Constraint.scala)."""

    prefix: Optional[str] = None
    suffix: Optional[str] = None
    contains: Optional[str] = None
    equals: Optional[str] = None
    regex: Optional[str] = None

    def matches(self, filename: str) -> bool:
        low = filename.lower()
        if self.prefix is not None and not low.startswith(self.prefix.lower()):
            return False
        if self.suffix is not None and not low.endswith(self.suffix.lower()):
            return False
        if self.contains is not None and self.contains.lower() not in low:
            return False
        if self.equals is not None and low != self.equals.lower():
            return False
        if self.regex is not None and re.fullmatch(self.regex, filename) is None:
            return False
        return True

    @classmethod
    def from_dict(cls, d: dict) -> "Constraint":
        return cls(**{k: d.get(k) for k in
                      ("prefix", "suffix", "contains", "equals", "regex")})


@dataclass
class Trigger:
    name: str
    constraints: list[Constraint]
    script: str

    def accepts(self, filename: str) -> bool:
        return all(c.matches(filename) for c in self.constraints)


@dataclass
class JobResult:
    trigger: str
    file: str
    status: str  # archived | failed
    rows_inserted: int = 0
    elapsed_sec: float = 0.0
    error: Optional[str] = None


class ETLController:
    """inbox/ → work/{pid}/ → archive/yyyy/MM/dd/ | failed/ state machine.

    ``process_inbox()`` is one poll cycle (the reference polls every 5 s via
    a WatchService; here the caller owns the loop / scheduler)."""

    def __init__(self, home: str, triggers: list[Trigger], *,
                 engine_factory=None, clock=None):
        self.home = home
        self.triggers = triggers
        self.engine_factory = engine_factory or _default_engine_factory
        self.clock = clock or time.gmtime  # injectable for determinism
        for sub in ("inbox", "work", "archive", "failed"):
            os.makedirs(os.path.join(home, sub), exist_ok=True)

    @classmethod
    def from_config(cls, home: str, config_path: str, **kw) -> "ETLController":
        with open(config_path) as f:
            cfg = json.load(f)
        triggers = [
            Trigger(t["name"],
                    [Constraint.from_dict(c) for c in t.get("constraints", [])],
                    t["script"])
            for t in cfg.get("triggers", [])
        ]
        return cls(home, triggers, **kw)

    def lookup_trigger(self, filename: str) -> Optional[Trigger]:
        for t in self.triggers:
            if t.accepts(filename):
                return t
        return None

    def process_inbox(self) -> list[JobResult]:
        results = []
        inbox = os.path.join(self.home, "inbox")
        for fname in sorted(os.listdir(inbox)):
            trigger = self.lookup_trigger(fname)
            if trigger is None:
                continue
            results.append(self._run_job(trigger, fname))
        return results

    def _run_job(self, trigger: Trigger, fname: str) -> JobResult:
        pid = f"{trigger.name}-{fname}"
        work_dir = os.path.join(self.home, "work", pid)
        os.makedirs(work_dir, exist_ok=True)
        src = os.path.join(self.home, "inbox", fname)
        work_file = os.path.join(work_dir, fname)
        shutil.move(src, work_file)  # claim (moveToWork)

        eng = self.engine_factory()
        base, ext = os.path.splitext(work_file)
        eng.variables.update({
            "work.file.path": work_file,
            "work.file.name": fname,
            "work.file.base": base,
            "work.file.ext": ext,
        })
        t0 = time.perf_counter()
        try:
            result = eng.sql(eng.expand_vars(trigger.script))
            rows = 0
            if result is not None and hasattr(result, "column_names") and \
                    "ROWS_INSERTED" in result.column_names:
                rows = result.column("ROWS_INSERTED")[0].as_py()
            self._archive(work_file)
            shutil.rmtree(work_dir, ignore_errors=True)
            return JobResult(trigger.name, fname, "archived", rows,
                             time.perf_counter() - t0)
        except Exception as exc:  # job-level failure → failed/ (reference)
            failed_dir = os.path.join(self.home, "failed", pid)
            os.makedirs(failed_dir, exist_ok=True)
            shutil.move(work_file, os.path.join(failed_dir, fname))
            shutil.rmtree(work_dir, ignore_errors=True)
            return JobResult(trigger.name, fname, "failed",
                             elapsed_sec=time.perf_counter() - t0,
                             error=str(exc))

    def _archive(self, work_file: str):
        t = self.clock()
        day_dir = os.path.join(self.home, "archive",
                               f"{t.tm_year:04d}", f"{t.tm_mon:02d}",
                               f"{t.tm_mday:02d}")
        os.makedirs(day_dir, exist_ok=True)
        shutil.move(work_file, os.path.join(day_dir,
                                            os.path.basename(work_file)))


def _default_engine_factory():
    from ..engine.session import QweryEngine

    return QweryEngine()
