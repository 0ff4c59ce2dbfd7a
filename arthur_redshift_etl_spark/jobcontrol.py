"""Build job-group registration + cross-process cancellation.

Reference parity: ``terminate_sessions`` (python/etl/commands.py
TerminateSessionsCommand / data_warehouse.py) kills warehouse sessions
that block an ETL.  The Spark analog of a blocking warehouse session is a
running build's job group: every ``load``/``upgrade``/``update`` runs its
Spark jobs under a named job group, registered on disk, and a separate
``terminate_builds`` invocation — any process — requests cancellation by
dropping a marker file.  A watcher thread INSIDE the building process
(the only place a local[...] SparkContext can be reached) polls for the
marker and calls ``cancelJobGroup``, which interrupts in-flight tasks;
the build fails before ``publish``, so staging is intact and
``restore_schemas`` / a re-run proceeds normally.

Registration lives under ``<repo>/builds/<group>.json`` and is removed
when the build finishes (success, failure, or cancellation); a leftover
file from a killed process is harmless — ``terminate_builds`` reports it
as stale when the recorded pid is gone.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import List, Optional

BUILDS_DIR = "builds"
_POLL_SECONDS = 0.2


def _builds_dir(repo: str) -> str:
    return os.path.join(repo, BUILDS_DIR)


def _reg_path(repo: str, group: str) -> str:
    return os.path.join(_builds_dir(repo), f"{group}.json")


def _cancel_path(repo: str, group: str) -> str:
    return os.path.join(_builds_dir(repo), f"{group}.cancel")


@dataclass
class BuildGroup:
    """Context manager: run the enclosed Spark work under a cancellable,
    registered job group."""

    spark: "object"
    repo: str
    group: Optional[str] = None
    poll_seconds: float = _POLL_SECONDS
    cancelled: bool = field(default=False, init=False)
    _stop: threading.Event = field(default_factory=threading.Event, init=False)
    _watcher: Optional[threading.Thread] = field(default=None, init=False)

    def __post_init__(self) -> None:
        if self.group is None:
            self.group = f"build-{os.getpid()}-{int(time.monotonic_ns())}"

    def __enter__(self) -> "BuildGroup":
        sc = self.spark.sparkContext
        # interruptOnCancel: in-flight task threads get interrupted, not
        # just queued stages dropped — a long scan stops mid-partition
        sc.setJobGroup(self.group, f"arthur build {self.group}", True)
        os.makedirs(_builds_dir(self.repo), exist_ok=True)
        # A stale cancel marker can outlive a build that was SIGKILLed after
        # a cancel request (or when request_cancel races exit cleanup).  A
        # fresh registration must start from a clean cancel state or the
        # watcher instantly cancels the new build within one poll.
        try:
            os.remove(_cancel_path(self.repo, self.group))
        except OSError:
            pass
        with open(_reg_path(self.repo, self.group), "w") as fh:
            json.dump(
                {"group": self.group, "pid": os.getpid(), "started": time.time()},
                fh,
            )
        self._watcher = threading.Thread(
            target=self._watch, name=f"cancel-watch-{self.group}", daemon=True
        )
        self._watcher.start()
        return self

    def _watch(self) -> None:
        marker = _cancel_path(self.repo, self.group)
        while not self._stop.wait(self.poll_seconds):
            if os.path.exists(marker):
                self.cancelled = True
                # keep cancelling until the build thread exits the context:
                # cancelJobGroup only reaches ACTIVE jobs, so a one-shot
                # cancel races both job submission and multi-job builds
                # (the next job of the group would otherwise run through)
                try:
                    self.spark.sparkContext.cancelJobGroup(self.group)
                except Exception:  # context already stopped — nothing to do
                    return

    def __exit__(self, exc_type, exc, tb) -> None:
        self._stop.set()
        if self._watcher is not None:
            self._watcher.join(timeout=5)
        try:
            self.spark.sparkContext.setJobGroup("", "")
        except Exception:
            pass
        for path in (
            _reg_path(self.repo, self.group),
            _cancel_path(self.repo, self.group),
        ):
            try:
                os.remove(path)
            except OSError:
                pass


def list_builds(repo: str) -> List[dict]:
    """Registered builds, annotated with liveness of the recorded pid."""
    out: List[dict] = []
    bdir = _builds_dir(repo)
    if not os.path.isdir(bdir):
        return out
    for name in sorted(os.listdir(bdir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(bdir, name)) as fh:
                info = json.load(fh)
        except (OSError, ValueError):
            continue
        pid = info.get("pid")
        try:
            os.kill(int(pid), 0)
            alive = True
        except (OSError, TypeError, ValueError):
            alive = False
        info["alive"] = alive
        info["cancel_requested"] = os.path.exists(
            _cancel_path(repo, info.get("group", ""))
        )
        out.append(info)
    return out


def request_cancel(repo: str, group: str) -> bool:
    """Drop the cancel marker for a registered build.  Returns False when
    no such build is registered (nothing will ever pick the marker up)."""
    if not os.path.exists(_reg_path(repo, group)):
        return False
    with open(_cancel_path(repo, group), "w") as fh:
        fh.write(json.dumps({"requested": time.time(), "by_pid": os.getpid()}))
    return True


def is_cancellation(exc: BaseException, group: Optional[str] = None) -> bool:
    """Whether a Spark failure is a job-group cancellation (so callers can
    report 'cancelled by operator' instead of a generic failure).

    Matches only Spark's actual cancellation signatures — ``cancelled part
    of cancelled job group <group>`` (scheduler) and the
    ``SparkJobCancelled`` / ``SPARK_JOB_CANCELLED`` error classes — not the
    bare substring 'cancelled', which shows up in unrelated stage/broadcast
    messages and in error text that echoes data.  Callers that know their
    job group should pass it so a *different* group's cancellation text
    (e.g. quoted inside an analysis error) doesn't match; the primary
    signal remains ``BuildGroup.cancelled``.
    """
    text = str(exc)
    if "SparkJobCancelled" in text or "SPARK_JOB_CANCELLED" in text:
        return True
    needle = "part of cancelled job group"
    if group is not None:
        needle = f"part of cancelled job group {group}"
    return needle in text
