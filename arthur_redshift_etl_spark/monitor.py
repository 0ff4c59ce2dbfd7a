"""ETL event monitoring: per-relation step events + query/summarize/tail.

Reference parity: ``python/etl/monitor.py`` — Monitor context manager
(:111-260) emitting start/finish/fail events with elapsed time and row
counts; DynamoDB store (:322-427) → JSON-lines file store here;
query/summarize/tail commands (:656-973).
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional

logger = logging.getLogger(__name__)

STEP_EXTRACT = "extract"
STEP_LOAD = "load"
STEP_UNLOAD = "unload"
STEP_MAINTAIN = "maintain"

EVENT_START = "start"
EVENT_FINISH = "finish"
EVENT_FAIL = "fail"


class EventStore:
    """Append-only JSON-lines event store (the DynamoDB stand-in)."""

    def __init__(self, path: Optional[str] = None) -> None:
        self.path = path
        self._lock = threading.Lock()
        self._memory: List[Dict[str, Any]] = []

    def append(self, event: Dict[str, Any]) -> None:
        with self._lock:
            self._memory.append(event)
            if self.path:
                with open(self.path, "a") as fh:
                    fh.write(json.dumps(event, sort_keys=True) + "\n")

    def events(self) -> List[Dict[str, Any]]:
        if self.path and os.path.exists(self.path):
            out = []
            with open(self.path) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        out.append(json.loads(line))
            return out
        with self._lock:
            return list(self._memory)

    # -- query surface (reference monitor.py:656-973) -----------------------

    def query(
        self,
        target: Optional[str] = None,
        step: Optional[str] = None,
        etl_id: Optional[str] = None,
    ) -> List[Dict[str, Any]]:
        out = []
        for e in self.events():
            if target and e.get("target") != target:
                continue
            if step and e.get("step") != step:
                continue
            if etl_id and e.get("etl_id") != etl_id:
                continue
            out.append(e)
        return out

    def summarize(self, etl_id: Optional[str] = None) -> List[Dict[str, Any]]:
        """Counts + total elapsed per (step, event)."""
        buckets: Dict[tuple, Dict[str, Any]] = {}
        for e in self.query(etl_id=etl_id):
            key = (e.get("step"), e.get("event"))
            b = buckets.setdefault(
                key,
                {"step": key[0], "event": key[1], "count": 0, "elapsed": 0.0, "rows": 0},
            )
            b["count"] += 1
            b["elapsed"] += e.get("elapsed") or 0.0
            b["rows"] += e.get("rowcount") or 0
        return [buckets[k] for k in sorted(buckets, key=lambda k: (str(k[0]), str(k[1])))]

    def tail(self, n: int = 10) -> List[Dict[str, Any]]:
        # n <= 0 is an empty window, not "everything" ([-0:] would be all)
        return self.events()[-n:] if n > 0 else []

    def tail_at(self, offset: int, n: int = 10) -> List[Dict[str, Any]]:
        """Last ``n`` events at or before ``offset`` (from :meth:`offset`).

        Using the SAME snapshot for the printed tail and the follow start
        closes both sides of the race: an event appended after the snapshot
        is excluded here and delivered exactly once by
        ``follow(from_offset=offset)`` — neither lost in a gap nor printed
        twice."""
        if self.path:
            if not os.path.exists(self.path):
                return []
            # binary mode: offset() is a BYTE position (os.path.getsize);
            # text-mode read(n) counts characters, which drifts from the
            # byte offset on any non-ASCII event payload
            with open(self.path, "rb") as fh:
                chunk = fh.read(offset).decode("utf-8", errors="replace")
            rows = [
                json.loads(line)
                for line in chunk.splitlines()
                if line.strip()
            ]
            return rows[-n:]
        with self._lock:
            return list(self._memory[:offset][-n:])

    def offset(self) -> int:
        """Current end-of-log position — pass to ``follow(from_offset=...)``
        so events appended between a ``tail()`` printout and the follow loop
        are not lost in the gap (file mode: byte offset; memory mode: event
        index)."""
        if self.path:
            return os.path.getsize(self.path) if os.path.exists(self.path) else 0
        return len(self._memory)

    def follow(
        self,
        poll_interval: float = 0.5,
        timeout: Optional[float] = None,
        from_offset: Optional[int] = None,
    ) -> Iterable[Dict[str, Any]]:
        """Stream events appended AFTER ``from_offset`` (default: after this
        call) — reference live-monitor analog: monitor.py:433-575 serves an
        in-memory HTTP dashboard; here the daily-driver flavor is a
        poll-the-jsonl follow, `tail -f` with JSON framing.  File mode tails
        by byte offset — each poll reads only the appended bytes (complete
        lines; a partially-written line waits for its newline), never
        re-parses the history, so a long-running follow on a large event log
        stays O(new events).  A shrinking file (rotation/truncation) resets
        the offset to the start instead of stalling past EOF forever.
        ``timeout`` bounds the follow for scripted use; None follows until
        interrupted.
        """
        start = time.monotonic()
        mem_idx = from_offset if (not self.path and from_offset is not None) else len(
            self._memory
        )
        pos = from_offset if (self.path and from_offset is not None) else (
            os.path.getsize(self.path)
            if self.path and os.path.exists(self.path)
            else 0
        )
        while True:
            if self.path:
                if os.path.exists(self.path):
                    if os.path.getsize(self.path) < pos:
                        pos = 0  # rotated/truncated underneath the follow
                    # binary mode: pos is a byte offset; text-mode seek to
                    # an arbitrary offset is undefined and read() would
                    # count characters, breaking the no-gap/no-duplicate
                    # handoff from tail_at on non-ASCII payloads
                    with open(self.path, "rb") as fh:
                        fh.seek(pos)
                        chunk = fh.read()
                    last_nl = chunk.rfind(b"\n")
                    if last_nl >= 0:
                        for line in chunk[:last_nl].split(b"\n"):
                            if not line.strip():
                                continue
                            try:
                                yield json.loads(line.decode("utf-8"))
                            except ValueError:
                                # a same-size rotation can leave the offset
                                # mid-line; skip the fragment rather than
                                # killing the follow
                                logger.debug("follow: skipping partial line")
                        pos += last_nl + 1
            else:
                with self._lock:
                    new = self._memory[mem_idx:]
                mem_idx += len(new)
                yield from new
            if timeout is not None and time.monotonic() - start >= timeout:
                return
            time.sleep(poll_interval)

    def latest_finish(self, target: str, step: str) -> Optional[Dict[str, Any]]:
        found = None
        for e in self.query(target=target, step=step):
            if e.get("event") == EVENT_FINISH:
                if found is None or e["timestamp"] > found["timestamp"]:
                    found = e
        return found

    def latest_outcome(self, target: str, step: str) -> Optional[Dict[str, Any]]:
        """Latest finish-OR-fail event.  The percolator cares about both:
        the reference's poller queries for ``:fail_event, :finish_event``
        together (load.py:874-886) so a failed extract unblocks the load
        (empty, skip_copy) instead of hanging to the idle timeout."""
        found = None
        for e in self.query(target=target, step=step):
            if e.get("event") in (EVENT_FINISH, EVENT_FAIL):
                if found is None or e["timestamp"] > found["timestamp"]:
                    found = e
        return found


@dataclass
class Monitor:
    """Context manager emitting start/finish/fail for one relation step."""

    store: EventStore
    target: str
    step: str
    etl_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    rowcount: Optional[int] = None
    extra: Dict[str, Any] = field(default_factory=dict)

    def __enter__(self) -> "Monitor":
        self._start = time.time()
        self._emit(EVENT_START)
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        elapsed = time.time() - self._start
        if exc_type is None:
            self._emit(EVENT_FINISH, elapsed=elapsed, rowcount=self.rowcount)
        else:
            self._emit(EVENT_FAIL, elapsed=elapsed, error=repr(exc))
        return False

    def _emit(self, event: str, **kw: Any) -> None:
        doc = {
            "etl_id": self.etl_id,
            "target": self.target,
            "step": self.step,
            "event": event,
            "timestamp": time.time(),
            **self.extra,
            **{k: v for k, v in kw.items() if v is not None},
        }
        self.store.append(doc)


# ---------------------------------------------------------------------------
# HTTP monitor (reference monitor.py:433-575 — the in-memory dashboard the
# `--keep-going` ETL serves during a run; here a stdlib ThreadingHTTPServer
# over the jsonl store, so `query_events`/`summarize_events` get a live
# browser/curl surface without any external dependency)
# ---------------------------------------------------------------------------

_DASH_HTML = """<!doctype html>
<html><head><meta charset="utf-8">
<meta http-equiv="refresh" content="5">
<title>ETL events</title>
<style>
 body {{ font-family: monospace; margin: 2em; }}
 table {{ border-collapse: collapse; }}
 td, th {{ border: 1px solid #999; padding: 4px 10px; text-align: left; }}
 .fail {{ color: #b00; font-weight: bold; }}
</style></head>
<body>
<h2>ETL events</h2>
<p>{n_events} event(s) &middot; auto-refresh 5s &middot;
   JSON: <a href="/api/events">/api/events</a>,
   <a href="/api/summary">/api/summary</a>, <a href="/api/tail">/api/tail</a></p>
<h3>Summary (step &times; event)</h3>
<table><tr><th>step</th><th>event</th><th>count</th><th>elapsed s</th>
<th>rows</th></tr>{summary_rows}</table>
<h3>Last {n_tail} events</h3>
<table><tr><th>ts</th><th>target</th><th>step</th><th>event</th>
<th>elapsed s</th><th>rows</th></tr>{tail_rows}</table>
</body></html>
"""


def serve_events(
    store: EventStore, host: str = "127.0.0.1", port: int = 8086
):
    """Start the HTTP monitor; returns the (already serving) server object.

    Endpoints:
    - ``/``             HTML dashboard (summary + tail, 5 s auto-refresh)
    - ``/api/events``   JSON rows; filters ``?target=&step=&etl_id=``
    - ``/api/summary``  JSON of :meth:`EventStore.summarize`
    - ``/api/tail``     JSON of the last ``?n=`` events (default 20)

    Read-only over the append-only store (each request re-reads the jsonl,
    so a dashboard watching a live `load` sees events as they land —
    the reference's in-memory page did the same against its queue).  The
    caller owns shutdown: ``server.shutdown()``.  Port 0 picks a free
    port (tests); the bound address is ``server.server_address``.
    """
    import html as html_mod
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet: the event store IS the log
            pass

        def _send(self, body: bytes, content_type: str, status: int = 200):
            self.send_response(status)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj, status: int = 200):
            self._send(
                json.dumps(obj).encode("utf-8"),
                "application/json; charset=utf-8",
                status,
            )

        def do_GET(self):  # noqa: N802 - http.server API
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            if u.path == "/api/events":
                self._json(
                    store.query(
                        target=q.get("target"),
                        step=q.get("step"),
                        etl_id=q.get("etl_id"),
                    )
                )
            elif u.path == "/api/summary":
                self._json(store.summarize(etl_id=q.get("etl_id")))
            elif u.path == "/api/tail":
                try:
                    n = int(q.get("n", "20"))
                except ValueError:
                    self._json({"error": "n must be an integer"}, status=400)
                    return
                self._json(store.tail(max(0, n)))
            elif u.path == "/":
                summary = store.summarize()
                tail = store.tail(20)

                def esc(v):
                    return html_mod.escape(str("" if v is None else v))

                srows = "".join(
                    "<tr><td>{}</td><td{}>{}</td><td>{}</td><td>{:.1f}</td>"
                    "<td>{}</td></tr>".format(
                        esc(b["step"]),
                        ' class="fail"' if b["event"] == EVENT_FAIL else "",
                        esc(b["event"]),
                        b["count"],
                        b["elapsed"],
                        b["rows"],
                    )
                    for b in summary
                )
                def fmt_ts(e):
                    t = e.get("timestamp")
                    if t is None:
                        return ""
                    return datetime.datetime.fromtimestamp(
                        t, tz=datetime.timezone.utc
                    ).strftime("%Y-%m-%d %H:%M:%S")

                trows = "".join(
                    "<tr><td>{}</td><td>{}</td><td>{}</td><td{}>{}</td>"
                    "<td>{}</td><td>{}</td></tr>".format(
                        esc(fmt_ts(e)),
                        esc(e.get("target")),
                        esc(e.get("step")),
                        ' class="fail"' if e.get("event") == EVENT_FAIL else "",
                        esc(e.get("event")),
                        esc(round(e["elapsed"], 2) if e.get("elapsed") else ""),
                        esc(e.get("rowcount") or ""),
                    )
                    for e in reversed(tail)
                )
                page = _DASH_HTML.format(
                    n_events=len(store.events()),
                    summary_rows=srows,
                    tail_rows=trows,
                    n_tail=len(tail),
                )
                self._send(page.encode("utf-8"), "text/html; charset=utf-8")
            else:
                self._json({"error": "not found"}, status=404)

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
