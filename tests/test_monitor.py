"""HTTP monitor endpoint tests (reference monitor.py:433-575 analog)."""

import pytest


def test_http_monitor_serves_summary_events_and_dashboard():
    """The stdlib HTTP monitor (reference monitor.py:433-575 analog):
    JSON endpoints mirror query/summarize/tail, the HTML page renders the
    live store, filters and 404s behave."""
    import json as json_mod
    import urllib.error
    import urllib.request

    from arthur_redshift_etl_spark.monitor import (
        STEP_EXTRACT,
        STEP_LOAD,
        EventStore,
        Monitor,
        serve_events,
    )

    store = EventStore()
    with Monitor(store, "dw.fact", STEP_LOAD) as m:
        m.rowcount = 42
    with Monitor(store, "src.orders", STEP_EXTRACT):
        pass
    server = serve_events(store, port=0)
    try:
        host, port = server.server_address
        base = f"http://{host}:{port}"

        def get_json(path):
            return json_mod.load(urllib.request.urlopen(base + path))

        events = get_json("/api/events")
        assert len(events) == 4  # 2 starts + 2 finishes
        only_load = get_json("/api/events?target=dw.fact&step=load")
        assert {e["target"] for e in only_load} == {"dw.fact"}
        summary = get_json("/api/summary")
        finish_load = [
            b for b in summary if b["step"] == "load" and b["event"] == "finish"
        ]
        assert finish_load and finish_load[0]["rows"] == 42
        tail = get_json("/api/tail?n=2")
        assert len(tail) == 2
        html = urllib.request.urlopen(base + "/").read().decode()
        assert "dw.fact" in html and "src.orders" in html
        # the tail table's ts column is populated (events store the time
        # under "timestamp"; a regression rendered a missing "ts" key as
        # an always-blank cell)
        import re

        assert re.search(r"<td>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}</td>", html)
        # /api/tail rejects garbage n with a 400 instead of a stack trace,
        # and clamps negative n to an empty window
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(base + "/api/tail?n=bogus")
        assert exc.value.code == 400
        assert get_json("/api/tail?n=-3") == []
        # a LIVE append is visible on the next request (re-read per hit)
        with Monitor(store, "dw.late", STEP_LOAD):
            pass
        assert any(
            e["target"] == "dw.late" for e in get_json("/api/events")
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(base + "/nope")
    finally:
        server.shutdown()
