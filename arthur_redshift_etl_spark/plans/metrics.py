"""Execution metrics from the executed physical plan.

Reference parity: after each COPY the reference queries ``stl_load_commits`` /
``stl_load_errors`` for rows, files, slices, and MB moved
(``dialect/redshift.py:372-432``).  Spark's equivalent telemetry lives on
the executed plan's SQLMetrics (numOutputRows, numFiles, bytes written,
shuffle sizes) — this module harvests them after an action, pure plan
inspection through py4j, no listener registration needed.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame


def _walk(node, out: List[Tuple[str, str, int]]) -> None:
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        # descend into the final adaptive plan (method name per Spark 3.2+)
        for accessor in ("finalPhysicalPlan", "executedPlan"):
            try:
                _walk(getattr(node, accessor)(), out)
                return
            except Exception:
                continue
    try:
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            out.append((name, kv._1(), kv._2().value()))
    except Exception:
        pass
    # materialized AQE stages and reused exchanges wrap their subtree in
    # .plan()/.child() rather than children()
    if name.endswith("QueryStage"):
        try:
            _walk(node.plan(), out)
            return
        except Exception:
            pass
    cit = node.children().iterator()
    while cit.hasNext():
        _walk(cit.next(), out)


def executed_metrics(df: DataFrame) -> List[Tuple[str, str, int]]:
    """(operator, metric, value) triples from the executed plan.

    Only meaningful AFTER an action ran on this exact DataFrame; metrics of
    never-executed operators read 0/-1.
    """
    out: List[Tuple[str, str, int]] = []
    _walk(df._jdf.queryExecution().executedPlan(), out)
    return out


def scan_summary(df: DataFrame) -> Dict[str, int]:
    """COPY-report analog: rows/files/bytes scanned + final output rows.

    Sums scan-node SQLMetrics across the executed plan — the per-load
    observability the reference pulled from stl tables (rows, file count,
    MB).  ``output_rows`` is the root-most operator's numOutputRows
    (pre-order first).
    """
    rows_scanned = files_read = bytes_read = 0
    output_rows = -1
    for op, metric, value in executed_metrics(df):
        if value is None or value < 0:
            continue
        if op.startswith("Scan"):
            if metric == "numOutputRows":
                rows_scanned += value
            elif metric == "numFiles":
                files_read += value
            elif metric == "filesSize":
                bytes_read += value
        if output_rows < 0 and metric == "numOutputRows":
            output_rows = value
    return {
        "rows_scanned": rows_scanned,
        "files_read": files_read,
        "bytes_read": bytes_read,
        "output_rows": max(output_rows, 0),
    }


def stage_totals(spark) -> Dict[str, int]:
    """App-wide stage-metric totals from the live status store.

    The cross-query counterpart of ``executed_metrics``: cumulative
    memory/disk spill, shuffle bytes, and executor time across every stage
    the app has run.  Diff a before/after pair around an action to
    attribute the delta to one query — the engine's "did this spill, and
    how much moved" telemetry (the reference read the same class of
    numbers from ``stl_load_commits``; Spark's live AppStatusStore is the
    analog, no listener registration or event-log parsing needed).

    Spill here is the 100 TB health signal: a query that SPILLS under a
    shrunken per-task memory slice degrades gracefully; one that OOMs is
    mis-partitioned.  ``scripts/memory_stress.py`` runs the heavy bench
    queries under an ample-vs-constrained heap A/B on top of this helper.

    Eviction bound: the live store retains only the last
    ``spark.ui.retainedStages`` stages (default 1000) — in a session that
    has run more, these "totals" are a trailing window, and a
    before/after diff whose window slid between the two reads can
    undercount or even go negative.  For a reliable diff around one
    action, either take both reads within far fewer than retainedStages
    stage completions (every engine use here does), or raise
    ``spark.ui.retainedStages`` for the session being measured.
    """
    gw = spark.sparkContext._gateway
    store = spark.sparkContext._jsc.sc().statusStore()
    no_status_filter = gw.jvm.java.util.ArrayList()
    no_task_filter = gw.jvm.java.util.ArrayList()
    no_quantiles = gw.new_array(gw.jvm.double, 0)
    stages = store.stageList(
        no_status_filter, False, False, no_quantiles, no_task_filter
    )
    tot = {
        "stages": 0,
        "memory_spilled_bytes": 0,
        "disk_spilled_bytes": 0,
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "executor_run_ms": 0,
    }
    for i in range(stages.size()):
        s = stages.apply(i)
        tot["stages"] += 1
        tot["memory_spilled_bytes"] += s.memoryBytesSpilled()
        tot["disk_spilled_bytes"] += s.diskBytesSpilled()
        tot["shuffle_write_bytes"] += s.shuffleWriteBytes()
        tot["shuffle_read_bytes"] += s.shuffleReadBytes()
        tot["executor_run_ms"] += s.executorRunTime()
    return tot
