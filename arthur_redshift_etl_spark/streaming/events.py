"""Structured Streaming surface for event data.

The reference explicitly has no streaming (README: "Arthur is not designed
to support streaming or micro-batch ETLs", SURVEY §2.10).  This module is
the capability upgrade the Spark engine gets for free: the same event
rollups the batch workload computes (hourly counts, sessionization) as
incremental streaming queries with watermarked late-data handling.

Scale notes: the windowed aggregation is keyed by (window, event_type) —
state is bounded by the watermark horizon; sessionization uses
``session_window`` (native gap-based session windows, state cleaned by
watermark), not a driver-side loop.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: State-store provider for state whose key cardinality scales with data
#: volume.  Measured (SCALE.md round-7 streaming A/B, 4 GB heap): the
#: default HDFS-backed on-heap store hard-OOMs the JVM at ~12M live
#: per-key dedup rows, while RocksDB carries 14.4M rows in the same heap
#: and degrades to disk-bound throughput instead of dying.
ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def scalable_state_conf() -> dict:
    """Session conf for streaming state that scales with data volume.

    Use for any stateful shape whose distinct-key count grows with input
    (per-event dedup, per-entity custom state); the schema-bounded shapes
    (windows x event types) are fine on the default on-heap store.  Pass
    to ``build_session(extra_conf=...)``, or set on a live session — the
    provider class is read when each streaming query STARTS, so it applies
    to queries started after the change, never to running ones.

    **Migration trap (pinned in tests/test_streaming_multimodal.py):** an
    EXISTING checkpoint pins its provider in the offset-log metadata, and
    on restart Spark restores the pinned class — the session conf is
    SILENTLY IGNORED.  Measured consequence: an operator who "fixes" a
    growing dedup stream by setting this conf and restarting still runs
    the on-heap store, which hard-OOMs at ~12M state rows (SCALE.md r7).
    :func:`checkpoint_state_provider` detects the pin; the maintainers
    below log a loud warning when a restart's session conf asks for a
    different provider than the checkpoint will actually use.

    **Migration recipe (tested end-to-end):** state-store format is
    provider-specific (heap ``.delta``/``.snapshot`` vs RocksDB zips), so
    there is no in-place switch.  Instead:

    1. drain and stop the query (``processAllAvailable()`` → ``stop()``);
    2. retire the old checkpoint directory (keep it for rollback);
    3. restart the SAME maintainer with this conf set and a FRESH
       checkpoint.  For the engine's file-source maintainers the source
       replays retained files and the batch-id swap discipline rebuilds
       the stored table idempotently (exactly-once markers make replay
       safe).  For non-replayable sources, bound the replay by seeding
       the new query from the old checkpoint's last COMMITTED offsets
       (:func:`checkpoint_source_offsets` — e.g. a Kafka reader's
       ``startingOffsets``).
    """
    return {"spark.sql.streaming.stateStore.providerClass": ROCKSDB_STATE_PROVIDER}


_PROVIDER_CONF_KEY = "spark.sql.streaming.stateStore.providerClass"
_DEFAULT_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def _ckpt_io(checkpoint: str, spark: Optional[SparkSession]):
    """(list_names, read_text) accessors for a checkpoint directory, or
    None when the path cannot be probed from here.

    Checkpoints live wherever the query put them — local disk in tests,
    HDFS/S3 in production — so the probes must not assume ``os`` works.
    Local paths (no scheme, or file:) use ``os`` directly; anything else
    goes through the Hadoop FileSystem API of the given (or active)
    session, the same client the streaming engine itself uses.  A
    non-local path with no JVM in reach returns None — and the caller is
    expected to SAY the probe was skipped rather than silently passing.
    """
    import os

    scheme = checkpoint.split("://", 1)[0] if "://" in checkpoint else ""

    def _os_io(root: str):
        def list_names(sub: str):
            try:
                return os.listdir(os.path.join(root, sub))
            except OSError:
                return None

        def read_text(sub: str, name: str) -> str:
            with open(os.path.join(root, sub, name)) as fh:
                return fh.read()

        return list_names, read_text

    if scheme == "":
        return _os_io(checkpoint)
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        # file:// is still the local disk — strip the scheme and read it;
        # anything else is unreachable without a JVM, and silence here is
        # exactly the failure the provider guard exists to prevent.
        if scheme == "file":
            return _os_io(checkpoint.split("://", 1)[1])
        import logging

        logging.getLogger(__name__).warning(
            "checkpoint probe SKIPPED for %s: non-local path and no active "
            "SparkSession to reach it through (pass spark= to probe it)",
            checkpoint,
        )
        return None

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def jpath(*parts: str):
        return jvm.org.apache.hadoop.fs.Path("/".join((checkpoint,) + parts))

    try:
        fs = jpath().getFileSystem(hconf)
    except Exception:
        import logging

        logging.getLogger(__name__).warning(
            "checkpoint probe SKIPPED for %s: filesystem for scheme %r is "
            "not reachable from this session",
            checkpoint,
            scheme,
        )
        return None

    def list_names(sub: str):
        p = jpath(sub)
        try:
            if not fs.exists(p):
                return None
            return [st.getPath().getName() for st in fs.listStatus(p)]
        except Exception:
            import logging

            logging.getLogger(__name__).warning(
                "checkpoint probe SKIPPED for %s: listing %s failed "
                "(filesystem unreachable?)",
                checkpoint,
                sub,
            )
            return None

    def read_text(sub: str, name: str) -> str:
        stream = fs.open(jpath(sub, name))
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, True)
        return baos.toString("UTF-8")

    return list_names, read_text


def checkpoint_state_provider(
    checkpoint: str, spark: Optional[SparkSession] = None
) -> Optional[str]:
    """The state-store provider class an existing checkpoint will USE on
    restart (pinned in its offset-log metadata), or None for a fresh or
    absent checkpoint (or a non-local path with no session to reach it —
    logged, never silent).

    Spark writes the originating session's state conf into every offset
    file and restores it on recovery precisely so state files stay
    readable — which makes a later session-conf change a silent no-op.
    This reads the pin so operators (and the maintainer guard) can tell
    what a restart will actually run.
    """
    import json

    io = _ckpt_io(checkpoint, spark)
    if io is None:
        return None
    list_names, read_text = io
    names = list_names("offsets")
    if not names:
        return None
    batches = sorted(int(f) for f in names if f.isdigit())
    if not batches:
        return None
    lines = read_text("offsets", str(batches[-1])).splitlines()
    try:
        meta = json.loads(lines[1])
    except (IndexError, ValueError):
        return None
    return meta.get("conf", {}).get(_PROVIDER_CONF_KEY, _DEFAULT_PROVIDER)


def checkpoint_source_offsets(
    checkpoint: str, spark: Optional[SparkSession] = None
) -> Optional[list]:
    """Per-source offsets of the last COMMITTED batch in a checkpoint.

    The seed for bounded-replay migration on non-replayable sources: the
    returned list has one entry per source (parsed JSON where the offset
    is JSON — e.g. Kafka's partition map — else the raw string).  Returns
    None when nothing was committed yet (or the path is unreachable —
    see :func:`_ckpt_io`).
    """
    import json

    io = _ckpt_io(checkpoint, spark)
    if io is None:
        return None
    list_names, read_text = io
    names = list_names("commits")
    if not names:
        return None
    committed = sorted(int(f) for f in names if f.isdigit())
    if not committed:
        return None
    lines = read_text("offsets", str(committed[-1])).splitlines()
    out = []
    for ln in lines[2:]:  # line 0: version, line 1: metadata, 2+: sources
        try:
            out.append(json.loads(ln))
        except ValueError:
            out.append(ln)
    return out


def _warn_on_pinned_provider(spark: SparkSession, checkpoint: str) -> None:
    """Restart guard: turning the silent provider no-op into evidence.

    Called by every maintainer before ``start()``: when the session conf
    requests a different provider than the checkpoint pins, the restart
    would quietly keep the old backend (the r7 capacity measurements say
    that difference is OOM-vs-degrade at ~12M state rows), so say it
    loudly and point at the migration recipe.
    """
    pinned = checkpoint_state_provider(checkpoint, spark)
    if pinned is None:
        return
    requested = spark.conf.get(_PROVIDER_CONF_KEY, _DEFAULT_PROVIDER)
    if requested != pinned:
        import logging

        logging.getLogger(__name__).warning(
            "checkpoint %s pins state-store provider %s; the session's %s "
            "is IGNORED on restart. To migrate: drain, retire the "
            "checkpoint, restart fresh (see scalable_state_conf docstring).",
            checkpoint,
            pinned.rsplit(".", 1)[-1],
            requested.rsplit(".", 1)[-1],
        )


@contextmanager
def sized_stream_start(
    spark: SparkSession, partitions: int, isolated: bool = False
):
    """Start streaming queries with a state shuffle sized to THEIR need.

    ``spark.sql.shuffle.partitions`` is read when a streaming query is
    planned and baked into its checkpoint — it then holds for the query's
    whole life, independent of later session-conf changes.  An always-on
    stream that inherits the batch-sized session default therefore queues
    full-cluster task waves every micro-batch whether it needs them or
    not.  Measured (scripts/mixed_workload_interference.py, SCALE.md
    round 7): a 400k rows/s rollup inheriting 32 partitions inflates a
    concurrent batch pass 2.0-3.7x even behind weighted FAIR pools; the
    same stream started 8-wide inflates it 1.00x and still sustains its
    offered rate.

    Use as::

        with sized_stream_start(spark, 8) as s:
            q = s.readStream...  # build the stream FROM the yielded session
            ...writeStream...start()

    Default mode mutates the shared session conf and restores it on exit
    — correct when nothing else is PLANNING queries concurrently (the
    runtime SQLConf is session-wide, not thread-scoped, so a batch query
    planned by another thread inside the block would inherit the tiny
    setting).  In a live mixed deployment pass ``isolated=True``: the
    block yields ``spark.newSession()`` (same SparkContext/cluster, own
    SQLConf) with the sizing applied there, so the parent session's
    batch planning is untouched at every instant and nothing needs
    restoring.  Size ``partitions`` to the stream's measured throughput
    need (offered rate / per-core capacity), not to the cluster width.
    """
    if isolated:
        child = spark.newSession()
        child.conf.set("spark.sql.shuffle.partitions", str(partitions))
        yield child
        return
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-based event stream (each new file is a micro-batch)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Streaming analog of the batch ``hourly_event_rollup`` query.

    Watermark bounds state: late events beyond the horizon are dropped, the
    rest update their hour bucket incrementally.  ``window`` narrows the
    bucket (the throughput harness uses seconds-scale windows so state
    turnover is observable inside a short run).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_ts"), "event_type", "n_events", "total_value"
        )
    )


def session_stream(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization: native gap-based session windows per user.

    Matches the batch ``event_sessions`` semantics (a session ends after
    ``gap`` of inactivity) with watermark-driven state cleanup.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def run_to_memory(
    stream_df: DataFrame, table_name: str, output_mode: str = "append"
) -> "StreamingQuery":
    """Drive a streaming DataFrame into an in-memory sink (tests/debug)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)

_RUNNING_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("cents", T.LongType())]
)


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    ``applyInPandasWithState``.

    The built-in aggregations cover windowed/sessionized state; this is the
    arbitrary-state escape hatch (SURVEY §2.10 stretch goal) — per-key state
    is a (count, value-cents) pair carried across micro-batches, values
    quantized to integer cents so the running sum is exact and
    batch/stream-order independent.  State is partitioned by user_id (one
    shuffle per micro-batch); memory is O(distinct users), not O(events).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["value"].fillna(0.0).mul(100).round().sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value_cents": [cents]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        RUNNING_TOTALS_SCHEMA,
        _RUNNING_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def dedup_stream(events: DataFrame, keys=("event_id",),
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once-per-key dedup within the watermark horizon.

    The training-pipeline ingest guard: duplicate deliveries of the same
    event (at-least-once sources, retried batches) are dropped as long as
    the duplicate arrives within the watermark of the original.  State is
    one entry per key, expired by the watermark — bounded, unlike batch
    ``dropDuplicates`` which would hold all keys forever on a stream.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def _require_local_path(target_path: str) -> None:
    """The marker/rename exactly-once machinery is os.rename/open-based and
    therefore only correct on a driver-local POSIX path.  A URI-scheme
    target (hdfs://, s3a://, even file://) would have Spark write the data
    remotely while the marker read and atomic swap silently operate on a
    nonexistent LOCAL path — defeating the exactly-once guard.  Fail loudly
    instead; remote targets need the Hadoop FileSystem API variant."""
    import re

    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", target_path):
        raise ValueError(
            "streaming table maintenance requires a driver-local POSIX "
            f"path; got URI {target_path!r} (the atomic-swap + batch-id "
            "marker protocol uses os.rename and would not see the data "
            "Spark writes to that scheme)"
        )


def _committed_batch_id(target_path: str):
    """Batch id carried INSIDE the maintained table directory.

    foreachBatch is at-least-once at the commit boundary: a crash between
    the table swap and the checkpoint commit replays the batch, which
    would double-merge any non-idempotent (additive) state.  Writing the
    batch id into the staged directory BEFORE the atomic rename makes
    marker and data inseparable — on replay the maintainer sees its own
    id and skips.  (Spark readers ignore underscore-prefixed files, like
    _SUCCESS.)  The target and its checkpoint are a pair: re-pointing an
    existing table at a fresh checkpoint restarts batch ids and must
    start from an empty target.
    """
    import os

    _require_local_path(target_path)
    _recover_swapped(target_path)
    marker = os.path.join(target_path, "_batch_id")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read().strip())
    return None


def _recover_swapped(target_path: str) -> None:
    """Heal a crash inside :func:`_swap_with_marker`.

    The swap renames the live table ASIDE (never deletes it first): if the
    process died between rename-aside and rename-in, the table is at
    ``target.old`` and must be restored — otherwise a replayed batch would
    silently re-initialize the accumulated state from one batch's
    partials.  If both exist, the swap completed and ``.old`` is garbage.
    """
    import os
    import shutil

    old = target_path + ".old"
    if os.path.exists(old):
        if os.path.exists(target_path):
            shutil.rmtree(old, ignore_errors=True)  # swap finished; leftover
        else:
            os.rename(old, target_path)  # swap died mid-way; restore


def _swap_with_marker(result: DataFrame, target_path: str, batch_id: int) -> None:
    """Stage + marker + rename-aside + rename-in: readers never see partial
    state, and NO crash point loses the previous table (the old state is
    renamed aside, not deleted, until the new table is live — see
    :func:`_recover_swapped` for the healing half)."""
    import os
    import shutil

    _require_local_path(target_path)
    tmp = target_path + f".tmp-{batch_id}"
    result.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_batch_id"), "w") as f:
        f.write(str(batch_id))
    old = target_path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(target_path):
        os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old, ignore_errors=True)


def rollup_to_table_stream(
    events: DataFrame,
    target_path: str,
    checkpoint: str,
) -> "StreamingQuery":
    """Continuously maintain the hourly rollup TABLE from an event stream.

    ``foreachBatch`` + the algebraic-merge pattern
    (``workload.incremental_rollup_merge``): each micro-batch aggregates to
    partials (count, exact decimal sum — mergeable), merges with the current
    rollup by re-aggregation, and overwrites atomically via a staged write.
    State lives in the TABLE, not the stream (no watermark bound needed);
    restart recovery comes from the checkpoint. The streaming analog of the
    reference's percolator refresh loop.
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        committed = _committed_batch_id(target_path)
        if committed is not None and batch_id <= committed:
            return  # replayed batch already merged (see _committed_batch_id)
        partials = (
            batch_df.groupBy(
                F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
                F.col("event_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("p_n"),
                F.sum(F.col("value").cast("decimal(12,2)")).alias("p_sum"),
            )
        )
        # Only a genuinely-absent table means "first batch"; any other read
        # failure (corrupt files, permissions) must abort the batch rather
        # than silently discarding the accumulated rollup state.
        import os

        if os.path.exists(target_path):
            current = spark.read.parquet(target_path)
        else:
            current = None
        merged = (
            partials if current is None else current.unionByName(partials)
        )
        result = (
            merged.groupBy("hour_ts", "event_type")
            .agg(
                F.sum("p_n").cast("long").alias("p_n"),
                F.sum("p_sum").cast("decimal(22,2)").alias("p_sum"),
            )
        )
        _swap_with_marker(result, target_path, batch_id)

    _warn_on_pinned_provider(events.sparkSession, checkpoint)
    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def sketch_rollup_stream(
    events: DataFrame,
    target_path: str,
    checkpoint: str,
    key_col: str = "user_id",
) -> "StreamingQuery":
    """Continuously maintain a distinct-count HLL register TABLE per day.

    The streaming face of ``operators/sketch.py``: each micro-batch
    computes its own (day, register, max_rho) partial sketch — 256 rows
    per day slice no matter the batch size — and merges it into the
    persisted register table with the sketch's own algebra (UNION ALL +
    groupBy + MAX, associative and idempotent-under-re-MAX).  Unlike a
    streaming ``approx_count_distinct`` the state is inspectable,
    persists as a tiny parquet any engine can read, and rolls up to ANY
    date window later by re-MAXing — the pattern that distinct-counts
    100 TB of history without re-reading it.  Estimates come from
    ``sketch.hll_estimate`` over the stored registers at query time.
    """
    from ..operators import sketch as sk

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        committed = _committed_batch_id(target_path)
        if committed is not None and batch_id <= committed:
            return  # MAX-merge is idempotent, but skipping is still cheaper
        with_day = batch_df.select(
            F.to_date(F.col("ts")).alias("day"), F.col(key_col)
        )
        # the exact batch-side operator — streamed state can never diverge
        # from what the batch sketch (and its tests) compute
        partial = sk.hll_registers_grouped(with_day, key_col, ["day"])
        import os
        import shutil

        if os.path.exists(target_path):
            current = spark.read.parquet(target_path)
            merged = current.unionByName(partial)
        else:
            merged = partial
        result = merged.groupBy("day", "register").agg(
            F.max("max_rho").alias("max_rho")
        )
        _swap_with_marker(result, target_path, batch_id)

    _warn_on_pinned_provider(events.sparkSession, checkpoint)
    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cms_rollup_stream(
    events: DataFrame,
    target_path: str,
    checkpoint: str,
    key_col: str = "user_id",
) -> "StreamingQuery":
    """Continuously maintain a count-min sketch TABLE from an event stream.

    Counter sketches are ADDITIVE (unlike HLL's max-merge): each
    micro-batch's bounded (row, col, cnt) table merges into the persisted
    sketch by UNION ALL + SUM, so the state is DEPTH×WIDTH rows forever
    while supporting frequency estimates over the whole stream history —
    query with ``sketch.cms_estimate_col`` over ``sketch.collect_cms`` of
    the stored table.  Same staged-swap/checkpoint discipline as the
    other foreachBatch maintainers.
    """
    from ..operators import sketch as sk

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        committed = _committed_batch_id(target_path)
        if committed is not None and batch_id <= committed:
            return  # additive merge would double-count a replayed batch
        partial = sk.cms_table(batch_df, key_col)
        import os
        import shutil

        if os.path.exists(target_path):
            current = spark.read.parquet(target_path)
            merged = current.unionByName(partial)
        else:
            merged = partial
        result = merged.groupBy("row", "col").agg(
            F.sum("cnt").alias("cnt")
        )
        _swap_with_marker(result, target_path, batch_id)

    _warn_on_pinned_provider(events.sparkSession, checkpoint)
    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def kll_rollup_stream(
    events: DataFrame,
    target_path: str,
    checkpoint: str,
    value_col: str = "value",
    capacity: int = 256,
) -> "StreamingQuery":
    """Continuously maintain a bounded QUANTILE-sketch table from a stream.

    The percentile face of the sketch maintainers (HLL = distinct, CMS =
    frequency, this = p50/p99): each micro-batch runs the map-only
    per-partition KLL pass over its own rows, and the batch's sketch rows
    merge into the persisted table via ``quantiles.kll_merge_rows`` — the
    level-respecting KLL merge, so the stored state stays
    <= capacity * log2(n/capacity) rows over ANY stream length while
    rank error stays O(n log(n/capacity) / capacity).  Both sides of the
    merge are metadata-scale (that is the point of a sketch), so the
    driver-side merge is bounded like ``kll_quantiles``'s own walk.
    Estimates at query time: ``kll_quantiles(spark.read.parquet(target))``.
    Exactly-once via the committed-batch-id marker: re-adding a replayed
    batch would double its rank mass (additive, like CMS, unlike HLL's
    idempotent MAX).
    """
    from ..operators import quantiles as qt

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        committed = _committed_batch_id(target_path)
        if committed is not None and batch_id <= committed:
            return  # additive mass — a replayed batch must not re-enter
        partial = qt.kll_partition_sketches(
            batch_df.select(F.col(value_col).cast("double").alias("v")),
            "v",
            capacity,
        )
        rows = [(r["value"], r["weight"]) for r in partial.collect()]
        import os

        if os.path.exists(target_path):
            rows += [
                (r["value"], r["weight"])
                for r in spark.read.parquet(target_path).collect()
            ]
        merged = qt.kll_merge_rows(rows, capacity)
        result = spark.createDataFrame(merged, "value double, weight long")
        _swap_with_marker(result, target_path, batch_id)

    _warn_on_pinned_provider(events.sparkSession, checkpoint)
    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def reference_histogram(
    df: DataFrame, value_col: str = "value", bins: int = 16
) -> dict:
    """Bounded equi-width reference histogram for drift monitoring.

    Returns plain-Python metadata (``lo``/``width``/``bins``/``probs``/
    ``n``) — ``bins`` numbers total, never row data — with Laplace
    smoothing ``(c+1)/(n+bins)`` so no reference bin has zero mass (an
    unseen-in-reference value must raise the drift statistic, not divide
    by zero).  Build it once from a trusted window, then hand it to
    :func:`drift_monitor_stream`; at 100 TB the reference pass is one
    partial-agg scan producing ``bins`` rows.
    """
    lo, hi, n = df.agg(
        F.min(value_col), F.max(value_col), F.count(F.lit(1))
    ).first()
    if n == 0 or lo is None or hi is None or hi == lo:
        raise ValueError("reference needs >=2 distinct values")
    width = (float(hi) - float(lo)) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)),
        ),
    ).cast("int")
    counts = {
        r["bin"]: r["c"]
        for r in df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    probs = [(counts.get(i, 0) + 1) / (n + bins) for i in range(bins)]
    return {
        "lo": float(lo),
        "width": width,
        "bins": bins,
        "probs": probs,
        "n": int(n),
    }


def drift_monitor_stream(
    events: DataFrame,
    reference: dict,
    target_path: str,
    checkpoint: str,
    value_col: str = "value",
    chi2_threshold: float | None = None,
) -> "StreamingQuery":
    """Per-micro-batch distribution-drift reports against a reference.

    The data-quality face of the statistical catalog entries: each batch
    is binned into the reference's equi-width histogram (edge bins absorb
    out-of-range values, so a shifted distribution lands loudly in a
    tail), and one report row is appended with the chi-square
    goodness-of-fit statistic against the smoothed reference, the total
    variation distance, and a ``drifted`` verdict.  Batch work is one
    ``bins``-row aggregate regardless of batch size; the report table
    grows one row per batch.  Replayed batches are skipped via the same
    committed-batch-id marker as the other foreachBatch maintainers
    (append would double-report).  Default threshold 3*(bins-1): ~the
    p<<0.001 tail of the chi-square(bins-1) null, loose enough that
    sampling noise on an in-distribution batch stays quiet.
    """
    lo, width, bins = reference["lo"], reference["width"], reference["bins"]
    probs = reference["probs"]
    threshold = (
        chi2_threshold if chi2_threshold is not None else 3.0 * (bins - 1)
    )

    def report_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        committed = _committed_batch_id(target_path)
        if committed is not None and batch_id <= committed:
            return
        b = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
            ),
        ).cast("int")
        counts = {
            r["bin"]: r["c"]
            for r in batch_df.select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        n = sum(counts.values())
        if n == 0:
            return
        chi2 = 0.0
        tvd = 0.0
        for i in range(bins):
            o = counts.get(i, 0)
            e = n * probs[i]
            chi2 += (o - e) * (o - e) / e
            tvd += abs(o / n - probs[i])
        tvd *= 0.5
        report = spark.createDataFrame(
            [(int(batch_id), int(n), float(chi2), float(tvd),
              bool(chi2 > threshold))],
            "batch_id long, n_rows long, chi2 double, tvd double, "
            "drifted boolean",
        )
        import os

        if os.path.exists(target_path):
            report = spark.read.parquet(target_path).unionByName(report)
        _swap_with_marker(report, target_path, batch_id)

    _warn_on_pinned_provider(events.sparkSession, checkpoint)
    return (
        events.writeStream.foreachBatch(report_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
