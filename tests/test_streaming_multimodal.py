"""Structured Streaming pipelines + multimodal column plumbing."""

import pytest
from pyspark.sql import functions as F

from arthur_redshift_etl_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_metadata,
    extract_features,
    frame_sample_plan,
)
from arthur_redshift_etl_spark.streaming.events import (
    hourly_rollup_stream,
    read_event_stream,
    run_to_memory,
    session_stream,
)
from arthur_redshift_etl_spark.workload import t as load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events-stream"))
    ev = load_table(spark, SF, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    ev.repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_hourly_rollup_stream_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    # complete mode: append would hold back the final windows that the
    # watermark never closes once the bounded stream ends
    q = run_to_memory(hourly_rollup_stream(stream), "rollup_sink", "complete")
    q.awaitTermination(120)
    got = spark.table("rollup_sink")
    batch = load_table(spark, SF, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    expect = (
        batch.groupBy(F.date_trunc("hour", "ts").alias("hour_ts"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )
    got_rows = {tuple(map(str, r)) for r in got.collect()}
    expect_rows = {tuple(map(str, r)) for r in expect.collect()}
    assert got_rows == expect_rows


def test_session_stream_runs_and_bounds_sessions(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    q = run_to_memory(session_stream(stream), "session_sink", "append")
    q.awaitTermination(120)
    sessions = spark.table("session_sink")
    assert sessions.count() > 0
    # every session span is below the data horizon and non-negative
    bad = sessions.filter("session_end < session_start").count()
    assert bad == 0
    # a user's sessions don't overlap
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    overlaps = (
        sessions.withColumn("prev_end", F.lag("session_end").over(w))
        .filter("prev_end IS NOT NULL AND session_start < prev_end")
        .count()
    )
    assert overlaps == 0


@pytest.fixture()
def media_df(spark):
    rows = [(i, None, f"payload-{i}".encode() * (i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id long, uri string, payload binary")
    return attach_metadata(df)


def test_multimodal_metadata_and_fake_features(media_df):
    meta = media_df.select("media_id", "meta.n_bytes").collect()
    assert all(r["n_bytes"] > 0 for r in meta)
    feats = extract_features(media_df, use_fake_decoder=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    # deterministic: same payload → same features
    again = extract_features(media_df, use_fake_decoder=True).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_multimodal_real_decoder_rejects_unknown_formats(media_df):
    # payloads here are arbitrary bytes (neither BMP nor WAV): the real
    # decode path must fail loudly, not fabricate features
    with pytest.raises(Exception) as exc_info:
        extract_features(media_df, use_fake_decoder=False).collect()
    assert "UnsupportedMediaError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, None, b"x")], "media_id long, uri string, payload binary"
    )
    video = df.withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("modality"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(3500).alias("duration_ms"),
            F.lit(1).cast("long").alias("n_bytes"),
        ),
    )
    frames = frame_sample_plan(video, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_running_user_totals_stateful_stream(spark, event_dir):
    """applyInPandasWithState carries exact per-user state across batches."""
    from arthur_redshift_etl_spark.streaming.events import running_user_totals_stream

    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    q = run_to_memory(running_user_totals_stream(stream), "running_sink", "update")
    q.awaitTermination(120)
    emitted = spark.table("running_sink")
    # multiple micro-batches -> most users emit more than one running row
    assert emitted.count() > emitted.select("user_id").distinct().count()
    # the LAST emission per user must equal the batch aggregate
    final = (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value_cents").alias("total_value_cents"),
        )
    )
    batch = load_table(spark, SF, "events")
    expect = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_cents"),
    )
    diff = final.exceptAll(expect).count() + expect.exceptAll(final).count()
    assert diff == 0


def test_dedup_stream_drops_redelivered_events(spark, tmp_path):
    """dropDuplicatesWithinWatermark removes duplicate deliveries."""
    from arthur_redshift_etl_spark.streaming.events import (
        dedup_stream,
        read_event_stream,
    )

    d = str(tmp_path / "dup-events")
    ev = load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).limit(500)
    # deliver everything twice (two files → two micro-batches)
    ev.coalesce(1).write.mode("overwrite").parquet(d)
    ev.coalesce(1).write.mode("append").parquet(d)
    stream = read_event_stream(spark, d, max_files_per_trigger=1)
    q = run_to_memory(dedup_stream(stream), "dedup_sink", "append")
    q.awaitTermination(120)
    got = spark.table("dedup_sink")
    assert got.count() == 500
    assert got.select("event_id").distinct().count() == 500


def test_dedup_stream_on_rocksdb_state_store(spark, tmp_path):
    """scalable_state_conf routes state to RocksDB with identical results.

    The backend matters at scale (SCALE.md round-7 A/B: the on-heap store
    OOMs at ~12M per-key state rows where RocksDB degrades to disk); this
    pins that the conf actually engages RocksDB (provider metrics visible
    in progress) and that results are backend-independent.  The provider
    class is read at query start, so setting it on the live session
    applies to the query started below.
    """
    from arthur_redshift_etl_spark.streaming.events import (
        dedup_stream,
        read_event_stream,
        run_to_memory,
        scalable_state_conf,
    )

    d = str(tmp_path / "dup-events-rocks")
    ev = load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).limit(300)
    ev.coalesce(1).write.mode("overwrite").parquet(d)
    ev.coalesce(1).write.mode("append").parquet(d)

    conf_key, provider = next(iter(scalable_state_conf().items()))
    old = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, provider)
    try:
        stream = read_event_stream(spark, d, max_files_per_trigger=1)
        q = run_to_memory(dedup_stream(stream), "dedup_rocks_sink", "append")
        q.awaitTermination(120)
        progress = q.recentProgress
        state_metrics = [
            m
            for p in progress
            if p.stateOperators
            for m in (p.stateOperators[0].customMetrics or {})
        ]
        assert any(m.startswith("rocksdb") for m in state_metrics), state_metrics[:10]
    finally:
        if old is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old)
    got = spark.table("dedup_rocks_sink")
    assert got.count() == 300
    assert got.select("event_id").distinct().count() == 300


def test_rollup_to_table_stream_matches_batch(spark, event_dir, tmp_path):
    """foreachBatch-maintained rollup table == batch aggregate after drain."""
    from arthur_redshift_etl_spark.streaming.events import (
        read_event_stream,
        rollup_to_table_stream,
    )

    target = str(tmp_path / "rollup-table")
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    q = rollup_to_table_stream(stream, target, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = (
        spark.read.parquet(target)
        .select(
            "hour_ts",
            "event_type",
            F.col("p_n").alias("n_events"),
            F.col("p_sum").cast("double").alias("total_value"),
        )
    )
    batch = load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    expect = batch.groupBy(
        F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
    )
    assert {tuple(map(str, r)) for r in got.collect()} == {
        tuple(map(str, r)) for r in expect.collect()
    }


def test_sketch_rollup_stream_matches_batch_sketch(spark, event_dir, tmp_path):
    """Streaming per-day HLL register table (merged across micro-batches)
    == the batch sketch over the same data — the merge algebra (UNION ALL
    + MAX) is associative, so batch boundaries cannot change the state."""
    from arthur_redshift_etl_spark.operators import sketch as sk
    from arthur_redshift_etl_spark.streaming.events import (
        read_event_stream,
        sketch_rollup_stream,
    )

    target = str(tmp_path / "sketch-table")
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    q = sketch_rollup_stream(stream, target, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {
        (str(r["day"]), r["register"], r["max_rho"])
        for r in spark.read.parquet(target).collect()
    }
    batch = load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    h = F.md5(F.col("user_id").cast("string"))
    expect = {
        (str(r["day"]), r["register"], r["max_rho"])
        for r in batch.select(
            F.to_date("ts").alias("day"),
            sk._register(h).alias("register"),
            sk._rho(h).alias("rho"),
        )
        .groupBy("day", "register")
        .agg(F.max("rho").alias("max_rho"))
        .collect()
    }
    assert got == expect and len(got) > 0

    # estimates derived from the streamed state are within the HLL bound
    regs = spark.read.parquet(target).groupBy("register").agg(
        F.max("max_rho").alias("max_rho")
    )
    est = sk.hll_estimate(regs).collect()[0]["hll_estimate"]
    exact = batch.select("user_id").distinct().count()
    assert abs(est - exact) <= 4 * sk.hll_error_bound() * exact


def test_cms_rollup_stream_matches_batch_sketch(spark, event_dir, tmp_path):
    """Streamed CMS (additive merge across micro-batches) == batch sketch,
    and estimates from the streamed state never undercount."""
    from arthur_redshift_etl_spark.operators import sketch as sk
    from arthur_redshift_etl_spark.streaming.events import (
        cms_rollup_stream,
        read_event_stream,
    )

    target = str(tmp_path / "cms-table")
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    q = cms_rollup_stream(stream, target, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in spark.read.parquet(target).collect()
    }
    batch = load_table(spark, SF, "events")
    want = {
        (r["row"], r["col"]): r["cnt"]
        for r in sk.cms_table(batch, "user_id").collect()
    }
    assert got == want and len(got) > 0

    flat = sk.collect_cms(spark.read.parquet(target))
    exact = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    ests = {
        r["user_id"]: r["est"]
        for r in batch.select("user_id").distinct()
        .withColumn("est", sk.cms_estimate_col(flat, F.col("user_id")))
        .collect()
    }
    assert all(ests[k] >= v for k, v in exact.items())


def test_rollup_stream_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Kill the maintainer after the first micro-batch, restart with the
    SAME checkpoint: already-committed batches are not re-merged (the
    additive rollup would double-count otherwise) and the final table
    equals the batch aggregate — foreachBatch exactly-once via batch-id
    tracking in the checkpoint."""
    from arthur_redshift_etl_spark.streaming.events import (
        read_event_stream,
        rollup_to_table_stream,
    )

    # fresh copy of the event files so this test controls file count
    src = load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    d = str(tmp_path / "events-src")
    src.repartition(6).write.mode("overwrite").parquet(d)

    target = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: one file per trigger, stop after the first committed batch
    stream = read_event_stream(spark, d, max_files_per_trigger=1)
    q = rollup_to_table_stream(stream, target, ckpt)
    import time as _t

    deadline = _t.time() + 60
    while _t.time() < deadline and not q.recentProgress:
        _t.sleep(0.5)
    q.stop()
    q.awaitTermination(30)

    # phase 2: restart with the same checkpoint, drain everything
    q2 = rollup_to_table_stream(
        read_event_stream(spark, d, max_files_per_trigger=1), target, ckpt
    )
    q2.awaitTermination(120)

    got = {
        (str(r["hour_ts"]), r["event_type"], r["p_n"], str(r["p_sum"]))
        for r in spark.read.parquet(target).collect()
    }
    expect = {
        (str(r["hour_ts"]), r["event_type"], r["n"], str(r["s"]))
        for r in src.groupBy(
            F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(22,2)")
            .alias("s"),
        )
        .collect()
    }
    assert got == expect


def test_batch_marker_skips_replayed_batch(spark, tmp_path):
    """Direct unit check of the replay guard: a target carrying batch-id N
    causes any batch <= N to be skipped (additive merges stay single-count
    even when foreachBatch replays after a crash-before-checkpoint)."""
    import os

    from arthur_redshift_etl_spark.streaming.events import (
        _committed_batch_id,
        _swap_with_marker,
    )

    target = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10)], "k long, v long")
    _swap_with_marker(df, target, batch_id=3)
    assert _committed_batch_id(target) == 3
    # marker lives inside the swapped dir and Spark readers ignore it
    assert os.path.exists(os.path.join(target, "_batch_id"))
    assert spark.read.parquet(target).count() == 1
    # a later swap bumps it atomically
    _swap_with_marker(df, target, batch_id=4)
    assert _committed_batch_id(target) == 4


def test_swap_recovery_restores_table_lost_mid_swap(spark, tmp_path):
    """Crash between rename-aside and rename-in must NOT lose the table:
    the next _committed_batch_id call heals it from the .old directory."""
    import os

    from arthur_redshift_etl_spark.streaming.events import (
        _committed_batch_id,
        _swap_with_marker,
    )

    target = str(tmp_path / "t")
    _swap_with_marker(spark.createDataFrame([(1,)], "v long"), target, 7)
    # simulate the crash window: table renamed aside, new one never arrived
    os.rename(target, target + ".old")
    assert not os.path.exists(target)
    assert _committed_batch_id(target) == 7  # healed + marker readable
    assert spark.read.parquet(target).count() == 1
    # completed-swap leftover: .old alongside a live table is garbage
    _swap_with_marker(spark.createDataFrame([(2,)], "v long"), target, 8)
    os.makedirs(target + ".old", exist_ok=True)
    assert _committed_batch_id(target) == 8
    assert not os.path.exists(target + ".old")


def test_stream_static_broadcast_enrichment(spark, event_dir):
    """Stream-static join: a micro-batch stream enriched against a static
    broadcast dimension — the streaming face of the star-join pattern.
    Every output row carries the dimension attribute; counts match batch."""
    from arthur_redshift_etl_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
    )

    events = read_event_stream(spark, event_dir, max_files_per_trigger=2)
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "convert"),
         ("error", "ops"), ("signup", "convert")],
        "event_type string, funnel_stage string",
    )
    enriched = events.join(F.broadcast(dim), "event_type", "left")
    q = run_to_memory(enriched, "enriched_sink")
    q.awaitTermination(120)
    got = spark.table("enriched_sink")
    batch_n = load_table(spark, SF, "events").count()
    assert got.count() == batch_n
    # left join + complete dim: no event loses its stage
    assert got.filter(F.col("funnel_stage").isNull()).count() == 0


def test_drift_monitor_stream_flags_shift_and_skips_replay(
    spark, event_dir, tmp_path
):
    """In-distribution batches stay quiet, a scale-shifted stream drifts
    loudly, and a replayed run (same checkpoint) appends nothing."""
    from arthur_redshift_etl_spark.streaming.events import (
        drift_monitor_stream,
        read_event_stream,
        reference_histogram,
    )

    batch = load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ref = reference_histogram(batch, "value", bins=16)
    assert len(ref["probs"]) == 16
    assert abs(sum(ref["probs"]) - 1.0) < 1e-9

    # same-distribution stream: every batch must be un-drifted
    target = str(tmp_path / "drift-ok")
    q = drift_monitor_stream(
        read_event_stream(spark, event_dir, max_files_per_trigger=2),
        ref,
        target,
        str(tmp_path / "ckpt-ok"),
    )
    q.awaitTermination(120)
    reports = spark.read.parquet(target).collect()
    assert len(reports) >= 2  # multiple micro-batches reported
    assert all(not r["drifted"] for r in reports)
    assert sum(r["n_rows"] for r in reports) == batch.count()

    # replay with the SAME checkpoint: availableNow re-run appends nothing
    n_before = len(reports)
    q2 = drift_monitor_stream(
        read_event_stream(spark, event_dir, max_files_per_trigger=2),
        ref,
        target,
        str(tmp_path / "ckpt-ok"),
    )
    q2.awaitTermination(120)
    assert len(spark.read.parquet(target).collect()) == n_before

    # scale-shifted stream: all mass lands in the top edge bin -> drifted
    shifted_dir = str(tmp_path / "events-shifted")
    batch.withColumn("value", F.col("value") * 1000 + 1e9).repartition(
        2
    ).write.mode("overwrite").parquet(shifted_dir)
    target2 = str(tmp_path / "drift-bad")
    q3 = drift_monitor_stream(
        read_event_stream(spark, shifted_dir, max_files_per_trigger=2),
        ref,
        target2,
        str(tmp_path / "ckpt-bad"),
    )
    q3.awaitTermination(120)
    bad = spark.read.parquet(target2).collect()
    assert len(bad) >= 1
    assert all(r["drifted"] for r in bad)
    assert all(r["tvd"] > 0.5 for r in bad)


def test_kll_rollup_stream_bounded_state_and_rank_error(spark, event_dir, tmp_path):
    """Streamed KLL quantile table: micro-batch sketches merged via the
    level-respecting KLL merge — total rank mass equals the row count
    exactly, state stays bounded, and estimates stay within the rank
    error bound against exact ranks over the full history."""
    import math

    from arthur_redshift_etl_spark.operators import quantiles as qt
    from arthur_redshift_etl_spark.streaming.events import (
        kll_rollup_stream,
        read_event_stream,
    )

    target = str(tmp_path / "kll-table")
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=1)
    q = kll_rollup_stream(stream, target, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    state = spark.read.parquet(target)
    batch = load_table(spark, SF, "events").select(
        F.col("value").cast("double").alias("v")
    ).filter(F.col("v").isNotNull())
    n = batch.count()
    # mass conservation: the merge never loses or duplicates an item
    assert state.agg(F.sum("weight")).collect()[0][0] == n
    # bounded state regardless of how many batches streamed in
    levels = max(1, int(math.log2(max(2, n // 256))) + 2)
    assert state.count() <= 256 * levels
    # rank error of the streamed estimates vs exact ranks (merge adds
    # compactions over the single-pass bound; 3% is the tested envelope)
    for p, est in zip([0.5, 0.99], qt.kll_quantiles(state, [0.5, 0.99])):
        rank = batch.filter(F.col("v") <= est).count()
        assert abs(rank - p * n) <= 0.03 * n, (p, est, rank, n)


def test_kll_merge_rows_rejects_foreign_weights():
    import pytest as _pytest

    from arthur_redshift_etl_spark.operators.quantiles import kll_merge_rows

    with _pytest.raises(ValueError):
        kll_merge_rows([(1.0, 3)], 4)
    with _pytest.raises(ValueError):
        kll_merge_rows([(1.0, 1)], 5)


def test_kll_rollup_replay_with_lost_checkpoint_adds_nothing(spark, event_dir, tmp_path):
    """The KLL table's rank mass is ADDITIVE, so exactly-once must come
    from the committed-batch-id marker, not the streaming checkpoint: a
    full replay with a FRESH checkpoint (simulating checkpoint loss)
    re-delivers every batch, and the marker must reject all of them —
    total mass stays n, not 2n."""
    from arthur_redshift_etl_spark.streaming.events import (
        kll_rollup_stream,
        read_event_stream,
    )

    target = str(tmp_path / "kll-table")
    q = kll_rollup_stream(
        read_event_stream(spark, event_dir, max_files_per_trigger=1),
        target,
        str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)
    state1 = sorted(
        map(tuple, spark.read.parquet(target).collect())
    )
    n = sum(w for _, w in state1)

    # checkpoint lost: replay the whole stream against the same target
    q2 = kll_rollup_stream(
        read_event_stream(spark, event_dir, max_files_per_trigger=1),
        target,
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    state2 = sorted(
        map(tuple, spark.read.parquet(target).collect())
    )
    assert state2 == state1  # byte-identical, nothing re-added
    assert sum(w for _, w in state2) == n


def test_sized_stream_start_bakes_state_width_and_restores_conf(
    spark, event_dir, tmp_path
):
    """The stream's state shuffle is sized at query start (baked into the
    checkpoint) while the session conf is restored for batch work — the
    measured mixed-workload recipe (SCALE.md round 7: a 32-wide stream
    inflates concurrent batch 2-3.7x; the same stream 8-wide, 1.00x)."""
    import json
    import os

    from arthur_redshift_etl_spark.streaming.events import sized_stream_start

    before = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt = str(tmp_path / "sized-ckpt")
    with sized_stream_start(spark, 3):
        q = (
            hourly_rollup_stream(
                read_event_stream(spark, event_dir, max_files_per_trigger=2)
            )
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    q.awaitTermination(120)
    # session conf restored for batch queries planned after the block
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    # the sizing is baked into the query: offset log records 3 ...
    with open(os.path.join(ckpt, "offsets", "0")) as fh:
        lines = fh.read().splitlines()
    conf = next(json.loads(l) for l in lines if l.startswith("{"))
    assert conf["conf"]["spark.sql.shuffle.partitions"] == "3"
    # ... and the state store materialized exactly 3 partitions on disk
    state_parts = sorted(os.listdir(os.path.join(ckpt, "state", "0")))
    assert [p for p in state_parts if p.isdigit()] == ["0", "1", "2"]


def test_sized_stream_start_isolated_leaves_parent_conf_untouched(
    spark, event_dir, tmp_path
):
    """isolated=True plans the stream on a child session (own SQLConf,
    same SparkContext): concurrent batch planning on the parent never
    sees the stream's tiny partition count, at any instant."""
    import os

    from arthur_redshift_etl_spark.streaming.events import sized_stream_start

    before = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt = str(tmp_path / "sized-iso-ckpt")
    with sized_stream_start(spark, 3, isolated=True) as s:
        assert s is not spark
        assert s.conf.get("spark.sql.shuffle.partitions") == "3"
        # the parent is untouched INSIDE the block, not just after it
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
        q = (
            hourly_rollup_stream(
                read_event_stream(s, event_dir, max_files_per_trigger=2)
            )
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(120)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    state_parts = sorted(os.listdir(os.path.join(ckpt, "state", "0")))
    assert [p for p in state_parts if p.isdigit()] == ["0", "1", "2"]


# ---- state-store migration path (round 8) ----------------------------------

def test_checkpoint_pins_provider_and_session_conf_is_ignored(spark, tmp_path):
    """The migration trap, pinned: a checkpoint created on the heap store
    keeps the heap store on restart even when the session conf asks for
    RocksDB — the conf is SILENTLY ignored (measured: that difference is
    OOM-vs-degrade at ~12M state rows, SCALE.md r7).  The helper must
    read the pin, and the maintainer guard must turn it into a warning."""
    from arthur_redshift_etl_spark.streaming.events import (
        _warn_on_pinned_provider,
        checkpoint_source_offsets,
        checkpoint_state_provider,
        dedup_stream,
        read_event_stream,
        scalable_state_conf,
    )

    d = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ev = (
        load_table(spark, SF, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .limit(200)
    )
    ev.coalesce(1).write.mode("overwrite").parquet(d)

    def start():
        s = read_event_stream(spark, d, max_files_per_trigger=1)
        return (
            dedup_stream(s)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    assert checkpoint_state_provider(ckpt).endswith(
        "HDFSBackedStateStoreProvider"
    )
    offs = checkpoint_source_offsets(ckpt)
    assert offs and offs[0].get("logOffset") == 0  # file source, batch 0

    conf_key, provider = next(iter(scalable_state_conf().items()))
    old = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, provider)
    try:
        # redeliver the same events; with state honored, output stays 200
        ev.coalesce(1).write.mode("append").parquet(d)
        q2 = start()
        q2.processAllAvailable()
        prog = q2.recentProgress
        q2.stop()
        mets = [
            m
            for p in prog
            if p.stateOperators
            for m in (p.stateOperators[0].customMetrics or {})
        ]
        # the pin held: heap store still running, RocksDB NOT engaged
        assert not any(m.startswith("rocksdb") for m in mets), mets[:8]
        assert spark.read.parquet(out).count() == 200  # state was honored
        # and the guard says so out loud
        import logging

        records = []

        class Cap(logging.Handler):
            def emit(self, rec):
                records.append(rec.getMessage())

        lg = logging.getLogger("arthur_redshift_etl_spark.streaming.events")
        h = Cap()
        lg.addHandler(h)
        try:
            _warn_on_pinned_provider(spark, ckpt)
        finally:
            lg.removeHandler(h)
        assert any("IGNORED on restart" in m for m in records), records
    finally:
        if old is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old)


def test_checkpoint_probe_nonlocal_paths(spark, tmp_path):
    """ADVICE r8 #2: the probes must work on non-``os`` checkpoint paths.
    A ``file://`` URI exercises the Hadoop FileSystem route end-to-end
    (same client as HDFS/S3 in production) and must agree with the plain
    os-path read; an unreachable scheme must SKIP LOUDLY (warn + None),
    never crash a maintainer start or silently pass the provider guard."""
    from arthur_redshift_etl_spark.streaming.events import (
        checkpoint_source_offsets,
        checkpoint_state_provider,
        dedup_stream,
        read_event_stream,
    )

    d = str(tmp_path / "ev_nl")
    ckpt = str(tmp_path / "ckpt_nl")
    out = str(tmp_path / "out_nl")
    ev = (
        load_table(spark, SF, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .limit(50)
    )
    ev.coalesce(1).write.mode("overwrite").parquet(d)
    q = (
        dedup_stream(read_event_stream(spark, d, max_files_per_trigger=1))
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # Hadoop-FS route (file:// scheme with a session) == os route
    assert checkpoint_state_provider("file://" + ckpt, spark) == (
        checkpoint_state_provider(ckpt)
    )
    assert checkpoint_source_offsets("file://" + ckpt, spark) == (
        checkpoint_source_offsets(ckpt)
    )
    # file:// still readable with no session passed (falls back to os via
    # the active session's FS or the stripped path)
    assert checkpoint_state_provider("file://" + ckpt) is not None

    # unreachable scheme: loud skip, not an exception
    import logging

    records = []

    class Cap(logging.Handler):
        def emit(self, rec):
            records.append(rec.getMessage())

    lg = logging.getLogger("arthur_redshift_etl_spark.streaming.events")
    h = Cap()
    lg.addHandler(h)
    try:
        got = checkpoint_state_provider(
            "hdfs://nowhere.invalid:1/ckpt", spark
        )
    finally:
        lg.removeHandler(h)
    assert got is None
    assert any("SKIPPED" in m for m in records), records


def test_state_store_migration_recipe_fresh_checkpoint(spark, tmp_path):
    """The documented migration (drain -> retire checkpoint -> restart
    fresh with scalable_state_conf) end-to-end on a table maintainer:
    RocksDB actually engages after migration and the rebuilt table equals
    the pre-migration result (file-source replay + batch-id swap
    discipline make the replay idempotent)."""
    from arthur_redshift_etl_spark.streaming.events import (
        checkpoint_state_provider,
        read_event_stream,
        rollup_to_table_stream,
        scalable_state_conf,
    )

    d = str(tmp_path / "ev")
    ev = load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.repartition(3).write.mode("overwrite").parquet(d)
    target = str(tmp_path / "rollup")
    ckpt1 = str(tmp_path / "ckpt-heap")

    # phase 1: heap-store maintainer, drain and stop
    q = rollup_to_table_stream(
        read_event_stream(spark, d, max_files_per_trigger=1), target, ckpt1
    )
    q.awaitTermination(120)
    before = {
        (str(r["hour_ts"]), r["event_type"], r["p_n"], str(r["p_sum"]))
        for r in spark.read.parquet(target).collect()
    }
    assert checkpoint_state_provider(ckpt1).endswith(
        "HDFSBackedStateStoreProvider"
    )

    # phase 2: migrate — fresh checkpoint + RocksDB conf; the maintainer's
    # target keeps its batch-id marker from ckpt1's run, and a fresh
    # checkpoint restarts batch ids at 0, so the migrated stream must
    # rebuild into a FRESH target (re-pointing an existing table at a new
    # checkpoint is exactly the hazard _committed_batch_id documents)
    conf_key, provider = next(iter(scalable_state_conf().items()))
    old = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, provider)
    target2 = str(tmp_path / "rollup-migrated")
    ckpt2 = str(tmp_path / "ckpt-rocks")
    try:
        q2 = rollup_to_table_stream(
            read_event_stream(spark, d, max_files_per_trigger=1), target2, ckpt2
        )
        q2.awaitTermination(120)
    finally:
        if old is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old)
    assert checkpoint_state_provider(ckpt2).endswith(
        "RocksDBStateStoreProvider"
    )
    after = {
        (str(r["hour_ts"]), r["event_type"], r["p_n"], str(r["p_sum"]))
        for r in spark.read.parquet(target2).collect()
    }
    assert after == before
