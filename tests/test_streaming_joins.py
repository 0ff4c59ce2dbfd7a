"""Stream-stream interval joins + stream-static enrichment.

The equivalence oracle is the batch interval join over the same rows:
inner results must be identical whenever no row is late (test 1 makes
lateness impossible with a watermark longer than the data span; test 2
makes it impossible by feeding time-ordered files).  Outer emission is
verified by advancing the watermark past the data with sentinel rows and
checking every unmatched touch flushed null-padded.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from arthur_redshift_etl_spark.streaming.events import read_event_stream, run_to_memory
from arthur_redshift_etl_spark.streaming.joins import (
    attribution_join_stream,
    enrich_stream_static,
    interval_join_streams,
)
from arthur_redshift_etl_spark.workload import t as load_table

SF = "/root/testdata/sf0.001"
HORIZON = "30 minutes"


def _events(spark):
    return load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _batch_attribution(ev, how="inner"):
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("touch_event_id"),
        F.col("ts").alias("touch_ts"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("convert_event_id"),
        F.col("ts").alias("convert_ts"),
        F.col("value").alias("convert_value"),
    )
    cond = (
        (views.user_id == purch.p_user_id)
        & (purch.convert_ts >= views.touch_ts)
        & (purch.convert_ts <= views.touch_ts + F.expr(f"INTERVAL {HORIZON}"))
    )
    joined = views.join(purch, cond, "inner" if how == "inner" else "left")
    return joined.select(
        "user_id", "touch_event_id", "touch_ts",
        "convert_event_id", "convert_ts", "convert_value",
    )


def _rows(df):
    return {tuple("" if v is None else str(v) for v in r) for r in df.collect()}


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("join-stream"))
    _events(spark).repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_inner_attribution_matches_batch_across_microbatches(spark, stream_dir):
    # watermark longer than the 30-day data span: nothing is ever late or
    # evicted, so cross-micro-batch matches are exact regardless of file
    # order; maxFilesPerTrigger=1 forces the state store to carry matches
    # across batches instead of joining within one.
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    out = attribution_join_stream(
        stream, horizon=HORIZON, watermark="40 days", how="inner"
    )
    q = run_to_memory(out, "attr_inner_sink", "append")
    q.awaitTermination(180)
    got = spark.table("attr_inner_sink")
    expect = _batch_attribution(_events(spark), "inner")
    assert got.columns == expect.columns
    assert _rows(got) == _rows(expect)
    assert expect.count() > 0  # the oracle itself is non-trivial


@pytest.fixture(scope="module")
def ordered_stream_dir(spark, tmp_path_factory):
    """Time-ordered single-file chunks + two far-future watermark advancers.

    Files get strictly increasing mtimes so the file source (oldest-first)
    replays them in event-time order: no row is ever late, and the two
    sentinel batches at +100/+101 days push the watermark past every real
    row's outer-emission point (touch_ts + horizon + watermark delay).
    """
    d = str(tmp_path_factory.mktemp("join-stream-ordered"))
    stage = str(tmp_path_factory.mktemp("join-stream-stage"))
    ev = _events(spark)
    # quartile ts bounds give four non-overlapping time ranges (so replaying
    # the files oldest-first means event time only moves forward)
    bounds = ev.selectExpr(
        "percentile_approx(ts, array(0.25, 0.5, 0.75), 10000) AS b"
    ).collect()[0]["b"]
    lo = [None, *bounds]
    hi = [*bounds, None]
    mtime = 1_700_000_000
    for i in range(4):
        part = ev
        if lo[i] is not None:
            part = part.filter(F.col("ts") > F.lit(lo[i]))
        if hi[i] is not None:
            part = part.filter(F.col("ts") <= F.lit(hi[i]))
        cd = os.path.join(stage, f"c{i}")
        part.coalesce(1).write.mode("overwrite").parquet(cd)
        src = next(f for f in os.listdir(cd) if f.endswith(".parquet"))
        dst = os.path.join(d, f"chunk-{i:02d}.parquet")
        shutil.copyfile(os.path.join(cd, src), dst)
        os.utime(dst, (mtime + 10 * i, mtime + 10 * i))
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    for j, days in enumerate((100, 101)):
        adv = spark.createDataFrame(
            [
                (-(10 + j), -1, "view", 0.0),
                (-(20 + j), -2, "purchase", 0.0),
            ],
            "event_id long, user_id long, event_type string, value double",
        ).select(
            "event_id",
            (F.lit(max_ts) + F.expr(f"INTERVAL {days} days")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            F.lit(None).cast("string").alias("props"),
        )
        cd = os.path.join(stage, f"adv{j}")
        adv.coalesce(1).write.mode("overwrite").parquet(cd)
        src = next(f for f in os.listdir(cd) if f.endswith(".parquet"))
        dst = os.path.join(d, f"chunk-9{j}.parquet")
        shutil.copyfile(os.path.join(cd, src), dst)
        os.utime(dst, (mtime + 100 + 10 * j, mtime + 100 + 10 * j))
    return d


def test_left_outer_flushes_unmatched_touches(spark, ordered_stream_dir):
    stream = read_event_stream(spark, ordered_stream_dir, max_files_per_trigger=1)
    out = attribution_join_stream(
        stream, horizon=HORIZON, watermark="1 hour", how="leftOuter"
    )
    q = run_to_memory(out, "attr_outer_sink", "append")
    q.awaitTermination(240)
    got = spark.table("attr_outer_sink").filter("user_id >= 0")
    expect = _batch_attribution(_events(spark), "leftOuter")
    assert _rows(got) == _rows(expect)
    # the outer rows are genuinely present (some touches never convert)
    n_null = got.filter("convert_event_id IS NULL").count()
    assert n_null > 0
    assert n_null == expect.filter("convert_event_id IS NULL").count()


def test_enrich_stream_static_matches_batch(spark, stream_dir):
    ev = _events(spark)
    dim = (
        ev.select("user_id").distinct()
        .withColumn("tier", F.when(F.col("user_id") % 3 == 0, "gold").otherwise("std"))
    )
    stream = read_event_stream(spark, stream_dir)
    out = enrich_stream_static(stream.select("event_id", "user_id"), dim, "user_id")
    q = run_to_memory(out, "enrich_sink", "append")
    q.awaitTermination(120)
    got = spark.table("enrich_sink")
    expect = ev.select("event_id", "user_id").join(dim, "user_id", "left")
    assert _rows(got) == _rows(expect)


def test_join_state_survives_restart_exactly_once(spark, tmp_path):
    """Stop the join mid-stream, deliver more files, restart from the
    checkpoint: buffered left rows from before the stop must still match
    right rows arriving after it, and nothing may duplicate."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    # split at the conversion instant of a real matched pair, so at least
    # one touch is buffered before the stop and converts after the restart
    expect = _batch_attribution(_events(spark), "inner")
    pair = (
        expect.filter(F.col("convert_ts") > F.col("touch_ts"))
        .orderBy("convert_ts")
        .limit(1)
        .collect()
    )
    assert pair, "fixture data must contain a non-simultaneous match"
    split = pair[0].convert_ts
    first = _events(spark).filter(F.col("ts") < F.lit(split))
    second = _events(spark).filter(F.col("ts") >= F.lit(split))

    def deliver(df, name):
        stage = str(tmp_path / f"stage-{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        f = next(x for x in os.listdir(stage) if x.endswith(".parquet"))
        shutil.copyfile(os.path.join(stage, f), os.path.join(src, f"{name}.parquet"))

    def run_once():
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        joined = attribution_join_stream(
            stream, horizon=HORIZON, watermark="40 days", how="inner"
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    deliver(first, "first")
    run_once()  # buffers unmatched first-half touches in checkpointed state
    deliver(second, "second")
    run_once()  # restart: second-half conversions must match them

    got = spark.read.parquet(out)
    assert got.count() == expect.count()  # exactly-once: no dup emissions
    assert _rows(got) == _rows(expect)
    # cross-restart matches actually exist (a touch before the split
    # converting after it) — otherwise this test proves nothing
    cross = expect.filter(
        (F.col("touch_ts") < F.lit(split)) & (F.col("convert_ts") >= F.lit(split))
    ).count()
    assert cross > 0


def test_interval_join_validation(spark):
    df = spark.range(1).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts")
    )
    with pytest.raises(ValueError, match="must differ"):
        interval_join_streams(df, df, on="k", left_ts="ts", right_ts="ts")
    with pytest.raises(ValueError, match="how must be"):
        interval_join_streams(
            df, df.withColumnRenamed("ts", "ts2"), on="k",
            left_ts="ts", right_ts="ts2", how="leftSemi",
        )


def test_interval_join_prefixes_colliding_columns(spark, stream_dir):
    # both sides keep a 'value' column -> right one must come out prefixed
    stream = read_event_stream(spark, stream_dir)
    left = stream.filter("event_type = 'view'").select(
        "user_id", F.col("ts").alias("touch_ts"), "value"
    )
    right = stream.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("convert_ts"), "value"
    )
    out = interval_join_streams(
        left, right, on="user_id", left_ts="touch_ts", right_ts="convert_ts",
        watermark="40 days", upper=f"{HORIZON}",
    )
    assert out.columns == ["user_id", "touch_ts", "value", "convert_ts", "r_value"]


def test_right_outer_keeps_keys_of_unmatched_right_rows(spark, ordered_stream_dir):
    # ordered files + sentinel advancers let the watermark pass every real
    # conversion so unmatched right rows actually flush (same mechanics as
    # the leftOuter test)
    stream = read_event_stream(spark, ordered_stream_dir, max_files_per_trigger=1)
    out = attribution_join_stream(
        stream, horizon=HORIZON, watermark="1 hour", how="rightOuter"
    )
    q = run_to_memory(out, "attr_router_sink", "append")
    q.awaitTermination(240)
    got = spark.table("attr_router_sink").filter(
        "user_id >= 0 OR user_id IS NULL"
    )
    # the key-coalesce fix: every conversion row carries its user_id even
    # when no touch matched (pre-fix: unmatched rows had user_id NULL)
    assert got.filter("user_id IS NULL").count() == 0
    got = got.filter("user_id >= 0")
    unmatched = got.filter("touch_event_id IS NULL")
    assert unmatched.count() > 0
    matched_converts = (
        _batch_attribution(_events(spark), "inner")
        .select("convert_event_id").distinct()
    )
    all_converts = (
        _events(spark).filter("event_type = 'purchase'")
        .select(F.col("event_id").alias("convert_event_id"))
    )
    expect_n = all_converts.join(
        matched_converts, "convert_event_id", "left_anti"
    ).count()
    assert unmatched.count() == expect_n


def test_right_ts_colliding_with_left_column_rejected(spark):
    left = spark.range(1).select(
        F.col("id").alias("k"),
        F.current_timestamp().alias("l_ts"),
        F.current_timestamp().alias("r_ts"),  # collides with right's ts name
    )
    right = spark.range(1).select(
        F.col("id").alias("k"), F.current_timestamp().alias("r_ts")
    )
    with pytest.raises(ValueError, match="also names a left column"):
        interval_join_streams(left, right, on="k", left_ts="l_ts", right_ts="r_ts")
