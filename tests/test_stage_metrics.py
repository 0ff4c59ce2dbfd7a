"""stage_totals: app-wide spill/shuffle telemetry off the live status store.

The helper behind scripts/memory_stress.py's spill-not-OOM A/B.  The
spill counters themselves are exercised by the script (forcing a spill
needs a constrained fresh JVM); here we pin the py4j plumbing — the
5-arg stageList signature drifts across Spark versions — and the
diff-around-an-action contract.
"""

from arthur_redshift_etl_spark.plans.metrics import stage_totals


def test_stage_totals_diff_attributes_a_shuffle(spark):
    base = stage_totals(spark)
    df = spark.range(0, 200_000).selectExpr("id % 1000 AS k", "id AS v")
    assert df.groupBy("k").count().count() == 1000
    after = stage_totals(spark)
    # the groupBy ran at least a map and a reduce stage and moved bytes
    assert after["stages"] >= base["stages"] + 2
    assert after["shuffle_write_bytes"] > base["shuffle_write_bytes"]
    assert after["executor_run_ms"] >= base["executor_run_ms"]
    # counters are cumulative: nothing ever decreases
    for key, val in base.items():
        assert after[key] >= val, key
    # spill keys present (zero on an unconstrained session)
    assert "memory_spilled_bytes" in after and "disk_spilled_bytes" in after
