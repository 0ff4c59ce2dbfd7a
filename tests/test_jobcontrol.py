"""Round-5 CLI verbs: terminate_builds (job-group cancel), list_tags,
create_external_schemas, run_sql_template — reference commands.py parity
(TerminateSessionsCommand, ListTagsCommand, CreateExternalSchemasCommand,
RunSqlCommand)."""

import os
import threading
import time

from arthur_redshift_etl_spark.cli import main
from arthur_redshift_etl_spark.config import WarehouseConfig, get_tags
from arthur_redshift_etl_spark.jobcontrol import (
    BuildGroup,
    is_cancellation,
    list_builds,
    request_cancel,
)


def test_build_group_cancel_interrupts_inflight_job(spark, tmp_path):
    repo = str(tmp_path)
    result = {}

    def slow_build():
        with BuildGroup(spark, repo, group="g1", poll_seconds=0.05) as bg:
            try:
                # ~1e12 rows across 8 fat partitions: minutes of work if
                # the cancel does not interrupt the running tasks
                spark.range(0, 1 << 40, 1, 8).selectExpr(
                    "sum(id * id) AS s"
                ).collect()
                result["finished"] = True
            except Exception as exc:
                result["exc"] = exc
                result["bg_cancelled"] = bg.cancelled

    th = threading.Thread(target=slow_build)
    t0 = time.monotonic()
    th.start()
    deadline = t0 + 30
    while not list_builds(repo) and time.monotonic() < deadline:
        time.sleep(0.05)
    builds = list_builds(repo)
    assert builds and builds[0]["group"] == "g1" and builds[0]["alive"]
    # wait until the slow job is actually submitted so the cancel exercises
    # the interrupt-in-flight path, not just the pre-submission race (the
    # watcher re-cancels each poll, so either way the build must die)
    tracker = spark.sparkContext.statusTracker()
    while not tracker.getActiveJobsIds() and time.monotonic() < deadline:
        time.sleep(0.05)

    assert request_cancel(repo, "g1") is True
    th.join(timeout=60)
    assert not th.is_alive(), "cancel did not interrupt the running job"
    assert "finished" not in result
    assert result["bg_cancelled"] is True
    assert is_cancellation(result["exc"])
    # ADVICE r6: pin Spark's actual scheduler phrasing on the pinned
    # version — an ACTUALLY-cancelled job's exception must match the
    # group-qualified needle too (a Spark message-format change across
    # upgrades would silently downgrade operator cancels to generic
    # failures; this assertion is the tripwire)
    assert is_cancellation(result["exc"], group="g1")
    assert "part of cancelled job group g1" in str(result["exc"])
    # registration + marker cleaned up on exit
    assert list_builds(repo) == []
    # the session stays usable for the next build
    assert spark.range(3).count() == 3


def test_request_cancel_unknown_group(tmp_path):
    assert request_cancel(str(tmp_path), "nope") is False


def test_terminate_builds_cli_listing_and_errors(tmp_path, capsys):
    repo = str(tmp_path)
    assert main(["--repo", repo, "terminate_builds"]) == 0
    assert "no registered builds" in capsys.readouterr().out
    assert main(["--repo", repo, "terminate_builds", "ghost"]) == 1
    assert "no such build" in capsys.readouterr().err


def _write_config(repo, text):
    os.makedirs(repo, exist_ok=True)
    with open(os.path.join(repo, "config.yaml"), "w") as fh:
        fh.write(text)


def test_list_tags_cli(tmp_path, capsys):
    repo = str(tmp_path)
    _write_config(
        repo,
        """
schemas:
  - name: src
    read_access: SRC_DSN
    tags: [sources, nightly]
  - name: dw
    tags: [nightly, marts]
  - name: bare
""",
    )
    cfg = WarehouseConfig.load(os.path.join(repo, "config.yaml"))
    assert get_tags(cfg) == ["marts", "nightly", "sources"]
    assert main(["--repo", repo, "list_tags"]) == 0
    out = capsys.readouterr().out
    assert "'marts', 'nightly', 'sources'" in out

    _write_config(repo, "schemas:\n  - name: only\n")
    assert main(["--repo", repo, "list_tags"]) == 0
    assert "No tags found" in capsys.readouterr().out


def test_external_schema_classification():
    cfg = WarehouseConfig.from_dict(
        {
            "schemas": [
                {"name": "lake", "external": True, "s3_path": "/data/lake"},
                {"name": "static", "s3_path": "/data/static"},
            ]
        }
    )
    lake, static = cfg.schemas
    assert lake.kind == "external" and not lake.is_static_source
    assert static.kind == "static_source"
    assert [s.name for s in cfg.external_schemas] == ["lake"]


def test_create_external_schemas_cli_e2e(spark, tmp_path, capsys):
    repo = str(tmp_path / "repo")
    base = str(tmp_path / "lakehouse")
    for tname, n in (("t1", 4), ("t2", 7)):
        spark.range(n).write.parquet(os.path.join(base, tname))
    _write_config(
        repo,
        f"""
schemas:
  - name: extlake
    external: true
    s3_path: {base}
""",
    )
    assert main(["--repo", repo, "create_external_schemas"]) == 0
    out = capsys.readouterr().out
    assert "attached extlake.t1" in out and "attached extlake.t2" in out
    assert spark.table("extlake.t2").count() == 7
    spark.sql("DROP DATABASE extlake CASCADE")

    # pattern that matches nothing external is a usage error
    assert main(["--repo", repo, "create_external_schemas", "nope*"]) == 2
    assert "not external" in capsys.readouterr().err

    # missing location is a config error
    _write_config(repo, "schemas:\n  - name: noloc\n    external: true\n")
    assert main(["--repo", repo, "create_external_schemas"]) == 1
    assert "no s3_path" in capsys.readouterr().err


def test_run_sql_template_cli_e2e(spark, tmp_path, capsys):
    repo = str(tmp_path / "repo")
    data = str(tmp_path / "data")
    spark.range(5).selectExpr("id AS k", "id * 10 AS v").write.parquet(
        os.path.join(data, "facts")
    )
    os.makedirs(os.path.join(repo, "templates"), exist_ok=True)
    # substitution + a Redshift-dialect function the shim must rewrite
    with open(os.path.join(repo, "templates", "fact_summary.sql"), "w") as fh:
        fh.write(
            "SELECT COUNT(*) AS n, NVL(SUM(v), 0) AS total\n"
            "FROM parquet.`${settings.data_dir}/facts`\n"
        )
    _write_config(repo, f"settings:\n  data_dir: {data}\n")

    assert main(["--repo", repo, "run_sql_template", "--list"]) == 0
    assert "fact_summary.sql" in capsys.readouterr().out

    assert main(["--repo", repo, "run_sql_template", "fact_summary"]) == 0
    out = capsys.readouterr().out
    assert "Running template: 'fact_summary'" in out
    assert "100" in out  # sum(0..4)*10

    assert main(["--repo", repo, "run_sql_template", "missing"]) == 1
    assert "no such SQL template" in capsys.readouterr().err


def test_create_external_schemas_single_file_tables(spark, tmp_path, capsys):
    # a lake laid out as single parquet FILES (name.parquet) attaches with
    # the file stem as the table name — found by driving the CLI against
    # the real testdata directory layout
    repo = str(tmp_path / "repo")
    base = str(tmp_path / "filelake")
    os.makedirs(base, exist_ok=True)
    spark.range(6).coalesce(1).write.parquet(os.path.join(base, "_tmpdir"))
    import glob
    import shutil

    part = glob.glob(os.path.join(base, "_tmpdir", "*.parquet"))[0]
    shutil.move(part, os.path.join(base, "dim6.parquet"))
    shutil.rmtree(os.path.join(base, "_tmpdir"))
    _write_config(
        repo,
        f"""
schemas:
  - name: filelake
    external: true
    s3_path: {base}
""",
    )
    assert main(["--repo", repo, "create_external_schemas"]) == 0
    assert "attached filelake.dim6" in capsys.readouterr().out
    assert spark.table("filelake.dim6").count() == 6
    spark.sql("DROP DATABASE filelake CASCADE")


def test_update_refresh_partitions_cli_e2e(spark, tmp_path, capsys):
    """CLI wiring for the partition-scoped refresh: load a partitioned
    CTAS through the CLI, then update --refresh-partitions re-runs one
    month's slice and reports the audit."""
    import json as _json

    from arthur_redshift_etl_spark.repo import write_design

    repo = str(tmp_path / "repo")
    os.makedirs(os.path.join(repo, "data", "psrc", "orders"), exist_ok=True)
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    ).write.mode("overwrite").parquet(
        os.path.join(repo, "data", "psrc", "orders")
    )
    write_design(
        repo,
        {
            "name": "psrc.orders",
            "source_name": "up.public.orders",
            "columns": [
                {"name": "o_orderkey", "type": "long", "not_null": True},
                {"name": "o_totalprice", "type": "double"},
                {"name": "o_orderdate", "type": "date"},
            ],
        },
    )
    write_design(
        repo,
        {
            "name": "pdw.monthly",
            "source_name": "CTAS",
            "columns": [
                {"name": "o_orderkey", "type": "long"},
                {"name": "o_totalprice", "type": "double"},
                {"name": "order_month", "type": "string"},
            ],
            "depends_on": ["psrc.orders"],
            "attributes": {"partition_by": ["order_month"]},
        },
        query=(
            "SELECT o_orderkey, o_totalprice, "
            "date_format(o_orderdate, 'yyyy-MM') AS order_month "
            "FROM psrc.orders"
        ),
    )
    assert main(["--repo", repo, "load"]) == 0
    capsys.readouterr()
    month = spark.table("pdw.monthly").first()["order_month"]
    assert (
        main(
            [
                "--repo",
                repo,
                "update",
                "pdw.monthly",
                "--refresh-partitions",
                f"order_month = '{month}'",
            ]
        )
        == 0
    )
    audit = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["relation"] == "pdw.monthly"
    assert audit["n_partitions"] == 1 and audit["partitions"] == [[month]]
    assert audit["n_rows"] > 0

    # GATE: a predicate over a DATA column must be rejected outright —
    # under dynamic partition overwrite it would replace every touched
    # partition with only the matching rows, silently deleting the rest.
    import pytest

    from arthur_redshift_etl_spark.errors import ETLRuntimeError

    before = spark.table("pdw.monthly").count()
    with pytest.raises(ETLRuntimeError, match="non-partition column"):
        main(
            [
                "--repo",
                repo,
                "update",
                "pdw.monthly",
                "--refresh-partitions",
                "o_totalprice > 100",
            ]
        )
    # mixed predicate (partition AND data column) is rejected too
    with pytest.raises(ETLRuntimeError, match="o_totalprice"):
        main(
            [
                "--repo",
                repo,
                "update",
                "pdw.monthly",
                "--refresh-partitions",
                f"order_month = '{month}' AND o_totalprice > 100",
            ]
        )
    assert spark.table("pdw.monthly").count() == before, (
        "rejected refresh must leave the table untouched"
    )
    for db in ("psrc", "pdw"):
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        spark.sql(f"DROP DATABASE IF EXISTS {db}__backup CASCADE")


def test_build_group_clears_stale_cancel_marker(spark, tmp_path):
    """A cancel marker left behind by a SIGKILLed build (or a
    request_cancel racing exit cleanup) must not instantly cancel the next
    build that reuses the job-group name."""
    from arthur_redshift_etl_spark.jobcontrol import _cancel_path

    repo = str(tmp_path)
    os.makedirs(os.path.join(repo, "builds"), exist_ok=True)
    with open(_cancel_path(repo, "gstale"), "w") as fh:
        fh.write("{}")
    with BuildGroup(spark, repo, group="gstale", poll_seconds=0.02) as bg:
        # give the watcher several polls to (wrongly) pick up a marker
        time.sleep(0.2)
        total = spark.range(100).selectExpr("sum(id) AS s").collect()[0]["s"]
    assert total == 4950
    assert bg.cancelled is False
    assert not os.path.exists(_cancel_path(repo, "gstale"))


def test_is_cancellation_signature_matching():
    """Only Spark's real job-group-cancellation signatures match — a
    failure whose text merely contains 'cancelled' (stage chatter, error
    text echoing data) must not be reported as an operator cancel."""
    assert not is_cancellation(Exception("column 'status' = 'cancelled'"))
    assert not is_cancellation(
        Exception("Broadcast exchange cancelled due to OOM")
    )
    real = Exception(
        "Job 7 cancelled part of cancelled job group build-42-123"
    )
    assert is_cancellation(real)
    assert is_cancellation(real, "build-42-123")
    # a different group's cancellation text (e.g. quoted inside an
    # analysis error) is not THIS build's cancel
    assert not is_cancellation(real, "build-99-456")
    assert is_cancellation(Exception("SparkJobCancelled: job 3"))
    assert is_cancellation(Exception("[SPARK_JOB_CANCELLED] job 3"))


def test_disk_usage_cli_reports_tables_and_backup_flags(spark, tmp_path, capsys):
    """disk_usage (reference templates/sql/disk_usage.sql analog): lake
    storage per production table with backup/staging presence flags."""
    import json as _json

    from arthur_redshift_etl_spark.loader import LoadContext, load_warehouse
    from arthur_redshift_etl_spark.monitor import EventStore
    from arthur_redshift_etl_spark.bootstrap import bootstrap_source_design
    from arthur_redshift_etl_spark.relations import Relation

    d = str(tmp_path / "data" / "dusrc.nation")
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").write.mode(
        "overwrite"
    ).parquet(d)
    design = bootstrap_source_design(
        spark.read.parquet(d), "dusrc.nation", "up.public.nation"
    )
    rel = Relation(design=design, data_location=d)
    lake = str(tmp_path / "lake")
    # two loads -> second publish leaves a backup database behind
    load_warehouse(
        LoadContext(spark=spark, data_root=lake, store=EventStore()), [rel]
    )
    load_warehouse(
        LoadContext(spark=spark, data_root=lake, store=EventStore()),
        [Relation(design=design, data_location=d)],
    )
    assert main(["--repo", str(tmp_path), "disk_usage", "dusrc.*"]) == 0
    lines = [
        _json.loads(x)
        for x in capsys.readouterr().out.strip().splitlines()
        if x.startswith("{")
    ]
    row = next(r for r in lines if r["schema"] == "dusrc" and r["table"] == "nation")
    assert row["n_files"] > 0 and row["storage_mb"] > 0
    assert row["has_backup"] is True
    assert row["has_staging"] is False
    for db in ("dusrc", "etl_backup__dusrc", "etl_staging__dusrc"):
        spark.sql(f"DROP DATABASE IF EXISTS `{db}` CASCADE")
