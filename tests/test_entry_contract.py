"""Driver-contract regression: __spark_entry__ loaded by file path from a
foreign cwd, with the SparkSession created BEFORE the import.

This is the round driver's worst-case ordering: executor Python workers
inherit neither the repo cwd nor any PYTHONPATH set at import time, so any
mapInPandas closure that references a package module by import-name dies
with ModuleNotFoundError on the workers.  The fix under test is by-value
cloudpickle registration (multimodal.py / avro_io.py); pytest running from
the repo cwd can NEVER catch this in-process, hence the subprocess.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent(
    """
    # session FIRST: PYTHONPATH propagation from the entry module cannot
    # help the workers; only by-value pickling can
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master('local[2]')
             .config('spark.sql.shuffle.partitions', '2')
             .config('spark.ui.enabled', 'false').getOrCreate())
    spark.sparkContext.setLogLevel('ERROR')
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        '__spark_entry__', {entry_path!r})
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    n = qs['multimodal_real_decode'](spark, '/root/testdata/sf0.001').count()
    assert n == 200, n
    print('ENTRY_CONTRACT_OK')
    """
)


def test_entry_importable_from_foreign_cwd_with_preexisting_session():
    env = {
        k: v
        for k, v in os.environ.items()
        # simulate a driver env that never saw the repo
        if k != "PYTHONPATH"
    }
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(entry_path=os.path.join(REPO, "__spark_entry__.py"))],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ENTRY_CONTRACT_OK" in proc.stdout


def test_rotation_front_block_fits_driver_sample():
    """The driver samples the FIRST 50 catalog entries per round; the
    rotation puts never-driver-sampled entries first.  If more than 50
    entries lack driver evidence, some would stay unsampled ANOTHER
    round — fail here so the catalog keeps full driver-grade coverage
    within one rotation."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry_rot__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from arthur_redshift_etl_spark.workload import REGISTRY

    unverified = [k for k in REGISTRY if k not in mod._DRIVER_VERIFIED]
    assert len(unverified) <= 50, (
        f"{len(unverified)} entries lack a driver row; the next driver "
        f"sample holds 50 — trim additions or accept a second rotation: "
        f"{unverified}"
    )
