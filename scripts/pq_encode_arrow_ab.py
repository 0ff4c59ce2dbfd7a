"""PQ encode: expression form vs Arrow/numpy form at enlarged scale.

VERDICT r13 #4: the bench-scale embeddings corpus (2000 rows at sf0.1) is
below the Arrow stage's break-even, so the honest A/B runs on an enlarged
corpus (SPARK_GRAFT_PQ_COPIES id-shifted copies, default 320 -> ~640k
rows; the pq_throughput_ab pattern).  Per variant: noop-sink walls (guide
§1.4), best-of-REPS after a codegen warm pass; then a full multiset parity
check (groupBy over every output column — any code diverging anywhere
changes a group count).

Run ALONE:
    PYTHONPATH=/root/repo python scripts/pq_encode_arrow_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arthur_redshift_etl_spark import workload  # noqa: E402
from arthur_redshift_etl_spark.operators import quantization as qz  # noqa: E402
from arthur_redshift_etl_spark.session import build_session  # noqa: E402

COPIES = int(os.environ.get("SPARK_GRAFT_PQ_COPIES", "320"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "5"))
M, SUB, K = workload.PQ_M, workload.PQ_SUB, workload.PQ_K


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = build_session(
        app_name="pq-encode-arrow-ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    work = tempfile.mkdtemp(prefix="pq_arrow_ab_")
    emb = workload.t(spark, SF_DIR, "embeddings")
    base_n = emb.count()
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * base_n).alias("vec_id"), "embedding"
    )
    raw_dir = os.path.join(work, "vectors")
    big.write.mode("overwrite").parquet(raw_dir)
    vectors = spark.read.parquet(raw_dir)
    n = vectors.count()
    codebooks = {
        r["vec_id"]: qz.micro_list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < K).collect()
    }

    variants = {
        "expr": lambda: qz.pq_encode_expr(vectors, codebooks, M, SUB),
        "arrow": lambda: qz.pq_encode_arrow(vectors, codebooks, M, SUB),
    }
    out = {"n_vectors": n, "copies": COPIES, "sf_dir": SF_DIR, "walls": {}}
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"pq encode {name}")
        noop(fn())  # codegen / worker warm
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            noop(fn())
            walls.append(round(time.perf_counter() - t0, 3))
        out["walls"][name] = walls
        print(f"# {name}: {walls}", file=sys.stderr, flush=True)
    spark.sparkContext.setJobDescription(None)

    # parity: group-count over the full code tuple — multiset equality
    ge = variants["expr"]()
    ga = variants["arrow"]()
    # exceptAll both ways = exact multiset equality: a code diverging for
    # any vector leaves a residue on at least one side
    n_diff = ge.exceptAll(ga).count() + ga.exceptAll(ge).count()
    out["parity_exact"] = n_diff == 0
    out["n_mismatched_groups"] = n_diff
    out["best"] = {k: min(v) for k, v in out["walls"].items()}
    out["speedup_arrow_vs_expr"] = round(
        out["best"]["expr"] / out["best"]["arrow"], 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
