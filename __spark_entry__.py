"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator catalog from
``arthur_redshift_etl_spark.workload`` (one entry per implemented operator
from SURVEY.md §2 plus the scale-pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arthur_redshift_etl_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.revenue_by_nation(spark, "/root/testdata/sf0.001")


# Entries that already have a green driver-oracle row in CORRECTNESS_r01.json.
# The round-1 driver sampled only the first 50 catalog entries, so round 2
# orders the catalog with previously-unsampled entries FIRST to rotate
# driver-grade verification across the whole catalog (VERDICT.md item 1).
_R01_VERIFIED = frozenset({
    "q01_pricing_summary", "revenue_by_nation", "q03_top_orders",
    "q04_order_priority", "q05_region_nation_revenue", "q06_forecast_revenue",
    "q10_returned_items", "q14_promo_revenue", "top_customers_window",
    "segment_nation_rollup", "customer_segment_stats",
    "orders_no_early_lineitems", "nation_setop_except",
    "nation_setop_intersect", "constraint_dup_orderkeys",
    "constraint_pk_lineitem", "dim_customer", "extract_orders_sample",
    "hourly_event_rollup", "event_sessions", "events_json_stats",
    "text_token_stats", "text_top_tokens", "text_quality",
    "text_lang_profile_classify", "dedup_exact_prefix", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "knn_bruteforce",
    "ann_ivf_buckets", "ann_ivf_search", "embedding_cosine_dedup",
    "q07_volume_shipping", "q11_important_stock", "q12_shipmode_priority",
    "q13_customer_distribution", "q17_small_quantity_revenue",
    "q18_large_orders", "q19_disjunctive_predicates",
    "q22_global_sales_opportunity", "five_min_rollup",
    "events_asof_last_purchase", "ann_lsh_search", "text_bpe_token_count",
    "median_quantity_by_flag", "approx_distinct_customers",
    "q15_top_suppliers", "cube_status_priority", "cumulative_customer_revenue",
})


def _rotated(mapping: dict) -> dict:
    unverified = {k: v for k, v in mapping.items() if k not in _R01_VERIFIED}
    verified = {k: v for k, v in mapping.items() if k in _R01_VERIFIED}
    return {**unverified, **verified}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(workload.queries())


def oracle_sql() -> dict[str, str]:
    return _rotated(workload.oracles())
