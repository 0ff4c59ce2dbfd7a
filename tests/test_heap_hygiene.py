"""Heap-headroom hygiene: the between-builds GC that keeps long rebuild
sessions from dying in broadcast builds (plans/heap.py; measured evidence
in scripts/memory_stress.py — at 512 MB heap the heavy-query sequence
fails on query 3 without it and passes 10/10 with it).
"""

from arthur_redshift_etl_spark.plans.heap import (
    ensure_heap_headroom,
    heap_report,
)


def test_heap_report_shape_and_sanity(spark):
    rep = heap_report(spark)
    assert set(rep) == {"max", "committed", "used", "potential_free"}
    assert 0 < rep["used"] <= rep["committed"] <= rep["max"]
    assert rep["potential_free"] == rep["max"] - rep["used"]


def test_noop_when_headroom_ample(spark):
    # the 4 GB test session always has > 1 byte of potential free heap
    assert ensure_heap_headroom(spark, min_free_bytes=1) is False


def test_gc_fires_when_floor_unreachable(spark):
    # a floor above max heap is never satisfiable -> the GC branch runs
    rep = heap_report(spark)
    assert ensure_heap_headroom(spark, min_free_bytes=rep["max"] * 2) is True


def test_loader_wires_hygiene_between_transforms():
    # the integration point is the sequential transform loop — pin that the
    # loader module calls the helper (the 512 MB e2e lives in the script)
    import inspect

    from arthur_redshift_etl_spark import loader

    src = inspect.getsource(loader._build_all)
    assert "ensure_heap_headroom" in src
