"""Persist lifecycle gates (VERDICT r6 #3): operators that persist
intermediates route through operators/cache.scoped_persist, callers
release via release_persisted(), and a sequence of registry entries
leaves the CacheManager empty — the long-lived-session leak the r6
bench tail surfaced (`Asked to cache already cached data` + unbounded
block growth)."""

from __future__ import annotations

from pyspark.sql import functions as F

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.cache import (
    cached_plan_count,
    release_persisted,
    scoped_persist,
)

from .conftest import SF_SMALL


def test_scoped_persist_is_idempotent_and_released(spark):
    """Re-persisting the same (canonicalized) plan is a no-op — the
    CacheManager lookup short-circuits, so steady-state bench passes
    stop emitting already-cached warnings — and release empties the
    manager."""
    release_persisted()
    base = cached_plan_count(spark)
    df1 = spark.range(100).select((F.col("id") * 3).alias("x"))
    p1 = scoped_persist(df1)
    p1.count()
    assert cached_plan_count(spark) == base + 1
    # same plan, new object: must NOT double-cache
    df2 = spark.range(100).select((F.col("id") * 3).alias("x"))
    p2 = scoped_persist(df2)
    p2.count()
    assert cached_plan_count(spark) == base + 1
    assert release_persisted() >= 1
    assert cached_plan_count(spark) == base


def test_registry_persisting_entries_leave_no_cache(spark):
    """Run the registry entries whose operators scoped_persist
    intermediates (LSH band cap, PPJoin toksets, prefix-sum packing,
    tf-idf / DSIR censuses), consume each fully, release — the
    CacheManager must end empty (the check_correctness.py / bench.py
    boundary, asserted in-repo)."""
    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (
        REGISTRY,
    )

    release_persisted()
    base = cached_plan_count(spark)
    for name in ("dedup_minhash_lsh", "dedup_token_jaccard",
                 "corpus_seq_pack", "text_tfidf_topk",
                 "corpus_dsir_weights"):
        REGISTRY[name].fn(spark, SF_SMALL).collect()
        release_persisted()
        assert cached_plan_count(spark) == base, name


def test_engine_release_surface(spark):
    """Engine.release() is the user-facing boundary for Engine.query
    consumers."""
    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.engine import (
        Engine,
    )

    release_persisted()
    eng = Engine(sf_dir=SF_SMALL, spark=spark)
    base = cached_plan_count(spark)
    eng.query("dedup_token_jaccard").collect()
    assert eng.release() >= 1
    assert cached_plan_count(spark) == base
