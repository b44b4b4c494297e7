"""Physical-layout gates: partition pruning reaches the file listing,
bucketed joins run without a shuffle, and format round-trips (json/orc)
preserve data — the 100 TB layout levers, verified on plans not vibes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.sources.layout import (
    add_date_partition,
    bucketed_join,
    write_bucketed,
    write_partitioned,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.sources.tables import (
    read_parquet_table,
)

from .conftest import SF_SMALL


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_partition_pruning(spark, tmp_path):
    events = read_parquet_table(spark, SF_SMALL, "events")
    path = str(tmp_path / "events_by_date")
    write_partitioned(add_date_partition(events, "ts"), path, ["event_date"])

    df = (spark.read.parquet(path)
          .where(F.col("event_date") == "2024-01-05")
          .select("event_id", "value"))
    plan = _explain(df)
    assert "PartitionFilters" in plan
    assert "2024-01-05" in plan.split("PartitionFilters")[1].splitlines()[0]
    # correctness of the pruned read
    want = events.where(F.to_date("ts") == "2024-01-05").count()
    assert df.count() == want


def test_bucketed_join_no_shuffle(spark, tmp_path):
    import shutil

    for t in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/cw_spark_warehouse/{t}", ignore_errors=True)
    orders = read_parquet_table(spark, SF_SMALL, "orders")
    customer = read_parquet_table(spark, SF_SMALL, "customer")
    write_bucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
                   "orders_b", ["o_custkey"], num_buckets=8,
                   sort_cols=["o_custkey"])
    write_bucketed(customer.select(F.col("c_custkey").alias("o_custkey"),
                                   "c_mktsegment"),
                   "customer_b", ["o_custkey"], num_buckets=8,
                   sort_cols=["o_custkey"])
    joined = bucketed_join(spark, "orders_b", "customer_b", ["o_custkey"])
    plan = _explain(joined)
    assert "Exchange" not in plan  # co-located: no shuffle on either side
    assert joined.count() == orders.join(
        customer, orders.o_custkey == customer.c_custkey).count()
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_json_orc_roundtrip(spark, tmp_path):
    docs = read_parquet_table(spark, SF_SMALL, "documents").limit(50)
    jpath, opath = str(tmp_path / "docs_json"), str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").json(jpath)
    docs.write.mode("overwrite").orc(opath)
    jread = spark.read.schema(docs.schema).json(jpath)
    oread = spark.read.orc(opath)
    key = lambda rows: sorted((r.doc_id, r.text) for r in rows)  # noqa: E731
    want = key(docs.collect())
    assert key(jread.collect()) == want
    assert key(oread.collect()) == want
