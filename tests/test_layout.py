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


def _files_touched(path, col, lo, hi):
    """Files whose parquet row-group min/max stats for `col` intersect
    [lo, hi] — what a stat-pruning reader would actually open."""
    import glob
    import pyarrow.parquet as pq

    touched = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(col)
        hit = False
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            if st is None or st.min <= hi and st.max >= lo:
                hit = True
                break
        touched += hit
    return touched


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """write_zordered clusters files on BOTH columns: a selective
    range on y alone skips most files, where the x-sorted layout must
    open every file (each one spans the full y range); x stays
    prunable too.  Morton mapping itself is oracle-checked via the
    layout_zorder_keys registry entry — this asserts the physical
    file-stat effect."""
    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.sources.layout import (
        write_zordered,
    )

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"))
    zpath, spath = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    write_zordered(grid, zpath, "x", "y", num_files=16)
    (grid.repartitionByRange(16, "x").sortWithinPartitions("x")
     .write.mode("overwrite").parquet(spath))

    # y-only box: x-sorted layout cannot prune at all
    assert _files_touched(spath, "y", 0, 7) == 16
    assert _files_touched(zpath, "y", 0, 7) <= 8
    # x-only box: z-order still prunes (not as tightly as pure x-sort)
    assert _files_touched(zpath, "x", 0, 7) <= 8
    # and nothing was lost
    import duckdb
    assert duckdb.sql(
        f"SELECT count(*) FROM '{zpath}/part-*.parquet'").fetchone()[0] == 64 * 64


def test_compact_files_preserves_rows_and_reduces_files(spark, tmp_path):
    """64 tiny files -> a handful of balanced ones; rows and values
    survive bit-exact, the old dir is gone, tmp dirs cleaned up."""
    import glob

    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.sources.layout import (
        compact_files,
    )

    path = str(tmp_path / "frag")
    spark.range(0, 10000).selectExpr("id", "id * 2 as v") \
        .repartition(64).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*.parquet")) == 64
    before = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())

    n = compact_files(spark, path, target_file_bytes=64 * 1024)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == n < 64
    after = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert after == before
    import os
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")


def test_bench_steal_sampling_contract():
    """bench.py's host-contention self-annotation (VERDICT r7 #5): the
    /proc/stat sampler returns monotone (total, steal) jiffies and the
    derived steal%% is bounded — the fields future rounds read to tell
    co-tenant inflation from real regressions (BASELINE.md solo
    floors)."""
    import importlib.util
    import os
    import time

    spec = importlib.util.spec_from_file_location(
        "bench_mod",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    a = bench._cpu_times()
    assert a is not None and a[0] > 0 and a[1] >= 0
    time.sleep(0.05)
    b = bench._cpu_times()
    assert b[0] >= a[0] and b[1] >= a[1]
    pct = bench._steal_pct(a, b)
    assert pct is None or 0.0 <= pct <= 100.0
    # degenerate inputs: missing /proc/stat (None) and zero elapsed
    assert bench._steal_pct(None, b) is None
    assert bench._steal_pct(a, a) == 0.0
