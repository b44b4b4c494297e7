"""File sources & sinks (SURVEY.md §2.1 S3/S4, §2.2 K3).

The reference reads CSVs with pandas dtype inference and *positional*
column mapping — its lookup CSV header carries a UTF-8 BOM and a
case-mismatched column name, and the load works only because insertion
is positional (reference codes/us_cities.csv:1, codes/
weather_etl_pipeline.py:132-141; SURVEY.md §1.3). ``read_csv_positional``
reproduces that rename-by-position semantic safely: explicit schema (no
inference in prod) + header skipped + canonical names applied by
position.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_positional(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """CSV scan with positional rename onto ``schema``'s names/types.

    BOM/odd-case headers in the file are irrelevant: the header row is
    skipped and columns bind by position, exactly the semantics of the
    reference's itertuples positional INSERT (weather_etl_pipeline.py:138).
    """
    anon = T.StructType(
        [T.StructField(f"_c{i}", f.dataType, True) for i, f in enumerate(schema.fields)]
    )
    df = spark.read.option("header", str(header).lower()).schema(anon).csv(path)
    return df.toDF(*[f.name for f in schema.fields])


def write_orc(df: DataFrame, out_path: str,
              partition_by: list[str] | None = None) -> str:
    """ORC sink (columnar alternative the Spark distribution ships
    natively — no external jar): same partitioned-directory layout
    contract as the parquet sink, so a lake can interoperate with
    ORC-first warehouses (Hive/Trino). Predicate pushdown and column
    pruning work through Spark's native ORC reader exactly as for
    parquet."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(out_path)
    return out_path


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan through the native vectorized reader (pushdown +
    pruning verified in tests/test_sources.py)."""
    return spark.read.orc(path)


def read_jsonl(spark: SparkSession, path: str, schema=None,
               corrupt_col: str = "_corrupt_record") -> DataFrame:
    """JSON-lines scan in PERMISSIVE mode: malformed lines land in
    ``corrupt_col`` instead of failing the job — the tolerant-ingest
    contract for web-scraped corpora (a 100 TB crawl always contains
    broken records; FAILFAST would kill the job on the first one).

    With an explicit ``schema`` the scan skips the inference pass
    (inference reads the data TWICE — never acceptable at scale);
    schemaless calls are for interactive exploration only.
    """
    reader = (spark.read
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", corrupt_col))
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if corrupt_col not in schema.fieldNames():
            schema = schema.add(corrupt_col, T.StringType())
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, out_dir: str,
                compression: str | None = None) -> str:
    """Partitioned JSON-lines sink (one file per partition — the
    scale-correct layout; no coalesce funnel)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(out_dir)
    return out_dir


def write_single_csv(df: DataFrame, out_path: str, header: bool = True) -> str:
    """Write ``df`` as exactly ONE csv object at ``out_path``.

    The reference emits a single S3 object (353 B — SURVEY.md §2.2 K3);
    Spark writes directories, so this coalesces to one partition and
    renames the part file. Deliberately a *small-output* tool: at 100 TB
    the engine's canonical sink is partitioned parquet
    (``df.write.partitionBy(...).parquet``); ``coalesce(1)`` funnels all
    data through one task and must never appear in a large-scale plan.
    """
    tmp_dir = out_path + "._spark_tmp"
    (df.coalesce(1)
       .write.mode("overwrite")
       .option("header", str(header).lower())
       .csv(tmp_dir))
    part = glob.glob(os.path.join(tmp_dir, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    shutil.move(part, out_path)
    shutil.rmtree(tmp_dir)
    return out_path
