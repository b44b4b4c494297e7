"""JDBC source/sink wrappers (SURVEY.md §2.1 S5/S6, §2.2 K1/K2/K5).

The reference stages rows in RDS Postgres via psycopg2 (single-row and
``execute_values`` batch INSERTs, full-table SELECTs, TRUNCATE resets).
Spark-native equivalents are thin option bundles around
``spark.read/write.format("jdbc")`` — the actual transfer, predicate
pushdown into the remote DB, and partitioned parallel reads are all
Spark built-ins.

No *Postgres* driver jar ships in this container, but Spark's own
distribution bundles Apache Derby (for the Hive metastore), whose
embedded driver backs ``jdbc:derby:`` URLs — ``derby_endpoint`` turns
that into a real, executed JDBC write→read round-trip gate for
K1/K2/S5/K5 (tests/test_sources_sinks.py). Production posture swaps
the endpoint: ``spark.jars.packages=org.postgresql:postgresql:...``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DERBY_EMBEDDED_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def derby_endpoint(db_dir: str) -> "JdbcEndpoint":
    """Endpoint for the embedded Derby database shipped inside Spark's
    jars (no network, file-backed at ``db_dir``) — the offline
    stand-in for the reference's RDS Postgres (W:37-43)."""
    return JdbcEndpoint(url=f"jdbc:derby:{db_dir};create=true",
                        driver=DERBY_EMBEDDED_DRIVER)


@dataclass(frozen=True)
class JdbcEndpoint:
    url: str                      # e.g. jdbc:postgresql://host:5432/db
    user: str | None = None
    password: str | None = None
    driver: str | None = None     # e.g. org.postgresql.Driver

    def options(self) -> dict[str, str]:
        opts = {"url": self.url}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.driver:
            opts["driver"] = self.driver
        return opts


def jdbc_table_reader(spark: SparkSession, ep: JdbcEndpoint, table: str,
                      partition_column: str | None = None,
                      lower_bound: int | None = None,
                      upper_bound: int | None = None,
                      num_partitions: int | None = None) -> DataFrameReader:
    """S5 — full-table scan. With the partition_column quadruple the
    scan issues ``num_partitions`` parallel range queries — the only
    way a JDBC read scales past one task."""
    r = spark.read.format("jdbc").options(**ep.options()).option("dbtable", table)
    if partition_column is not None:
        r = (r.option("partitionColumn", partition_column)
              .option("lowerBound", str(lower_bound))
              .option("upperBound", str(upper_bound))
              .option("numPartitions", str(num_partitions or 8)))
    return r


def jdbc_query_reader(spark: SparkSession, ep: JdbcEndpoint,
                      query: str) -> DataFrameReader:
    """S6 — whole-query pushdown (the reference ships its join SQL to
    Postgres; the engine computes joins itself and reserves this for
    remote-side filtering)."""
    return spark.read.format("jdbc").options(**ep.options()).option("query", query)


def jdbc_append_writer(df: DataFrame, ep: JdbcEndpoint, table: str,
                       batchsize: int = 1000):
    """K1/K2 — append. ``batchsize`` generalizes the reference's
    ``execute_values`` multi-row INSERT (its one hand-tuned physical
    op, SURVEY.md §4.1). Spark omits absent SERIAL columns so the DB
    assigns ids, matching reference behavior."""
    return (df.write.format("jdbc").mode("append")
            .options(**ep.options())
            .option("dbtable", table)
            .option("batchsize", str(batchsize)))


def jdbc_truncate_overwrite_writer(df: DataFrame, ep: JdbcEndpoint, table: str):
    """K5 — TRUNCATE + reload as an idempotent overwrite (the
    notebook's manual TRUNCATE, done transactionally by the writer)."""
    return (df.write.format("jdbc").mode("overwrite")
            .options(**ep.options())
            .option("dbtable", table)
            .option("truncate", "true"))
