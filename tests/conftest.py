from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark import (  # noqa: E402
    get_spark,
)

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Test-session-only conf (r13, VERDICT r12 #1 — the suite must
    # finish inside the driver's verify budget): 8 shuffle/state
    # partitions instead of the bench's 32.  The suite runs ~1000 tiny
    # actions at sf0.001/sf0.01 where per-task scheduling and per-
    # partition streaming state stores dominate wall time; every
    # assertion here is partition-count-independent (semantics, plan
    # SHAPES, oracle parity — exchange counts and operator choices do
    # not depend on the partition number).  bench.py and the driver
    # contract still run `spark.sql.shuffle.partitions` =
    # $SPARK_GRAFT_CPUS via session.DEFAULT_CONFS — this is test
    # infrastructure, not a bench configuration.
    s = get_spark("tests", extra_confs={"spark.sql.shuffle.partitions": "8"})
    yield s


@dataclass(frozen=True)
class SweepRecord:
    """One registry entry's build artifacts, captured once."""
    schema: object          # pyspark StructType (analysis output)
    executed: str           # executedPlan().toString() (physical plan)
    optimized: str          # optimizedPlan().toString() (logical plan)


@pytest.fixture(scope="session")
def registry_sweep(spark) -> dict[str, SweepRecord]:
    """ONE build of every registry entry at SF_SMALL (r13, VERDICT r12
    #1): the three suite-wide lints (SinglePartition justification,
    pandas-unhashable driver schema, Generate materialization sweep)
    each rebuilt all ~276 entries independently — together the three
    slowest tests in the suite (~21 min of the 49-min wall that blew
    the driver's verify budget in r12).  They now share this single
    capture; each lint's predicate and covered entry set is unchanged.
    Streaming builders execute their micro-batch harness once here
    (their settled result is a memory-sink scan, exactly what the
    old per-test sweeps captured too)."""
    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.cache import (
        release_persisted,
    )
    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.registry import (
        REGISTRY,
    )

    out: dict[str, SweepRecord] = {}
    for name, spec in sorted(REGISTRY.items()):
        df = spec.fn(spark, SF_SMALL)
        qe = df._jdf.queryExecution()
        out[name] = SweepRecord(
            schema=df.schema,
            executed=qe.executedPlan().toString(),
            optimized=qe.optimizedPlan().toString(),
        )
    release_persisted()
    return out
