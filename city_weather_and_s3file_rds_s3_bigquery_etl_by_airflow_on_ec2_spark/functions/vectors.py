"""Vector column expressions over ``array<float|double>`` embeddings.

All pure Catalyst expressions (``zip_with`` / ``aggregate`` — JVM-side
higher-order functions), so similarity math stays inside whole-stage
codegen with no Python in the hot path. Used by the similarity-search
operators (SURVEY.md §2.13) over the ``embeddings`` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision. Callers cast float
    vectors with ``as_double`` first so Spark and the DuckDB oracle
    accumulate at the same precision."""
    return dot(a, b) / (norm(a) * norm(b))
