"""Iterative Lloyd k-means training over an embedding column.

``embedding_kmeans_step`` (plans/extensions.py) is one oracle-checked
Lloyd iteration; this module is the driver loop around that per-step
shape — the iterative-algorithm pattern Spark handles with a
driver-side loop over stateless jobs (the same structure GraphX/ML use:
small mutable state on the driver, one distributed job per round).

Per iteration:

1. broadcast the k×d centroid table (k*d doubles — metadata);
2. assign each vector to its nearest centroid with the NARROW argmin:
   ``min(struct(dist2, c_id))`` after partial aggregation, so the
   exchange carries one (id, dist2, c_id) row per vector — the
   embedding arrays never shuffle;
3. recompute centroids as per-(cluster, dimension) means via
   ``posexplode`` — the k×d result is partial-aggregated map-side and
   collected to the driver (k*d rows — metadata at any corpus scale).

The loop stops when the max centroid L2 shift drops below ``tol`` or
after ``max_iter`` rounds.  With a deterministic init (the caller
passes the seed centroids) every iteration is deterministic up to
float-sum ordering; cluster MEMBERSHIP is stable under that noise for
non-degenerate data, which is what the ground-truth test asserts
against a NumPy reference implementation.

Not SQL-expressible (unbounded iteration) — registry entry is
rows-only by design; correctness is test-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(df: DataFrame, centroids: list[list[float]],
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Nearest-centroid assignment → (id_col, c_id, dist2), one narrow
    row per vector after the argmin partial-agg."""
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "c_id: int, centroid: array<double>")
    d = df.crossJoin(F.broadcast(cent_df)).select(
        id_col, "c_id",
        _sq_dist(as_double(F.col(vec_col)), F.col("centroid"))
        .alias("dist2"))
    best = d.groupBy(id_col).agg(F.min(F.struct("dist2", "c_id")).alias("b"))
    return best.select(id_col, F.col("b.c_id").alias("c_id"),
                       F.col("b.dist2").alias("dist2"))


def kmeans_train(df: DataFrame, init_centroids: list[list[float]],
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 max_iter: int = 20, tol: float = 1e-6,
                 ) -> tuple[list[list[float]], DataFrame, int]:
    """Lloyd iterations from ``init_centroids`` until the max centroid
    shift (L2²) < ``tol`` or ``max_iter`` rounds; returns (final
    centroids, final assignment DataFrame, iterations run).

    Empty clusters keep their previous centroid (the standard
    keep-stale rule — deterministic, no resampling).

    Each iteration re-reads ``df`` from its lineage; for a multi-pass
    run over an expensive upstream, persist/checkpoint ``df`` before
    calling (deliberately not done here — the caller owns the cache
    lifetime, same contract as serial_id's nondeterministic-upstream
    rule)."""
    k = len(init_centroids)
    dim = len(init_centroids[0])
    cents = [list(map(float, c)) for c in init_centroids]
    it = 0
    for it in range(1, max_iter + 1):
        assigned = assign_clusters(df, cents, vec_col, id_col)
        # per-(cluster, dim) means: k*d rows after partial agg — metadata
        sums = (df.join(assigned.select(id_col, "c_id"), id_col)
                .select("c_id", F.posexplode(as_double(F.col(vec_col)))
                        .alias("dim", "v"))
                .groupBy("c_id", "dim")
                .agg(F.avg("v").alias("m"))
                .collect())
        new_cents = [list(c) for c in cents]  # keep-stale default
        acc: dict[int, list[float]] = {}
        for r in sums:
            acc.setdefault(r["c_id"], [0.0] * dim)[r["dim"]] = r["m"]
        for c_id, vec in acc.items():
            new_cents[c_id] = vec
        shift = max(sum((a - b) * (a - b) for a, b in zip(o, n))
                    for o, n in zip(cents, new_cents))
        cents = new_cents
        if shift < tol:
            break
    return cents, assign_clusters(df, cents, vec_col, id_col), it
