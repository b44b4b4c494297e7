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

The unbounded-``tol`` loop is not SQL-expressible; as of r9 the
registry entry runs a FIXED 2 Lloyd rounds with ``exact_means=True``
(DECIMAL-summed centroid updates), which IS SQL-expressible — the
DuckDB oracle replays the step algebra twice
(``plans/registry._kmeans_unrolled_sql``).  The convergence-driven
variant keeps its NumPy ground-truth test.
"""

from __future__ import annotations

import math

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
                 exact_means: bool = False,
                 ) -> tuple[list[list[float]], DataFrame, int]:
    """Lloyd iterations from ``init_centroids`` until the max centroid
    shift (L2²) < ``tol`` or ``max_iter`` rounds; returns (final
    centroids, final assignment DataFrame, iterations run).

    Empty clusters keep their previous centroid (the standard
    keep-stale rule — deterministic, no resampling).

    ``exact_means=True`` computes the per-(cluster, dimension)
    centroid update as ``CAST(sum(DECIMAL(28,15)) AS DOUBLE) / count``
    instead of ``avg`` — the DECIMAL sum is addition-order-free across
    partitions, so a fixed-iteration-count run is bit-deterministic
    and SQL-oracle-replayable (the r9 promotion of the registry's
    ``embedding_kmeans_train`` entry).  The default ``avg`` keeps the
    cheaper double sum whose last-bit partition-order noise is
    irrelevant when only converged MEMBERSHIP matters.

    Each iteration re-reads ``df`` from its lineage; for a multi-pass
    run over an expensive upstream, persist/checkpoint ``df`` before
    calling (deliberately not done here — the caller owns the cache
    lifetime, same contract as serial_id's nondeterministic-upstream
    rule)."""
    k = len(init_centroids)
    dim = len(init_centroids[0])
    cents = [list(map(float, c)) for c in init_centroids]
    mean_expr = (
        (F.sum(F.col("v").cast("decimal(28,15)")).cast("double")
         / F.count(F.lit(1)))
        if exact_means else F.avg("v"))
    it = 0
    for it in range(1, max_iter + 1):
        assigned = assign_clusters(df, cents, vec_col, id_col)
        # per-(cluster, dim) means: k*d rows after partial agg — metadata
        sums = (df.join(assigned.select(id_col, "c_id"), id_col)
                .select("c_id", F.posexplode(as_double(F.col(vec_col)))
                        .alias("dim", "v"))
                .groupBy("c_id", "dim")
                .agg(mean_expr.alias("m"))
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


# ------------------------------------------------- product quantization —
# PQ [Jégou et al., "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011]: split each d-dim vector into m subvectors,
# k-means each subspace independently, store each vector as m small
# centroid ids.  With m=4, k=16 a 64-dim float vector (256 B)
# compresses to 4 codes (2 B at 4 bits each) — the storage layer that
# makes billion-vector ANN feasible; ann_ivf_topk's coarse quantizer +
# these fine codes is the standard IVF-PQ layout.

def pq_train(df: DataFrame, m: int = 4, k: int = 16,
             vec_col: str = "embedding", id_col: str = "vec_id",
             max_iter: int = 10) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks (k centroids each) with the
    existing Lloyd loop.  Deterministic init: the k hash-ordered seed
    subvectors (same fixed-budget rule as ann_ivf_topk's coarse
    centroids).  Driver state is m*k*(d/m) = k*d doubles — metadata.

    Each subspace trains on a SLICED projection of the vector column;
    the full vectors never shuffle (kmeans_train's argmin is narrow).
    """
    dim = df.select(F.size(vec_col).alias("d")).first()["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    # r13 (guide §2.6 — overlap independent jobs): the m subspace
    # trainings are fully independent Lloyd loops, each a chain of
    # small sequential driver jobs (seeds collect + per-iteration
    # assign/means/collect) — run SEQUENTIALLY they serialized ~40
    # driver round-trips (~70 s at sf0.001, the slowest build in the
    # registry).  A small thread pool overlaps the m chains' jobs and
    # plan analysis; each thread computes its own codebook from its
    # own deterministic seeds, so results are byte-identical to the
    # sequential loop.  Each subspace also persists its sliced input
    # (kmeans_train re-reads it twice per iteration by contract —
    # "the caller owns the cache lifetime"), released right after
    # training.
    def _train_one(j: int) -> list[list[float]]:
        sl = df.select(
            F.col(id_col),
            F.slice(as_double(F.col(vec_col)), j * sub + 1, sub)
            .alias(vec_col)).persist()
        try:
            seeds = [r.v for r in sl
                     .orderBy(F.xxhash64(F.col(id_col), F.lit(j)))
                     .limit(k).select(F.col(vec_col).alias("v")).collect()]
            cb, _, _ = kmeans_train(sl, seeds, vec_col=vec_col,
                                    id_col=id_col, max_iter=max_iter)
            return cb
        finally:
            sl.unpersist()

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=m) as pool:
        return list(pool.map(_train_one, range(m)))


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Encode every vector to its m nearest-centroid codes →
    ``(id_col, pq_codes array<int>, recon_err double)``.

    Expression-only: per subspace the k squared distances form a
    literal-centroid array, the code is the argmin index and the
    subspace's min distance accumulates into the exact reconstruction
    error (sum of per-subspace quantization errors — PQ's objective).
    No shuffle at all: encoding is a map over the scan."""
    m = len(codebooks)
    k = len(codebooks[0])
    sub = len(codebooks[0][0])
    codes, errs = [], []
    for j, book in enumerate(codebooks):
        subv = F.slice(as_double(F.col(vec_col)), j * sub + 1, sub)
        dists = F.array(*[
            _sq_dist(subv, F.array(*[F.lit(float(x)) for x in c]))
            for c in book])
        codes.append((F.array_position(dists, F.array_min(dists)) - 1)
                     .cast("int"))
        errs.append(F.array_min(dists))
    total_err = errs[0]
    for e in errs[1:]:
        total_err = total_err + e
    return df.select(
        F.col(id_col),
        F.array(*codes).alias("pq_codes"),
        total_err.alias("recon_err"))


def pq_decode_codes(codes: list[int],
                    codebooks: list[list[list[float]]]) -> list[float]:
    """Driver-side reconstruction of one code word (test helper /
    centroid lookup): concatenation of the selected centroids."""
    out: list[float] = []
    for j, c in enumerate(codes):
        out.extend(codebooks[j][c])
    return out


# ---------------------------------------------------- PCA (power method) —
# Distributed principal components, split by regime the way Spark ML's
# RowMatrix.computePrincipalComponents does it: for d up to a few
# thousand the d×d Gramian is METADATA (d² doubles), so the cluster's
# only job is a one-pass outer-product census — Σ x xᵀ as a d²-row
# per-cell aggregate with map-side combine — and the eigensolve runs
# on the driver (deflated power iteration over the 64×64 covariance:
# pure arithmetic, no cluster round-trips).  The per-round DISTRIBUTED
# matvec variant (one scan per iteration) is only worth its
# driver-loop latency when d² no longer fits the driver — at that
# point swap the local `_power_eig` for a loop of
# Σ (x−µ)((x−µ)·v) scans; the census below already demonstrates the
# partial-aggregation shape such a matvec uses.
#
# The census explodes a per-row d² outer-product array.  Nothing
# expensive is projected BESIDE the Generate (the r5d9 CollapseProject
# trap): the outer array is the Generate's own input, evaluated once
# per row.


def _power_eig(cov: list[list[float]], k: int, max_iter: int,
               tol: float) -> tuple[list[list[float]], list[float], int]:
    """Driver-local deflated power iteration on a small symmetric
    matrix → (top-k unit eigenvectors, eigenvalues, iterations).

    ``tol=0.0`` disables the drift stop entirely — exactly
    ``max_iter`` iterations per component (the fixed-iteration mode
    the oracle-checked registry entry pins; a plain ``drift < 0.0``
    comparison would still fire spuriously once float noise pushes
    ``abs(v·w)`` above 1.0 at convergence — observed at sf0.01, where
    it stopped component 0 at iteration 598)."""
    dim = len(cov)
    comps: list[list[float]] = []
    eigs: list[float] = []
    iters = 0
    for c in range(k):
        v = [1.0 if i == c else 1.0 / (2 + i + c) for i in range(dim)]
        nv = math.sqrt(sum(a * a for a in v))
        v = [a / nv for a in v]  # drift test needs |v| = 1 from round 1
        lam = 0.0
        for _ in range(max_iter):
            iters += 1
            w = [sum(cov[i][j] * v[j] for j in range(dim))
                 for i in range(dim)]
            for u in comps:  # deflate: stay orthogonal to found comps
                d = sum(a * b for a, b in zip(w, u))
                w = [a - d * b for a, b in zip(w, u)]
            nw = math.sqrt(sum(a * a for a in w))
            if nw == 0.0:
                break
            w = [a / nw for a in w]
            lam = sum(wi * sum(cov[i][j] * w[j] for j in range(dim))
                      for i, wi in enumerate(w))
            drift = 1.0 - abs(sum(a * b for a, b in zip(v, w)))
            v = w
            if tol > 0.0 and drift < tol:
                break
        comps.append(v)
        eigs.append(lam)
    return comps, eigs, iters


def pca_power(df: DataFrame, n_components: int = 2,
              vec_col: str = "embedding", id_col: str = "vec_id",
              max_iter: int = 1000, tol: float = 1e-14,
              ) -> tuple[list[list[float]], list[float], float, int]:
    """Top-``n_components`` principal components of the vector column.

    Returns ``(components, eigenvalues, total_variance, iters)`` where
    components are unit-norm d-vectors of the POPULATION covariance
    (1/n), eigenvalues the matching variances, and ``total_variance``
    the trace — so explained-variance ratios are eigenvalue/trace.

    Cluster side: ONE job — per-dim sums (d columns, map-side
    combined) plus the d²-cell Gramian census (posexplode of the
    per-row outer-product array → per-cell sum).  Driver side: form
    C = G/n − µµᵀ (the textbook shortcut; fine for feature scales
    like unit-norm embeddings, the usual cancellation caveat applies
    for huge means) and run deflated power iteration locally —
    ``max_iter``/``tol`` govern that local loop, which costs d² flops
    a round, no cluster round-trips.

    Sign convention: each returned component is flipped so its
    largest-|loading| coordinate is positive — deterministic across
    runs and engines (up to float-sum ordering in the partial sums).

    The free-running mode (tol > 0, early exit) is not
    SQL-expressible — but the registry entry ``embedding_pca_power``
    pins the FIXED-ITERATION mode (max_iter=1000, tol=0.0), whose
    deterministic procedure a DuckDB recursive CTE replays step for
    step, so the entry is oracle-checked (promoted r11); ground truth
    for the free-running mode stays the NumPy eigendecomposition in
    tests.
    """
    v0 = as_double(F.col(vec_col))
    dim = df.select(F.size(v0).alias("d")).first()["d"]
    outer = F.flatten(
        F.transform(F.col("x"),
                    lambda xi: F.transform(F.col("x"),
                                           lambda xj: xi * xj)))
    sums = (df.select(v0.alias("x"))
            .select(F.col("x"), F.posexplode(outer).alias("cell", "v"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("v").alias("g"),
                 # per-dim sum, once per row: only the first d cells
                 # (row i = 0 of the outer product) carry it
                 F.sum(F.when(F.col("cell") < dim,
                              F.element_at("x", F.col("cell") + 1))
                       .otherwise(F.lit(0.0))).alias("s"))
            .collect())
    n = sums[0]["n"]
    g = [0.0] * (dim * dim)
    s = [0.0] * dim
    for r in sums:
        g[r["cell"]] = r["g"]
        if r["cell"] < dim:
            s[r["cell"]] = r["s"]
    mu = [x / n for x in s]
    cov = [[g[i * dim + j] / n - mu[i] * mu[j] for j in range(dim)]
           for i in range(dim)]
    total_var = sum(cov[i][i] for i in range(dim))
    vs, eigs, iters = _power_eig(cov, n_components, max_iter, tol)
    comps = []
    for v in vs:
        imax = max(range(dim), key=lambda i: abs(v[i]))
        comps.append([-a for a in v] if v[imax] < 0 else list(v))
    return comps, eigs, total_var, iters
