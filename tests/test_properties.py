"""Property-based checks (hypothesis): the as-of join matches
pandas.merge_asof on arbitrary inputs, and the expression-layer
fingerprints match independent Python reimplementations."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.functions.text import (
    rolling_hash,
)
from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.joins import (
    asof_join,
)

left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),
    min_size=1, max_size=12)
right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),
    min_size=1, max_size=12,
    unique_by=lambda r: (r[0], r[1]))  # unique (key, time): asof precondition


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_matches_pandas_merge_asof(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], ["k", "t", "lid"])
    right = spark.createDataFrame(
        [(k, t, k * 1000 + t) for (k, t) in rrows], ["k", "rt", "payload"])
    got = {r.lid: r.payload
           for r in asof_join(left, right, on="k", left_time="t",
                              right_time="rt",
                              payload_cols=["payload"]).collect()}

    lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(lrows)],
                      columns=["k", "t", "lid"]).sort_values("t", kind="stable")
    rp = pd.DataFrame([(k, t, k * 1000 + t) for (k, t) in rrows],
                      columns=["k", "rt", "payload"]).sort_values("rt",
                                                                  kind="stable")
    want_df = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k",
                            direction="backward", allow_exact_matches=True)
    want = {int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
            for r in want_df.itertuples()}
    assert got == want


texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1, max_size=40),
    min_size=1, max_size=8)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ts=texts)
def test_rolling_hash_matches_python(spark, ts):
    import re

    def py_roll(text: str) -> int:
        norm = re.sub(r"\s+", " ", text.strip())
        h = 0
        for ch in norm:
            h = (h * 31 + ord(ch)) % 1_000_000_007
        return h

    df = spark.createDataFrame([(i, t) for i, t in enumerate(ts)],
                               ["i", "text"])
    got = {r.i: r.h for r in
           df.select("i", rolling_hash("text").alias("h")).collect()}
    assert got == {i: py_roll(t) for i, t in enumerate(ts)}


def test_rolling_hash_prenormalized_equals_full_on_normalized(spark):
    """r13: the lean hash (no trim/regex pass) must be bit-identical to
    rolling_hash on whitespace-normalized inputs — single tokens from
    split-on-\\s+ and single-space-joined grams — including the
    empty-string edge (both hash to 0) and non-ASCII codepoints."""
    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.functions.text import (
        rolling_hash_prenormalized,
    )

    samples = ["", "a", "token", "two words", "Ünïcødé tökens",
               "punct,.!?", "x" * 200, "a b", "0 1 2 3"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], ["i", "t"])
    rows = df.select(
        "i", rolling_hash("t").alias("full"),
        rolling_hash_prenormalized("t").alias("lean")).collect()
    assert all(r.full == r.lean for r in rows), [
        (r.i, r.full, r.lean) for r in rows if r.full != r.lean]


def test_sha_fingerprint_matches_hashlib(spark):
    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.functions.text import (
        fingerprint_sha,
    )
    import re

    samples = ["Hello  World", "  spark    sql  ", "a\tb\nc"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               ["i", "text"])
    got = {r.i: r.fp for r in
           df.select("i", fingerprint_sha("text").alias("fp")).collect()}
    for i, s in enumerate(samples):
        norm = re.sub(r"\s+", " ", s.strip()).lower()
        assert got[i] == hashlib.sha256(norm.encode()).hexdigest()[:16]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_forward_matches_pandas(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], ["k", "t", "lid"])
    right = spark.createDataFrame(
        [(k, t, k * 1000 + t) for (k, t) in rrows], ["k", "rt", "payload"])
    got = {r.lid: r.payload
           for r in asof_join(left, right, on="k", left_time="t",
                              right_time="rt", payload_cols=["payload"],
                              direction="forward").collect()}
    lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(lrows)],
                      columns=["k", "t", "lid"]).sort_values("t", kind="stable")
    rp = pd.DataFrame([(k, t, k * 1000 + t) for (k, t) in rrows],
                      columns=["k", "rt", "payload"]).sort_values("rt",
                                                                  kind="stable")
    want_df = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k",
                            direction="forward", allow_exact_matches=True)
    want = {int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
            for r in want_df.itertuples()}
    assert got == want


# ------------------------------------------------ spatial grid join —

pt_rows = st.lists(
    st.tuples(
        st.floats(min_value=-2.0, max_value=2.0,
                  allow_nan=False, allow_infinity=False, width=32),
        st.floats(min_value=-2.0, max_value=2.0,
                  allow_nan=False, allow_infinity=False, width=32)),
    min_size=2, max_size=25)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pts=pt_rows)
def test_spatial_grid_join_matches_brute_force_property(spark, tmp_path_factory, pts):
    """For ARBITRARY point sets (including cell-boundary and negative
    coordinates) the grid-blocked radius join equals the O(n²) brute
    force — completeness and unicity of the 3x3 fanout."""
    import math

    from pyspark.sql import types as T

    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.extensions import (
        join_spatial_grid_radius,
    )
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    rows = [(i, [x, y, 0.0], 0) for i, (x, y) in enumerate(pts)]
    lake = str(tmp_path_factory.mktemp("grid") / "lake")
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(f"{lake}/embeddings.parquet")
    r = 0.3
    got = {(q["id_a"], q["id_b"]): q["dist"]
           for q in join_spatial_grid_radius(spark, lake, radius=r).collect()}
    cast = [(i, float(pd.Series([x], dtype="float32")[0]),
             float(pd.Series([y], dtype="float32")[0]))
            for i, (x, y) in enumerate(pts)]
    expect = {}
    for i, (ida, xa, ya) in enumerate(cast):
        for idb, xb, yb in cast[i + 1:]:
            d = math.sqrt((xa - xb) ** 2 + (ya - yb) ** 2)
            if d <= r:
                expect[(min(ida, idb), max(ida, idb))] = round(d, 6)
    assert got == expect


basket_rows = st.lists(
    st.tuples(st.integers(1, 6), st.integers(10, 16)),  # (order, part)
    min_size=1, max_size=30)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=basket_rows)
def test_copurchase_matches_brute_force(spark, rows):
    """lineitem_copurchase_lift ≡ itertools brute force over random
    baskets: same pair counts, supports, and lift on every instance
    (k above the pair-universe size so nothing is truncated)."""
    import itertools
    import tempfile

    import pandas as pd

    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.plans.extensions import (
        lineitem_copurchase_lift,
    )

    with tempfile.TemporaryDirectory() as tmp:
        pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]) \
          .to_parquet(f"{tmp}/lineitem.parquet", index=False)
        got = {(r.part_a, r.part_b): (r.n_both, r.n_a, r.n_b, r.lift)
               for r in lineitem_copurchase_lift(spark, tmp, k=50)
               .collect()}

    baskets: dict[int, set[int]] = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    n_total = len(baskets)
    part_n: dict[int, int] = {}
    pair_n: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        for p in parts:
            part_n[p] = part_n.get(p, 0) + 1
        for a, b in itertools.combinations(sorted(parts), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    want = {}
    top = sorted(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    for (a, b), n_both in top:
        want[(a, b)] = (n_both, part_n[a], part_n[b],
                        round(n_both * n_total / (part_n[a] * part_n[b]), 4))
    assert got == want


graph_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
        lambda e: e[0] < e[1]),
    min_size=1, max_size=16, unique=True)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=graph_edges)
def test_link_prediction_matches_brute_force(spark, edges):
    """link_prediction_scores ≡ a python adjacency-set brute force on
    random small graphs: exactly the non-adjacent pairs with ≥1
    common neighbor, with exact counts and Jaccard scores."""
    import itertools

    from city_weather_and_s3file_rds_s3_bigquery_etl_by_airflow_on_ec2_spark.operators.graph import (
        link_prediction_scores,
    )

    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {(r.id_a, r.id_b): (r.common_neighbors, r.score)
           for r in link_prediction_scores(df).collect()}

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        if b in adj[a]:
            continue
        cn = len(adj[a] & adj[b])
        if cn:
            want[(a, b)] = (cn, round(cn / len(adj[a] | adj[b]), 4))
    assert got == want
