"""HLL sketch properties (operators/sketches.py): mergeability — THE sketch
property that matters at scale — plus estimate sanity. Cross-engine value
parity lives in plans/parity_sketches.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_ndv,
    hll_state,
)


def _ids(spark, lo, hi, tag="g"):
    return spark.range(lo, hi).select(
        F.lit(tag).alias("g"), F.concat(F.lit("user-"), F.col("id")).alias("v")
    )


def test_hll_merge_equals_union_state(spark):
    """merge(state(A), state(B)) must equal state(A ∪ B) register-for-
    register — the distributed-rollup property (sketch partial states can
    combine across partitions, days, or tiers without the raw data)."""
    a = _ids(spark, 0, 600)
    b = _ids(spark, 400, 1000)  # overlapping ranges
    merged = hll_merge(
        [hll_state(a, ["g"], "v"), hll_state(b, ["g"], "v")], ["g"]
    )
    direct = hll_state(a.unionByName(b), ["g"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    # and therefore identical estimates
    em = hll_estimate(merged, ["g"]).collect()[0].approx_ndv
    ed = hll_estimate(direct, ["g"]).collect()[0].approx_ndv
    assert em == ed


def test_hll_estimate_accuracy(spark):
    """m=256 gives ~6.5% standard error; assert a loose 3-sigma band on a
    known cardinality, and exactness-ish at tiny cardinality (linear
    counting branch)."""
    big = hll_ndv(_ids(spark, 0, 2000), ["g"], "v").collect()[0]
    assert abs(big.approx_ndv - 2000) / 2000 < 0.20
    small = hll_ndv(_ids(spark, 0, 10), ["g"], "v").collect()[0]
    assert abs(small.approx_ndv - 10) <= 2  # linear counting is near-exact here


def test_hll_nulls_ignored(spark):
    df = _ids(spark, 0, 50).unionByName(
        spark.range(5).select(F.lit("g").alias("g"), F.lit(None).cast("string").alias("v"))
    )
    out = hll_ndv(df, ["g"], "v").collect()[0]
    ref = hll_ndv(_ids(spark, 0, 50), ["g"], "v").collect()[0]
    assert out.approx_ndv == ref.approx_ndv


def test_cms_never_underestimates_and_merges(spark):
    from financial_data_ingestion_canonical_snowflake_spark.operators.sketches import (
        cms_lookup,
        cms_state,
    )

    # skewed frequencies: value-i appears i+1 times
    rows = [("g", f"tok-{i}") for i in range(60) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "g string, v string")
    state = cms_state(df, ["g"], "v")
    probes = df.select("g", "v").distinct()
    est = {r.v: r.cms_count for r in cms_lookup(state, probes, ["g"], "v").collect()}
    for i in range(60):
        assert est[f"tok-{i}"] >= i + 1  # CMS overestimates only
    # with width=512 and 60 values, most estimates are exact
    exact_hits = sum(1 for i in range(60) if est[f"tok-{i}"] == i + 1)
    assert exact_hits >= 50

    # additive merge: state(A) + state(B) == state(A ∪ B)
    a, b = df.filter("v < 'tok-3'"), df.filter("v >= 'tok-3'")
    merged = (
        cms_state(a, ["g"], "v")
        .unionByName(cms_state(b, ["g"], "v"))
        .groupBy("g", "j", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    direct = cms_state(df, ["g"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_bloom_superset_and_fp_rate(spark):
    from financial_data_ingestion_canonical_snowflake_spark.operators.sketches import (
        bloom_build,
        bloom_compile,
        bloom_might_contain,
    )

    members = spark.range(0, 300).select(F.concat(F.lit("m-"), F.col("id")).alias("v"))
    bitmap = bloom_compile(bloom_build(members, "v"))
    probe = spark.range(0, 3000).select(
        F.when(F.col("id") < 300, F.concat(F.lit("m-"), F.col("id")))
        .otherwise(F.concat(F.lit("x-"), F.col("id")))
        .alias("v")
    )
    flagged = probe.withColumn("might", bloom_might_contain(bitmap, "v"))
    rows = flagged.collect()
    # no false negatives: every member passes
    assert all(r.might for r in rows if r.v.startswith("m-"))
    # false positives are rare (expected ~0.8% at n=300, m=4096, k=3)
    fps = sum(1 for r in rows if r.might and r.v.startswith("x-"))
    assert fps < 2700 * 0.05


def test_hist_merge_equals_union_state(spark):
    """Histogram counters are additive: merge(state(A), state(B)) ==
    state(A ∪ B) — the same distributed-rollup property as HLL/CMS."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.sketches import (
        hist_merge,
        hist_state,
    )

    lo, hi = F.lit(0.0), F.lit(1000.0)
    a = spark.range(0, 600).select(F.lit("g").alias("g"), (F.col("id") * 1.7).alias("v"))
    b = spark.range(300, 900).select(F.lit("g").alias("g"), (F.col("id") * 1.1).alias("v"))
    merged = hist_merge(
        [hist_state(a, ["g"], "v", lo, hi), hist_state(b, ["g"], "v", lo, hi)], ["g"]
    )
    direct = hist_state(a.unionByName(b), ["g"], "v", lo, hi)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_hist_quantile_error_bounded_by_bucket_width(spark):
    """Estimates land within one bucket width of the exact quantile."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.sketches import (
        hist_quantiles,
        hist_state,
    )

    n_buckets = 128
    df = spark.range(0, 5000).select(
        F.lit("g").alias("g"), (F.col("id") % 997 * 3.25).alias("v")
    )
    b = df.agg(F.min("v").cast("double"), F.max("v").cast("double")).first()
    lo, hi = F.lit(b[0]), F.lit(b[1])
    state = hist_state(df, ["g"], "v", lo, hi, n_buckets)
    qs = [0.5, 0.9, 0.99]
    got = {r.q: r.approx_q for r in hist_quantiles(state, ["g"], qs, lo, hi, n_buckets).collect()}
    exact = df.agg(F.expr("percentile(v, array(0.5, 0.9, 0.99))")).first()[0]
    width = (b[1] - b[0]) / n_buckets
    for q, ex in zip(qs, exact):
        assert abs(got[q] - ex) <= width + 1e-9, (q, got[q], ex)


def test_hist_out_of_range_clamps_to_edge_buckets(spark):
    from financial_data_ingestion_canonical_snowflake_spark.operators.sketches import (
        hist_state,
    )

    df = spark.createDataFrame(
        [("g", -50.0), ("g", 5.0), ("g", 500.0)], "g string, v double"
    )
    state = hist_state(df, ["g"], "v", F.lit(0.0), F.lit(10.0), 8)
    rows = {r.bucket: r.cnt for r in state.collect()}
    assert rows == {0: 1, 4: 1, 7: 1}  # clamped low, mid, clamped high
