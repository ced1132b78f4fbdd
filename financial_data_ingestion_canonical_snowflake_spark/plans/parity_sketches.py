"""Sketch parity queries (operators/sketches.py).

The HLL sketch uses the repo's shared md5 60-bit hash, so the DuckDB
oracle rebuilds the IDENTICAL register state (bucket = h % 256, rho via
``length(bin(h >> 8))``) and the same exact-integer estimate arithmetic —
an approximate algorithm under an exact cross-engine check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sketches as sk
from .registry import parity, table

# constants mirrored into the SQL below: b=8 -> m=256, rank_bits=52,
# top=53, 2^53 = 9007199254740992
_HLL_ORACLE = """
    WITH h AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    reg AS (
        SELECT event_type, hv % 256 AS bucket,
               MAX(CASE WHEN (hv >> 8) = 0 THEN 53
                        ELSE 53 - length(bin(hv >> 8)) END) AS r
        FROM h GROUP BY 1, 2
    ),
    agg AS (
        SELECT event_type, COUNT(*) AS observed,
               SUM(CAST(pow(2.0, 53 - r) AS BIGINT)) AS sum_obs
        FROM reg GROUP BY 1
    ),
    est AS (
        SELECT event_type, observed,
               ((0.7213 / (1 + 1.079 / 256)) * 256 * 256 * 9007199254740992.0)
                 / CAST(sum_obs + (256 - observed) * 9007199254740992 AS DOUBLE)
                   AS raw
        FROM agg
    ),
    exact AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_ndv
        FROM events GROUP BY 1
    )
    SELECT e.event_type, x.exact_ndv,
           CAST(e.observed AS BIGINT) AS hll_buckets,
           round(CASE WHEN e.raw <= 640 AND e.observed < 256
                      THEN 256.0 * ln(256.0 / CAST(256 - e.observed AS DOUBLE))
                      ELSE e.raw END, 6) AS approx_ndv
    FROM est e JOIN exact x USING (event_type)
"""


@parity(
    "ns_sketch_hll_users",
    driver=False,  # driver slot: folded into ns_sketch_digest
    oracle=_HLL_ORACLE,
)
def ns_sketch_hll_users(spark, sf_dir):
    """Distinct users per event type two ways: exact COUNT(DISTINCT) and the
    HLL sketch — the oracle recomputes the sketch registers bit-for-bit, so
    the approximation itself is value-verified, not just bounded."""
    # md5 register hashing is CPU-bound map work and the fixture parquet is
    # one row group (single-core scan locally) — spread rows first; at real
    # scale inputs arrive in many row groups (parity_text._docs2 concession)
    # localCheckpoint: the scan+repartition feeds BOTH the exact branch
    # and the sketch branch — materialize once instead of twice
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", "user_id")  # project BEFORE the checkpoint —
        # lineage truncation would otherwise materialize all six columns
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_ndv")
    )
    approx = sk.hll_ndv(ev, ["event_type"], "user_id")
    return exact.join(approx, "event_type").select(
        "event_type", "exact_ndv", "hll_buckets", "approx_ndv"
    )


_CMS_ORACLE = """
    WITH toks AS (
        SELECT lang, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    counters AS (
        SELECT lang, d.j,
               ('0x' || substr(md5(CAST(d.j AS VARCHAR) || '|' || token), 1, 15))::BIGINT % 512
                   AS bucket,
               COUNT(*) AS cnt
        FROM toks, (SELECT UNNEST([0, 1, 2, 3]) AS j) d
        GROUP BY 1, 2, 3
    ),
    exact AS (
        SELECT lang, token, COUNT(*) AS exact_cnt
        FROM toks GROUP BY 1, 2
    ),
    top AS (
        SELECT lang, token, exact_cnt,
               CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY exact_cnt DESC, token) AS BIGINT) AS rnk
        FROM exact QUALIFY rnk <= 8
    ),
    probed AS (
        SELECT t.lang, t.token, t.exact_cnt, t.rnk, d.j,
               ('0x' || substr(md5(CAST(d.j AS VARCHAR) || '|' || t.token), 1, 15))::BIGINT % 512
                   AS bucket
        FROM top t, (SELECT UNNEST([0, 1, 2, 3]) AS j) d
    )
    SELECT p.lang, p.token, p.exact_cnt, p.rnk,
           CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_count
    FROM probed p
    LEFT JOIN counters c ON c.lang = p.lang AND c.j = p.j AND c.bucket = p.bucket
    GROUP BY 1, 2, 3, 4
"""


@parity(
    "ns_sketch_cms_tokens",
    driver=False,  # driver slot: folded into ns_sketch_digest
    oracle=_CMS_ORACLE,
)
def ns_sketch_cms_tokens(spark, sf_dir):
    """Heavy-hitter vocabulary per language: the exact top-8 tokens with
    their count-min estimates. The oracle rebuilds the identical 4x512
    counter matrix, so CMS's overestimate-only guarantee is value-checked,
    not just asserted. CMS state is additive (union + re-sum merges),
    bounded (depth*width counters per group), and built map-side — the
    frequency twin of the HLL registers."""
    from pyspark.sql.window import Window

    from ..functions import text as tx
    from ..operators.sketches import cms_lookup, cms_state

    # same single-row-group concession as hll above: the per-(j, token) md5
    # counter hashing is map-side CPU work
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # the exploded token frame feeds BOTH the counter matrix and the exact
    # top-k branch — checkpoint so tokenize+explode runs once, not twice
    toks = d.select(
        "lang", F.explode(tx.tokens(F.col("text"))).alias("token")
    ).localCheckpoint(eager=True)
    state = cms_state(toks, ["lang"], "token")
    w = Window.partitionBy("lang").orderBy(F.desc("exact_cnt"), F.asc("token"))
    top = (
        toks.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 8)
    )
    est = cms_lookup(state, top.select("lang", "token"), ["lang"], "token")
    return top.join(est, ["lang", "token"]).select(
        "lang", "token", "exact_cnt", "rnk", "cms_count"
    )


_HIST_ORACLE = """
    WITH b AS (
        SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
               CAST(MAX(o_totalprice) AS DOUBLE) AS hi
        FROM orders
    ),
    st AS (
        SELECT o_orderpriority,
               CASE WHEN (hi - lo) = 0 THEN 0
                    ELSE LEAST(127, GREATEST(0,
                         CAST(floor(((CAST(o_totalprice AS DOUBLE) - lo)
                                     / (hi - lo)) * 128.0) AS BIGINT))) END
                   AS bucket,
               COUNT(*) AS cnt
        FROM orders, b
        WHERE o_totalprice IS NOT NULL
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT o_orderpriority, bucket, cnt,
               SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bucket) AS cum,
               SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bucket) - cnt
                   AS cum_before,
               SUM(cnt) OVER (PARTITION BY o_orderpriority) AS total
        FROM st
    ),
    probed AS (
        SELECT c.*, q.q, q.q * CAST(total AS DOUBLE) AS target
        FROM cum c, (SELECT UNNEST([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q) q
    )
    SELECT o_orderpriority, q, CAST(total AS BIGINT) AS n,
           round(lo + (CAST(bucket AS DOUBLE)
                       + (target - CAST(cum_before AS DOUBLE)) / CAST(cnt AS DOUBLE))
                     * ((hi - lo) / 128.0), 6) AS approx_q
    FROM probed, b
    WHERE CAST(cum_before AS DOUBLE) < target AND target <= CAST(cum AS DOUBLE)
"""


@parity(
    "ns_sketch_hist_quantiles",
    driver=False,  # driver slot: folded into ns_sketch_digest
    oracle=_HIST_ORACLE,
)
def ns_sketch_hist_quantiles(spark, sf_dir):
    """Order-price quantiles (p50/p90/p99) per priority via the mergeable
    equi-width histogram — the quantile member of the sketch family (HLL =
    cardinality, CMS = frequency, Bloom = membership). State is additive
    counters bounded at 128 rows per group, built map-side; the oracle
    rebuilds the identical histogram and interpolation, so the
    approximation itself is value-verified. Error <= one bucket width,
    pytest-proven against exact quantiles."""
    o = table(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_totalprice").cast("double"), F.max("o_totalprice").cast("double")
    ).first()
    lo, hi = F.lit(b[0]), F.lit(b[1])
    state = sk.hist_state(o, ["o_orderpriority"], "o_totalprice", lo, hi, 128)
    return sk.hist_quantiles(
        state, ["o_orderpriority"], [0.5, 0.9, 0.99], lo, hi, 128
    )


# 2^16 bits over the ~6k selected keys -> ~24% bits set, ~1.4% false-positive
# rate at k=3: the funnel's bloom_pass sits measurably BETWEEN exact_rows and
# probe_rows (the previous 4096-bit bitmap saturated at ~6k keys — every bit
# set, every probe passing, nothing demonstrated)
_BLOOM_BITS = 1 << 16

_BLOOM_ORACLE = f"""
    WITH sel AS (
        SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice > 480000
    ),
    jd AS (SELECT UNNEST([0, 1, 2]) AS j),
    bpos AS (
        SELECT ('0x' || substr(md5(CAST(jd.j AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % {_BLOOM_BITS} AS p
        FROM sel, jd
    ),
    words AS (
        SELECT p // 63 AS word, bit_or(1::BIGINT << (p % 63)) AS bits
        FROM bpos GROUP BY 1
    ),
    okeys AS (SELECT DISTINCT l_orderkey FROM lineitem),
    checks AS (
        SELECT o.l_orderkey, jd.j,
               ('0x' || substr(md5(CAST(jd.j AS VARCHAR) || '|' || CAST(o.l_orderkey AS VARCHAR)), 1, 15))::BIGINT % {_BLOOM_BITS} AS p
        FROM okeys o, jd
    ),
    hit AS (
        SELECT l_orderkey,
               MIN(CASE WHEN ((COALESCE(w.bits, 0) >> (p % 63)) & 1) = 1
                        THEN 1 ELSE 0 END) AS might
        FROM checks LEFT JOIN words w ON w.word = p // 63
        GROUP BY 1
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS probe_rows,
           CAST(SUM(h.might) AS BIGINT) AS bloom_pass,
           CAST(SUM(CASE WHEN s.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS exact_rows
    FROM lineitem l
    JOIN hit h ON h.l_orderkey = l.l_orderkey
    LEFT JOIN sel s ON s.o_orderkey = l.l_orderkey
    GROUP BY 1
"""


@parity(
    "ns_sketch_bloom_semijoin",
    driver=False,  # driver slot: folded into ns_sketch_digest
    oracle=_BLOOM_ORACLE,
)
def ns_sketch_bloom_semijoin(spark, sf_dir):
    """Bloom-filter semi-join reduction, the explicit runtime-filter
    pattern: a 2^16-bit bitmap built over high-value orders, compiled into
    a literal map-side predicate, pre-filters the (big) lineitem probe with
    ZERO shuffle; per return flag the funnel reports probe rows, bloom
    passes, and true matches — the gap is the measured false-positive
    cost (~1.4% at ~6k keys / k=3). The oracle rebuilds the identical
    bitmap, so the filter's exact behavior (not a bound) is verified."""
    from ..operators.sketches import bloom_build, bloom_compile, bloom_might_contain

    orders = table(spark, sf_dir, "orders")
    # The probe predicate is md5-bound CPU work and the fixture table is one
    # parquet row group (an unsplittable single-core scan locally); spread
    # rows across cores first — at real scale the probe side arrives in
    # thousands of row groups and needs no such help (same concession as
    # parity_text._docs2). The OPERATOR stays zero-shuffle.
    li = table(spark, sf_dir, "lineitem").repartition(
        spark.sparkContext.defaultParallelism
    )
    sel = (
        orders.filter(F.col("o_totalprice") > 480000)
        .select("o_orderkey")
        .distinct()
    )
    bitmap = bloom_compile(bloom_build(sel, "o_orderkey", n_bits=_BLOOM_BITS, k=3))
    flagged = li.select(
        "l_returnflag",
        "l_orderkey",
        bloom_might_contain(bitmap, "l_orderkey", n_bits=_BLOOM_BITS, k=3)
        .cast("int")
        .alias("might"),
    )
    exact = flagged.join(
        F.broadcast(sel.withColumn("__in", F.lit(1))),
        flagged.l_orderkey == sel.o_orderkey,
        "left",
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("probe_rows"),
        F.sum("might").cast("long").alias("bloom_pass"),
        F.sum(F.coalesce(F.col("__in"), F.lit(0))).cast("long").alias("exact_rows"),
    )


# --------------------------------------------------------------------------
# Driver-slot composite: the full sketch family in ONE oracle-paired entry
# (SURVEY.md §8 50-entry driver window). Every member oracle rebuilds the
# sketch state bit-for-bit, so the digest certifies the approximations'
# exact behavior, not just error bounds.
# --------------------------------------------------------------------------

_SKETCH_DIGEST = [
    (
        "ns_sketch_hll_users",
        [("event_type", "s"), ("exact_ndv", "s"), ("hll_buckets", "s"), ("approx_ndv", "d")],
    ),
    (
        "ns_sketch_cms_tokens",
        [("lang", "s"), ("token", "s"), ("exact_cnt", "s"), ("rnk", "s"), ("cms_count", "s")],
    ),
    (
        "ns_sketch_hist_quantiles",
        [("o_orderpriority", "s"), ("q", "d"), ("n", "s"), ("approx_q", "d")],
    ),
    (
        "ns_sketch_bloom_semijoin",
        [("l_returnflag", "s"), ("probe_rows", "s"), ("bloom_pass", "s"), ("exact_rows", "s")],
    ),
]


def _sketch_digest_oracle() -> str:
    from .registry import digest_union_oracle

    return digest_union_oracle(_SKETCH_DIGEST)


@parity("ns_sketch_digest", oracle=_sketch_digest_oracle())
def ns_sketch_digest(spark, sf_dir):
    """The sketch family in one driver slot — HLL cardinality, count-min
    frequency, equi-width-histogram quantiles, and the Bloom semi-join
    funnel — each probe's full result set content-checksummed in both
    engines (the oracles rebuild identical sketch state)."""
    from .registry import digest_union

    return digest_union(spark, sf_dir, _SKETCH_DIGEST)
