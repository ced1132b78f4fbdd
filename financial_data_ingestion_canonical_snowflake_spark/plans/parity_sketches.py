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


@parity("ns_sketch_hll_users", oracle=_HLL_ORACLE)
def ns_sketch_hll_users(spark, sf_dir):
    """Distinct users per event type two ways: exact COUNT(DISTINCT) and the
    HLL sketch — the oracle recomputes the sketch registers bit-for-bit, so
    the approximation itself is value-verified, not just bounded."""
    ev = table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_ndv")
    )
    approx = sk.hll_ndv(ev, ["event_type"], "user_id")
    return exact.join(approx, "event_type").select(
        "event_type", "exact_ndv", "hll_buckets", "approx_ndv"
    )
