"""Relational-surface widening: multi-dimensional aggregation (CUBE /
GROUPING SETS), semi/anti joins, pivot/unpivot, ranked window analytics,
hopping-window batch aggregation, and a TPC-H-Q5-shaped multi-way join.

The reference pipeline never needs these (its SQL stays on plain GROUP BY /
equi-joins — SURVEY.md §2.3-2.5), but a user switching an analytics workload
onto this engine hits them immediately; each is expressed with the built-in
Catalyst operator (``cube``, ``left_semi``/``left_anti``, ``pivot`` /
``unpivot``, ranking windows, sliding ``F.window``) so the optimizer keeps
whole-stage codegen and partial aggregation.

All queries register ``driver=False`` and are value-certified through the
``probe_digest_relational`` composite (registry.digest_frame cross-engine
checksum) — SURVEY.md §8 driver-window discipline.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import SYNTH_ID_OFFSET, parity, table


def _dec(col):
    """Pin a per-row double into DECIMAL(18,6) before SUM (registry rules)."""
    return col.cast("decimal(18,6)")


@parity(
    "ns_rollup_cube",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS VARCHAR) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def ns_rollup_cube(spark, sf_dir):
    """Multi-dimensional aggregation via CUBE with grouping_id — one Expand +
    one aggregate exchange; subtotal and grand-total rows come from the same
    scan, not re-reads. Spark's ``grouping_id`` bit order (first cube column
    = most significant) is mirrored as GROUPING(a)*2 + GROUPING(b) in the
    oracle. total_price is a DECIMAL(28,6)-string final — the cube's grand
    total crosses 2^53 scale-6 units at sf1, past a double's exactness
    (the a1_pricing_summary discipline)."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("order_cnt"),
        F.sum(_dec(F.col("o_totalprice")))
        .cast("decimal(28,6)")
        .cast("string")
        .alias("total_price"),
    )


@parity(
    "ns_semi_anti_join",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    SELECT c_mktsegment, 'active' AS cohort, CAST(COUNT(*) AS BIGINT) AS customer_cnt
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    UNION ALL
    SELECT c_mktsegment, 'dormant', CAST(COUNT(*) AS BIGINT)
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def ns_semi_anti_join(spark, sf_dir):
    """LEFT SEMI / LEFT ANTI joins (EXISTS / NOT EXISTS): active vs dormant
    customers per market segment. Semi/anti never materialize the probe
    side's columns — the shuffle carries only the join key, and a broadcast
    of the distinct key set serves both cohorts from one orders scan."""
    c = table(spark, sf_dir, "customer")
    keys = table(spark, sf_dir, "orders").select("o_custkey").distinct()
    cond = c.c_custkey == keys.o_custkey
    active = (
        c.join(keys, cond, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customer_cnt"))
        .select("c_mktsegment", F.lit("active").alias("cohort"), "customer_cnt")
    )
    dormant = (
        c.join(keys, cond, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customer_cnt"))
        .select("c_mktsegment", F.lit("dormant").alias("cohort"), "customer_cnt")
    )
    return active.unionByName(dormant)


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@parity(
    "ns_pivot_unpivot",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    SELECT user_id % 10 AS user_bucket, event_type,
           CAST(COUNT(*) AS BIGINT) AS event_cnt
    FROM events
    WHERE user_id IS NOT NULL
      AND event_type IN ('click', 'error', 'purchase', 'signup', 'view')
    GROUP BY 1, 2
    """,
)
def ns_pivot_unpivot(spark, sf_dir):
    """PIVOT then UNPIVOT round-trip: event counts per user bucket pivot into
    one column per event type (explicit value list — deterministic schema,
    no discovery pass) and melt back with ``unpivot``. The oracle is the
    plain two-key GROUP BY the round-trip must reproduce, so hash parity
    certifies both directions. Empty melted cells (COALESCE 0 in the wide
    form) are dropped on unpivot to match the GROUP BY, which has no row for
    an absent (bucket, type) pair."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    wide = (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    wide = wide.select(
        "user_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )
    return (
        wide.unpivot(
            ids=["user_bucket"],
            values=_EVENT_TYPES,
            variableColumnName="event_type",
            valueColumnName="event_cnt",
        )
        .filter(F.col("event_cnt") > 0)
    )


@parity(
    "ns_window_analytics",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    SELECT event_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS BIGINT) AS micros_since_prev,
           CAST(lead(epoch_us(ts)) OVER w - epoch_us(ts) AS BIGINT) AS micros_until_next,
           first_value(event_type) OVER w AS first_event_type
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def ns_window_analytics(spark, sf_dir):
    """Ranked window analytics per user session stream: row_number, ntile
    quartiles, lag/lead event gaps (integer micros — IEEE-free), and
    first_value. All five functions share ONE window spec, so Catalyst plans
    a single sort+exchange on user_id; the deterministic (ts, event_id)
    order makes every output engine-exact."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts"))
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            (us - F.lag(us).over(w)).alias("micros_since_prev"),
            (F.lead(us).over(w) - us).alias("micros_until_next"),
            F.first(F.col("event_type")).over(w).alias("first_event_type"),
        )
    )


@parity(
    "ns_sliding_window_agg",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    WITH base AS (
        SELECT epoch_us(ts) AS us, event_type, value
        FROM events WHERE ts IS NOT NULL
    ),
    hopped AS (
        SELECT ((us // 300000000) - k) * 300000000 AS ws_us, event_type, value
        FROM base CROSS JOIN (VALUES (0), (1)) offsets(k)
    )
    SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS event_cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
    FROM hopped GROUP BY 1, 2
    """,
)
def ns_sliding_window_agg(spark, sf_dir):
    """Hopping-window aggregation in BATCH (10-minute windows sliding every
    5): ``F.window`` expands each event into the two windows covering it
    (epoch-aligned starts — mirrored in the oracle as the k∈{0,1} offset
    union), then one partial-aggregated exchange on (window, type). The same
    expression drives the streaming twin (streaming/ingest.py windowed
    aggregates); batch parity here pins the window-assignment semantics."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.sum(_dec(F.col("value"))).cast("double").alias("value_sum"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "event_cnt",
            "value_sum",
        )
    )


@parity(
    "ns_tpch_q5_regional_volume",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue,
           CAST(COUNT(*) AS BIGINT) AS line_cnt
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def ns_tpch_q5_regional_volume(spark, sf_dir):
    """TPC-H Q5 shape (local-supplier volume): a 6-table join where the
    lineitem⋈orders⋈customer chain is fact-sized (hinted broadcasts only on
    the true dimensions supplier/nation/region — customer is left to AQE,
    which broadcasts it at fixture scale and shuffles it at real scale),
    and the region filter prunes through the broadcast before the fact
    scan aggregates. The c_nationkey = s_nationkey "local supplier"
    predicate rides the supplier join, never a separate pass."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer is FACT-sized (scales with the corpus) — no broadcast
        # hint; AQE promotes it at fixture scale, shuffles it at real scale
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec(revenue)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@parity(
    "ns_fuzzy_match_pairs",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    WITH p AS (
        SELECT p_partkey AS id, p_name AS name,
               list_extract(string_split(p_name, ' '), -1)
                   || '|' || substr(p_name, 1, 1) AS block
        FROM part WHERE p_name IS NOT NULL
        QUALIFY COUNT(*) OVER (PARTITION BY block) <= 1000
    )
    SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS distance
    FROM p a JOIN p b ON a.block = b.block AND a.id < b.id
    WHERE abs(length(a.name) - length(b.name)) <= 2
      AND levenshtein(a.name, b.name) <= 2
    """,
)
def ns_fuzzy_match_pairs(spark, sf_dir):
    """Blocked fuzzy-match join (operators/fuzzy.py): entity-resolution
    candidates blocked on (last token, first character) — the compound key
    cuts candidates ~8x vs last-token-only at sf0.1 (25M -> 3.1M) and
    spreads the |block|² scoring across far more shuffle partitions. A
    first-character typo lands in a different block and is missed: the
    standard blocking recall tradeoff (production runs multiple blocking
    passes). Scored with built-in ``levenshtein`` (JVM codegen, exact
    integer — engine-identical by definition) behind a length-difference
    prefilter. One shuffle on the block key; never all-pairs.

    ``max_block_width=1000`` is active by default here (oracle mirrors it
    with QUALIFY): a degenerate block — one key covering a large corpus
    slice — is |block|² on a single shuffle partition at scale, the same
    hole ``max_bucket_width`` closes for LSH buckets. At this fixture's
    cardinality no block comes near the cap, so the capped and uncapped
    results are identical (the degenerate-block behavior itself is pinned
    by tests/test_fuzzy_gapfill.py's 10k-identical-names test)."""
    from ..operators.fuzzy import blocked_fuzzy_pairs

    p = table(spark, sf_dir, "part").filter(F.col("p_name").isNotNull())
    block = F.concat(
        F.element_at(F.split(F.col("p_name"), " "), -1),
        F.lit("|"),
        F.substring(F.col("p_name"), 1, 1),
    )
    return blocked_fuzzy_pairs(
        p, "p_partkey", "p_name", block, max_distance=2, max_block_width=1000
    )


_DAY_US = 86_400_000_000


@parity(
    "ns_gap_fill_ffill",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle=f"""
    WITH obs AS (
        SELECT user_id AS key,
               (epoch_us(ts)
                - (((epoch_us(ts) % {_DAY_US}) + {_DAY_US}) % {_DAY_US})) AS bucket_us,
               MAX(struct_pack(u := epoch_us(ts), o := event_id, v := value)).v AS value
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2
    ),
    runs AS (
        SELECT key, bucket_us, value,
               lead(bucket_us) OVER (PARTITION BY key ORDER BY bucket_us) AS nb
        FROM obs
    )
    SELECT key, t.b AS bucket_us, value, (t.b = runs.bucket_us) AS is_observed
    FROM runs, UNNEST(generate_series(
        bucket_us, coalesce(nb - {_DAY_US}, bucket_us), {_DAY_US})) AS t(b)
    """,
)
def ns_gap_fill_ffill(spark, sf_dir):
    """Forward-fill gap filling onto a daily grid (operators/gapfill.py):
    per-user last-observation-carried-forward with run-length explode — no
    grid join, fan-out proportional to the output; the raw-event exchange
    is map-side-combined to one row per observed bucket and only those
    summaries re-shuffle for the lead() window. Values pass through
    untouched (no arithmetic), so doubles stay engine-exact."""
    from ..operators.gapfill import gap_fill_ffill

    return gap_fill_ffill(
        table(spark, sf_dir, "events"),
        "user_id", "ts", "value", "event_id",
        step_seconds=86_400,
    )


@parity(
    "ns_linreg_corr",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    WITH s AS (
        SELECT l_returnflag AS grp,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST((l_extendedprice * (1 - l_discount))
                             * (l_extendedprice * (1 - l_discount)) AS DECIMAL(28,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity * (l_extendedprice * (1 - l_discount)) AS DECIMAL(18,6))) AS DOUBLE) AS sxy
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              AND l_discount IS NOT NULL
        GROUP BY 1
    )
    SELECT grp, CAST(n AS BIGINT) AS n_rows,
           (n * sxy - sx * sy) / ((n * sxx - sx * sx)) AS slope,
           (sy - ((n * sxy - sx * sy) / ((n * sxx - sx * sx))) * sx) / n AS intercept,
           (n * sxy - sx * sy)
               / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr
    FROM s
    """,
)
def ns_linreg_corr(spark, sf_dir):
    """Grouped Pearson correlation + OLS fit (quantity vs line revenue per
    return flag) from EXACT decimal-pinned moment sums: per-row products
    stay in DOUBLE (IEEE multiply is engine-identical), each product is
    pinned to DECIMAL before SUM (exact, order-independent), and the
    closed-form slope/intercept/corr are a fixed double expression over
    those exact sums — so even the floating-point outputs hash-match. The
    built-in ``corr``/``covar_samp`` aggregates are NOT used on the parity
    surface (their running-merge accumulation is order-dependent); this is
    the moment-sum formulation a distributed engine wants anyway: one
    map-side-combinable aggregate, one row per group shuffled."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_discount").isNotNull()
    )
    x = F.col("l_quantity")
    y = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    s = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(_dec(x)).cast("double").alias("sx"),
        F.sum(_dec(y)).cast("double").alias("sy"),
        F.sum(_dec(x * x)).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(28,6)")).cast("double").alias("syy"),
        F.sum(_dec(x * y)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "grp",
        n.cast("long").alias("n_rows"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr"),
    )


@parity(
    "ns_calendar_rollup",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(CASE WHEN dayofweek(o_orderdate) IN (0, 6)
                     THEN 1 ELSE 0 END AS BIGINT) AS is_weekend,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders WHERE o_orderdate IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def ns_calendar_rollup(spark, sf_dir):
    """Calendar-dimension rollup: orders by truncated month, day-of-week,
    and a weekend flag — the date-function group (date_trunc, dayofweek)
    the reference never exercises but every BI workload does. Engine
    convention pinned explicitly: Spark ``dayofweek`` is 1=Sunday..7,
    DuckDB's is 0=Sunday..6 (+1 in the oracle). One aggregate exchange."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    dow = F.dayofweek("o_orderdate")
    return o.groupBy(
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd")
        .alias("order_month"),
        dow.cast("long").alias("dow"),
        F.when(dow.isin(1, 7), F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("is_weekend"),
    ).agg(
        F.count(F.lit(1)).alias("order_cnt"),
        F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total_price"),
    )


@parity(
    "ns_expectations",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    WITH agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) - SUM(CASE WHEN o_custkey IS NOT NULL
                                        THEN 1 ELSE 0 END) AS BIGINT) AS v0,
               CAST(COUNT(*) - SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                                        THEN 1 ELSE 0 END) AS BIGINT) AS v1,
               CAST(COUNT(*) - SUM(CASE WHEN o_totalprice > 0
                                        THEN 1 ELSE 0 END) AS BIGINT) AS v2,
               -- ROW() wrapper: NULL keys count as one distinct value,
               -- matching the operator's struct-counted semantics
               CAST(COUNT(*) - COUNT(DISTINCT ROW(o_orderkey)) AS BIGINT) AS v3
        FROM orders
    )
    SELECT 'custkey_not_null' AS rule, n AS n_rows, v0 AS n_violations, v0 = 0 AS passed FROM agg
    UNION ALL SELECT 'status_accepted', n, v1, v1 = 0 FROM agg
    UNION ALL SELECT 'totalprice_positive', n, v2, v2 = 0 FROM agg
    UNION ALL SELECT 'orderkey_unique', n, v3, v3 = 0 FROM agg
    """,
)
def ns_expectations(spark, sf_dir):
    """Declarative data-quality expectations (operators/expectations.py):
    not-null, accepted-values, range, and key-uniqueness rules evaluated
    in ONE aggregate pass (conditional sums + a distinct count), exploded
    into one report row per rule. NULL predicate results count as
    violations — a NULL comparison is a failed expectation, not a pass."""
    from ..operators.expectations import check_expectations

    o = table(spark, sf_dir, "orders")
    return check_expectations(
        o,
        rules=[
            ("custkey_not_null", F.col("o_custkey").isNotNull()),
            ("status_accepted", F.col("o_orderstatus").isin("O", "F", "P")),
            ("totalprice_positive", F.col("o_totalprice") > 0),
        ],
        unique_keys=[("orderkey_unique", ["o_orderkey"])],
    )


@parity(
    "ns_scd2_dimension",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    WITH src AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events WHERE user_id IS NOT NULL
    ),
    chg AS (
        SELECT user_id, event_type, ts, event_id FROM src
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
           CAST(row_number() OVER w AS BIGINT) AS version_n,
           event_type AS state,
           CAST(epoch_us(ts) AS BIGINT) AS eff_from_us,
           CAST(lead(epoch_us(ts)) OVER w AS BIGINT) AS eff_to_us,
           CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_current
    FROM chg
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ns_scd2_dimension(spark, sf_dir):
    """Slowly-changing-dimension type-2 build (operators/scd.py
    scd2_build) from the events change stream: per user, consecutive
    equal states collapse (lag), each surviving change opens a version
    effective [eff_from, eff_to) with eff_to = the next change's
    timestamp (lead) and NULL marking the current version; event_id
    breaks timestamp ties. One shared (user_id) exchange; epoch-micro
    integers keep the surface engine-exact."""
    from ..operators.scd import scd2_build

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return scd2_build(ev, "user_id", "event_type", "ts", "event_id")


@parity(
    "ns_rolling_range_agg",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS cnt_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
               AS value_sum_1h
    FROM events WHERE user_id IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def ns_rolling_range_agg(spark, sf_dir):
    """Time-range rolling window (RANGE BETWEEN INTERVAL '1 hour' PRECEDING):
    per-user trailing-hour event count and spend at every event. The frame
    is value-based (epoch micros), not row-based — gaps and ties behave
    identically in both engines because RANGE includes all order-key peers.
    One (user_id)-partitioned sort; Spark's sliding frame replays the
    buffered frame when its lower bound advances (no retraction), so cost
    is O(rows x avg frame width) — bounded here by an hour of per-user
    events, the practical case for trailing-window features."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    tsu = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(tsu)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("cnt_1h"),
        F.sum(_dec(F.col("value"))).over(w).cast("double").alias("value_sum_1h"),
    )


@parity(
    "ns_set_ops",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    WITH o_set AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
         f_set AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT o_custkey, 'both' AS membership FROM (
        SELECT o_custkey FROM o_set INTERSECT SELECT o_custkey FROM f_set)
    UNION ALL
    SELECT o_custkey, 'open_only' FROM (
        SELECT o_custkey FROM o_set EXCEPT SELECT o_custkey FROM f_set)
    UNION ALL
    SELECT o_custkey, 'filled_only' FROM (
        SELECT o_custkey FROM f_set EXCEPT SELECT o_custkey FROM o_set)
    """,
)
def ns_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT set algebra: customers holding both open and
    filled orders vs each exclusively. Spark's ``intersect``/``subtract``
    compile to LeftSemi/LeftAnti over aggregated (distinct) inputs —
    set semantics without a manual dedupe, partial aggregation intact."""
    o = table(spark, sf_dir, "orders")
    o_set = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    f_set = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    lab = lambda df, m: df.select("o_custkey", F.lit(m).alias("membership"))  # noqa: E731
    return (
        lab(o_set.intersect(f_set), "both")
        .unionByName(lab(o_set.subtract(f_set), "open_only"))
        .unionByName(lab(f_set.subtract(o_set), "filled_only"))
    )


@parity(
    "ns_window_rank_fracs",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def ns_window_rank_fracs(spark, sf_dir):
    """Fractional ranking windows (percent_rank = (rank-1)/(n-1),
    cume_dist = peers<=row / n): per-priority price position of every
    order. The order key includes o_orderkey so ranks are tie-free and
    both engines evaluate the identical IEEE division; rendered through
    the digest's DECIMAL(28,6) pinning."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@parity(
    "ns_session_window_native",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id, epoch_us(ts) AS us,
               CAST(value AS DECIMAL(18,6)) AS val
        FROM events WHERE user_id IS NOT NULL
    ),
    lagged AS (
        SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        FROM e
    ),
    marked AS (
        -- session_window merges when the next event starts AT OR BEFORE
        -- the current window's end (inclusive — verified empirically on
        -- Spark 4.1.2: two events exactly 30 min apart form ONE session),
        -- so a new session opens only on gap > 30 min, matching the
        -- lag-based sessionizer's rule
        SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                       THEN 1 ELSE 0 END AS new_s
        FROM lagged
    ),
    sess AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS win_end,
           COUNT(*) AS n_events,
           CAST(SUM(val) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def ns_session_window_native(spark, sf_dir):
    """Spark's BUILT-IN ``session_window`` (the native alternative to the
    lag-mark sessionizer): dynamic-gap windows merged inside the aggregate
    itself — one groupBy, no window-function pre-pass, and the same
    operator works unchanged under Structured Streaming with state-store
    merging. Window end extends ``gap`` past the last event (the oracle
    mirrors MAX(ts) + 30 min); merging is INCLUSIVE at the exact-gap
    boundary (two events exactly ``gap`` apart share a session —
    empirically verified), the same rule as the lag-based twin."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec(F.col("value"))).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("win_end"),
            "n_events",
            "total_value",
        )
    )


def cdc_orders_scenario(o):
    """Deterministic 'new snapshot' of orders for the CDC parity surface:
    %13 keys deleted, %5 prices bumped +10.0 (IEEE-exact both engines),
    %17 keys re-inserted key-shifted. Shared by ns_snapshot_diff_cdc and
    the MERGE-inverse round-trip test so the two can never drift apart."""
    upd = o.filter(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + F.lit(10.0)
        ).otherwise(F.col("o_totalprice")),
    )
    ins = o.filter(F.col("o_orderkey") % 17 == 0).select(
        (F.col("o_orderkey") + SYNTH_ID_OFFSET).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    return upd.select(*o.columns).unionByName(ins)


@parity(
    "ns_snapshot_diff_cdc",
    driver=False,  # driver slot: folded into probe_digest_relational
    oracle=f"""
    WITH cols AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders
    )
    SELECT o_orderkey, 'delete' AS change_type, o_custkey, o_orderstatus,
           o_totalprice,
           CAST(epoch_us(o_orderdate) AS BIGINT) AS order_date_us,
           o_orderpriority
    FROM cols WHERE o_orderkey % 13 = 0
    UNION ALL
    SELECT o_orderkey, 'update', o_custkey, o_orderstatus,
           o_totalprice + 10.0,
           CAST(epoch_us(o_orderdate) AS BIGINT), o_orderpriority
    FROM cols WHERE o_orderkey % 13 <> 0 AND o_orderkey % 5 = 0
    UNION ALL
    SELECT o_orderkey + {SYNTH_ID_OFFSET}, 'insert', o_custkey, 'N',
           o_totalprice,
           CAST(epoch_us(o_orderdate) AS BIGINT), o_orderpriority
    FROM cols WHERE o_orderkey % 17 = 0
    """,
)
def ns_snapshot_diff_cdc(spark, sf_dir):
    """Generation-diff CDC feed (operators/merge.py snapshot_diff): one
    null-safe full-outer key join between two snapshots, change predicate
    map-side, one row per inserted/updated/deleted key (deletes carry the
    old values). The new snapshot derives in-query from orders — %13 keys
    deleted, %5 prices bumped +10.0 (IEEE-exact both engines), %17 keys
    re-inserted shifted — so the oracle can state the expected feed
    directly. The diff is the inverse of MERGE: applying it to the old
    snapshot reproduces the new one (pytest-proven round trip)."""
    from ..operators.merge import snapshot_diff

    o = table(spark, sf_dir, "orders")
    d = snapshot_diff(o, cdc_orders_scenario(o), ["o_orderkey"])
    return d.select(
        "o_orderkey",
        "change_type",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        # o_orderdate may arrive TIMESTAMP_NTZ (driver parquet encoding
        # varies — see registry.table); cast under the pinned UTC session
        # so epoch micros agree with DuckDB's naive epoch_us
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "order_date_us"
        ),
        "o_orderpriority",
    )


# Digest-member specs consumed by parity_core's probe_digest_relational.
RELATIONAL_DIGEST_MEMBERS = [
    (
        "ns_rollup_cube",
        [
            ("o_orderpriority", "s"), ("o_orderstatus", "s"), ("gid", "s"),
            # total_price is a DECIMAL-string final (2^53 discipline) —
            # render as string, not through the double pin
            ("order_cnt", "s"), ("total_price", "s"),
        ],
    ),
    (
        "ns_semi_anti_join",
        [("c_mktsegment", "s"), ("cohort", "s"), ("customer_cnt", "s")],
    ),
    (
        "ns_pivot_unpivot",
        [("user_bucket", "s"), ("event_type", "s"), ("event_cnt", "s")],
    ),
    (
        "ns_window_analytics",
        [
            ("event_id", "s"), ("user_id", "s"), ("rn", "s"), ("quartile", "s"),
            ("micros_since_prev", "s"), ("micros_until_next", "s"),
            ("first_event_type", "s"),
        ],
    ),
    (
        "ns_sliding_window_agg",
        [("win_start", "s"), ("event_type", "s"), ("event_cnt", "s"), ("value_sum", "d")],
    ),
    (
        "ns_tpch_q5_regional_volume",
        [("n_name", "s"), ("revenue", "d"), ("line_cnt", "s")],
    ),
    (
        "ns_fuzzy_match_pairs",
        [
            ("id_a", "s"), ("id_b", "s"), ("name_a", "s"), ("name_b", "s"),
            ("distance", "s"),
        ],
    ),
    (
        "ns_gap_fill_ffill",
        [("key", "s"), ("bucket_us", "s"), ("value", "d"), ("is_observed", "s")],
    ),
    (
        "ns_linreg_corr",
        [
            ("grp", "s"), ("n_rows", "s"), ("slope", "d"), ("intercept", "d"),
            ("corr", "d"),
        ],
    ),
    (
        "ns_calendar_rollup",
        [
            ("order_month", "s"), ("dow", "s"), ("is_weekend", "s"),
            ("order_cnt", "s"), ("total_price", "d"),
        ],
    ),
    (
        "ns_expectations",
        [("rule", "s"), ("n_rows", "s"), ("n_violations", "s"), ("passed", "s")],
    ),
    (
        "ns_scd2_dimension",
        [
            ("user_id", "s"), ("version_n", "s"), ("state", "s"),
            ("eff_from_us", "s"), ("eff_to_us", "s"), ("is_current", "s"),
        ],
    ),
    (
        "ns_rolling_range_agg",
        [
            ("event_id", "s"), ("user_id", "s"), ("cnt_1h", "s"),
            ("value_sum_1h", "d"),
        ],
    ),
    (
        "ns_snapshot_diff_cdc",
        [
            ("o_orderkey", "s"), ("change_type", "s"), ("o_custkey", "s"),
            ("o_orderstatus", "s"), ("o_totalprice", "d"),
            ("order_date_us", "s"), ("o_orderpriority", "s"),
        ],
    ),
    ("ns_set_ops", [("o_custkey", "s"), ("membership", "s")]),
    (
        "ns_session_window_native",
        [
            ("user_id", "s"), ("win_start", "s"), ("win_end", "s"),
            ("n_events", "s"), ("total_value", "d"),
        ],
    ),
    (
        "ns_window_rank_fracs",
        [("o_orderkey", "s"), ("o_orderpriority", "s"), ("pr", "d"), ("cd", "d")],
    ),
]
