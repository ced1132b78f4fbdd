"""Parity-query registry.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
an equivalent ANSI-SQL oracle string for DuckDB. ``__spark_entry__.py``
re-exports the registry to the correctness driver.

Cross-engine determinism rules used throughout (SURVEY.md §7.4):
- per-row arithmetic stays in DOUBLE (IEEE ops are bit-identical in both
  engines), aggregate inputs are cast to DECIMAL(18,6) per row (exact sums),
  and final aggregates/decimal outputs are cast to DOUBLE on both sides —
  the driver's hasher renders DuckDB DECIMAL/HUGEINT through float64, so a
  DECIMAL final on the Spark side ("138014.000000") can never hash-match
  ("138014.0"); integer-sum finals are pinned with CAST(... AS BIGINT) in
  the oracle for the same reason (DuckDB SUM(int) is HUGEINT);
- timestamps are rendered with pinned formats (``date_format`` <->
  ``strftime``), never returned raw;
- string concatenation uses NULL-propagating forms on both sides
  (``F.concat`` <-> ``||``);
- integer hashing shared with the oracle goes through md5-hex prefix
  parsing (``scalars.md5_long``), never Spark-private hash functions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs

QueryFn = Callable[[SparkSession, str], DataFrame]

# Synthetic-row id namespace for in-query fixture twins (near-dup docs,
# shifted embeddings, re-inserted CDC keys). Offsets MUST sit beyond any
# fixture id domain at any certified scale: the original +100000 collided
# with real doc_ids at sf >= 2 (150k docs at sf3), where two docs sharing
# one id broke the id-uniqueness contract and the engines canonicalized
# the resulting multigraph differently (caught by the r12 bucketed sf3
# certification — one phantom DISTINCT row in the minhash oracle). 1e12
# clears every realistic fixture (sf30000's 1.5e9 docs included) while
# derived surrogates (doc_id * 1e5 + chunk_idx) stay far inside int64.
SYNTH_ID_OFFSET = 1_000_000_000_000

# Driver-facing surface: the correctness driver verifies the FIRST 50
# oracle-paired entries in registration order (SURVEY.md §8) — keep this
# dict at <= 50 total entries so nothing silently falls outside the window.
QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}

# Full surface including probes folded into composite queries: bench.py and
# the local test harness run these individually even when the driver sees
# only the composite.
ALL_QUERIES: dict[str, QueryFn] = {}
ALL_ORACLE_SQL: dict[str, str] = {}


def parity(
    name: str, oracle: str | None = None, *, driver: bool = True
) -> Callable[[QueryFn], QueryFn]:
    """Register a parity query; ``oracle`` is the DuckDB-ANSI twin.

    ``driver=False`` keeps the query out of the driver-facing registry (it
    is verified via a composite instead) while leaving it runnable for
    bench.py and local tests.
    """

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        ALL_QUERIES[name] = wrapped
        if oracle is not None:
            ALL_ORACLE_SQL[name] = oracle
        if driver:
            QUERIES[name] = wrapped
            if oracle is not None:
                ORACLE_SQL[name] = oracle
        return wrapped

    return deco


# --------------------------------------------------------------------------
# Cross-engine digest: folds a probe's full result set into one
# (probe, row_cnt, content_sum) row, computed identically in Spark and
# DuckDB — md5 of a canonical row rendering, 40-bit prefix parsed to int,
# summed order-insensitively. Any value/row change flips content_sum, so a
# digest composite certifies the same values as the individual probes while
# occupying one driver slot (SURVEY.md §8: the driver checks only the first
# 50 oracle-paired registrations).
# --------------------------------------------------------------------------

_SEP = "\x1f"
_NUL = "\x01"
_DIGEST_P = 2_147_483_647  # Mersenne-31: per-row digest-hash modulus


def digest_frame(df: DataFrame, probe: str) -> DataFrame:
    """Spark side: one (probe, row_cnt, content_sum) row for ``df``.

    Column render rules (mirrored by ``digest_sql``): doubles/decimals pin
    through DECIMAL(28,6) (fixed 6-digit rendering — both engines agree,
    unlike raw double-to-string), everything else via CAST AS STRING, NULL
    as a sentinel byte. Column order = the probe's select order.
    """
    from pyspark.sql import functions as F

    parts = []
    for c, t in df.dtypes:
        col = F.col(c)
        if t == "double" or t == "float" or t.startswith("decimal"):
            rendered = col.cast("decimal(28,6)").cast("string")
        else:
            rendered = col.cast("string")
        parts.append(F.coalesce(rendered, F.lit(_NUL)))
    line = F.concat_ws(_SEP, *parts)
    # Per-row hash reduced mod 2^31-1 BEFORE the sum: a raw 40-bit hash
    # summed as int64 overflows (ANSI: throws) past ~2^23 rows — hit for
    # real by the sf1 simhash pair set (17M+ rows). 31-bit terms give
    # ~4e9 rows of headroom while the sum stays a driver-exact BIGINT
    # (a DECIMAL final is NOT an option: the driver's arrow fetch
    # converts DuckDB decimals to float, losing exactness above 2^53 —
    # see tests/oracle_compare.py::_fetch_oracle).
    h = (
        F.conv(F.substring(F.md5(line), 1, 10), 16, 10).cast("long")
        % F.lit(_DIGEST_P)
    )
    return (
        df.select(h.alias("__h"))
        .agg(
            F.count(F.lit(1)).alias("row_cnt"),
            F.coalesce(F.sum("__h"), F.lit(0)).alias("content_sum"),
        )
        .select(F.lit(probe).alias("probe"), "row_cnt", "content_sum")
    )


def digest_sql(probe: str, sql: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`digest_frame` over ``sql``'s result.

    ``cols`` lists (column, kind) in the probe's output order; kind "d"
    renders through DECIMAL(28,6), anything else through CAST AS VARCHAR.
    """
    renders = []
    for c, kind in cols:
        r = (
            f"CAST(CAST({c} AS DECIMAL(28,6)) AS VARCHAR)"
            if kind == "d"
            else f"CAST({c} AS VARCHAR)"
        )
        renders.append(f"COALESCE({r}, chr(1))")
    line = " || chr(31) || ".join(renders)
    return (
        f"SELECT '{probe}' AS probe, COUNT(*) AS row_cnt, "
        f"CAST(COALESCE(SUM(('0x' || substr(md5({line}), 1, 10))::BIGINT % {_DIGEST_P}), 0) AS BIGINT)"
        f" AS content_sum FROM ({sql}) __probe"
    )


def digest_cols_for(df: DataFrame) -> list[tuple[str, str]]:
    """Derive the ``digest_sql`` (column, kind) list from a Spark result
    frame — kind "d" exactly where :func:`digest_frame` renders through
    DECIMAL(28,6) (double/float/decimal dtypes), "s" otherwise. Keeps the
    bucketed certification harness free of hand-maintained column lists.

    Raises for dtypes outside the proven cross-engine string-rendering
    set: array/timestamp/map/struct outputs render differently between
    Spark and DuckDB under raw CAST AS STRING, so a family with such a
    result schema must fail loudly at setup instead of producing a
    confusing digest mismatch (such families pin their own rendering —
    e.g. decimal checksums, epoch micros — before registering). Boolean
    is in the proven set: both engines render "true"/"false" (certified
    by the green ns_vector_digest composite's is_kept member)."""
    _OK_S = {"string", "boolean", "tinyint", "smallint", "int", "bigint", "long"}
    out = []
    for c, t in df.dtypes:
        if t in ("double", "float") or t.startswith("decimal"):
            out.append((c, "d"))
        elif t in _OK_S:
            out.append((c, "s"))
        else:
            raise TypeError(
                f"digest_cols_for: column {c!r} has dtype {t!r}, outside "
                "the proven cross-engine rendering set (integral/string/"
                "double/decimal) — pin its rendering in the query before "
                "certifying it bucketed"
            )
    return out


def bucket_expr_sql(col: str, n_buckets: int) -> str:
    """DuckDB rendering of the certification bucket id for ``col`` —
    16-bit md5-hex prefix of the NULL-safe string rendering, mod
    ``n_buckets``. Mirrored bit-for-bit by the Spark side of
    :func:`digest_frame_bucketed`; integer string renderings agree
    between the engines, so the same row lands in the same bucket. A
    NULL bucket column coalesces to the sentinel byte BEFORE hashing —
    without it the row would land in bucket NULL on the Spark side and
    match no ``= k`` filter on the oracle side, silently escaping
    certification (ADVICE r12)."""
    return (
        f"(('0x' || substr(md5(COALESCE(CAST({col} AS VARCHAR), chr(1))), 1, 4))::BIGINT"
        f" % {n_buckets})"
    )


def digest_frame_bucketed(
    df: DataFrame, bucket_col: str, n_buckets: int
) -> DataFrame:
    """Per-bucket split of :func:`digest_frame`: (bucket, row_cnt,
    content_sum) with the SAME row rendering and hash — so the sum of
    per-bucket (row_cnt, content_sum) equals the whole-frame digest by
    construction. Purpose: single-node-oracle certification ABOVE the
    oracle's memory ceiling — DuckDB evaluates the oracle one bucket at a
    time (``bucket_expr_sql`` filter pushed into the heavy intermediate)
    while Spark digests the full result once, grouped by the same bucket
    id (VERDICT r11 next-step #2). The bucket column coalesces NULL to
    the sentinel byte before hashing (mirrors ``bucket_expr_sql``), so
    NULL-keyed rows land in a real, compared bucket instead of bucket
    NULL (ADVICE r12)."""
    from pyspark.sql import functions as F

    parts = []
    for c, t in df.dtypes:
        col = F.col(c)
        if t == "double" or t == "float" or t.startswith("decimal"):
            rendered = col.cast("decimal(28,6)").cast("string")
        else:
            rendered = col.cast("string")
        parts.append(F.coalesce(rendered, F.lit(_NUL)))
    line = F.concat_ws(_SEP, *parts)
    h = (
        F.conv(F.substring(F.md5(line), 1, 10), 16, 10).cast("long")
        % F.lit(_DIGEST_P)
    )
    b = (
        F.conv(
            F.substring(
                F.md5(
                    F.coalesce(F.col(bucket_col).cast("string"), F.lit(_NUL))
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(n_buckets)
    )
    return (
        df.select(b.alias("bucket"), h.alias("__h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("row_cnt"),
            F.coalesce(F.sum("__h"), F.lit(0)).alias("content_sum"),
        )
    )


def digest_sql_bucketed(
    sql: str,
    cols: list[tuple[str, str]],
    bucket_col: str,
    n_buckets: int,
    bucket: int,
) -> str:
    """DuckDB twin of ONE bucket of :func:`digest_frame_bucketed` —
    deliberately one query per bucket (not GROUP BY bucket) so the oracle
    engine holds only a 1/``n_buckets`` slice of the heavy intermediate
    at a time; the bucket filter sits directly over the oracle body and
    pushes into self-join sides keyed by ``bucket_col``."""
    inner = (
        f"SELECT * FROM ({sql}) __o "
        f"WHERE {bucket_expr_sql(bucket_col, n_buckets)} = {bucket}"
    )
    renders = []
    for c, kind in cols:
        r = (
            f"CAST(CAST({c} AS DECIMAL(28,6)) AS VARCHAR)"
            if kind == "d"
            else f"CAST({c} AS VARCHAR)"
        )
        renders.append(f"COALESCE({r}, chr(1))")
    line = " || chr(31) || ".join(renders)
    return (
        f"SELECT {bucket} AS bucket, COUNT(*) AS row_cnt, "
        f"CAST(COALESCE(SUM(('0x' || substr(md5({line}), 1, 10))::BIGINT % {_DIGEST_P}), 0) AS BIGINT)"
        f" AS content_sum FROM ({inner}) __probe"
    )


def digest_union(
    spark: SparkSession, sf_dir: str, members: list[tuple[str, list[tuple[str, str]]]]
) -> DataFrame:
    """Union of :func:`digest_frame` rows for the named registered probes —
    the body of a digest composite driver entry (one slot certifies every
    member's full result set)."""
    out = None
    for name, _cols in members:
        d = digest_frame(ALL_QUERIES[name](spark, sf_dir), name)
        out = d if out is None else out.unionByName(d)
    return out


def digest_union_oracle(members: list[tuple[str, list[tuple[str, str]]]]) -> str:
    """DuckDB twin of :func:`digest_union` from the members' registered
    oracles (member oracles must be registered before the composite)."""
    return "\nUNION ALL\n".join(
        digest_sql(name, ALL_ORACLE_SQL[name], cols) for name, cols in members
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table (TESTDATA.md).

    The driver's parquet timestamp encoding has varied across rounds —
    normalize ``events.ts`` to a plain TIMESTAMP either way:

    - TIMESTAMP(NANOS) arrives as nano-epoch longs (``nanosAsLong`` in
      session.RUNTIME_CONFS); convert back to microsecond timestamps with
      exact integer division — a double division would lose sub-second
      precision at 1.7e18 nanos.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ;
      cast to TIMESTAMP under the pinned UTC session zone (same instant,
      and ``unix_micros``/``window`` consumers require non-NTZ input).
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
