"""Bucketed-digest certification machinery (VERDICT r11 next-step #2).

``digest_frame_bucketed`` / ``digest_sql_bucketed`` split a probe's
cross-engine digest into per-bucket partials so the single-node DuckDB
oracle can certify document self-join families ABOVE its whole-query
memory ceiling — one bucket of the heavy intermediate at a time. Proven
here at sf0.01 on a pair family (bucketed by id_a) and a per-doc family
(bucketed by doc_id):

1. the per-bucket partials sum EXACTLY to the whole-frame digest
   (split is lossless by construction), and
2. every bucket's (row_cnt, content_sum) matches DuckDB evaluating the
   registered oracle under the same bucket filter — the cross-engine
   equality the sf3 harness (tools/certify_bucketed.py) scales up.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

entrymod.queries()  # populate the registry

from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (  # noqa: E402
    ALL_ORACLE_SQL,
    ALL_QUERIES,
    digest_cols_for,
    digest_frame,
    digest_frame_bucketed,
    digest_sql_bucketed,
)

from .oracle_compare import duckdb_conn

N_BUCKETS = 4

_FAMILIES = [
    # (query, bucket column) — a self-join pair family and a map-side
    # per-doc family; both bucket columns key the heavy side
    ("ns_dedup_ngram_jaccard_capped", "id_a"),
    ("ns_text_c4_filters", "doc_id"),
]


@pytest.mark.parametrize("name,bucket_col", _FAMILIES, ids=[f[0] for f in _FAMILIES])
def test_bucketed_digest_certifies_cross_engine(spark, sf_oracle, name, bucket_col):
    df = ALL_QUERIES[name](spark, sf_oracle)
    cols = digest_cols_for(df)

    whole = digest_frame(df, name).collect()[0]
    parts = {
        r.bucket: (r.row_cnt, r.content_sum)
        for r in digest_frame_bucketed(df, bucket_col, N_BUCKETS).collect()
    }
    # 1. lossless split: partials sum to the whole digest
    assert sum(p[0] for p in parts.values()) == whole.row_cnt
    assert sum(p[1] for p in parts.values()) == whole.content_sum
    assert whole.row_cnt > 0, f"{name}: empty result certifies nothing"

    # NULL-safe bucketing (ADVICE r12): no row may land in bucket NULL —
    # such rows match no oracle-side `= k` filter and escape certification
    assert None not in parts, f"{name}: rows escaped into bucket NULL"

    # 2. cross-engine equality bucket by bucket (one oracle query per
    # bucket — the memory-bounded evaluation mode the harness relies on)
    con = duckdb_conn(sf_oracle)
    ddb_rows = 0
    try:
        for k in range(N_BUCKETS):
            got = con.execute(
                digest_sql_bucketed(
                    ALL_ORACLE_SQL[name], cols, bucket_col, N_BUCKETS, k
                )
            ).fetchone()
            ddb_rows += got[1]
            want = parts.get(k, (0, 0))
            assert (got[1], got[2]) == want, (
                f"{name} bucket {k}: spark {want} != duckdb {got[1:]}"
            )
    finally:
        con.close()
    # totals cross-check (ADVICE r12 defense in depth): per-bucket equality
    # certifies everything only if every row landed in a compared bucket
    assert ddb_rows == whole.row_cnt


def test_null_bucket_key_rows_are_certified(spark, sf_oracle):
    """A NULL bucket column must land in a real bucket — identically on
    both engines — not in bucket NULL where no `= k` filter ever compares
    it (the ADVICE r12 escape)."""
    from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (
        bucket_expr_sql,
    )

    from pyspark.sql import functions as F

    name = "ns_text_c4_filters"
    sql = ALL_ORACLE_SQL[name]
    df = ALL_QUERIES[name](spark, sf_oracle).withColumn(
        "doc_id",
        # null out a deterministic slice of the bucket keys
        F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("doc_id")),
    )
    cols = digest_cols_for(df)
    parts = {
        r.bucket: (r.row_cnt, r.content_sum)
        for r in digest_frame_bucketed(df, "doc_id", N_BUCKETS).collect()
    }
    assert None not in parts, "NULL keys escaped into bucket NULL"
    nulled_sql = (
        f"SELECT * REPLACE (CASE WHEN doc_id % 7 = 0 THEN NULL "
        f"ELSE doc_id END AS doc_id) FROM ({sql}) __n"
    )
    con = duckdb_conn(sf_oracle)
    try:
        total = 0
        for k in range(N_BUCKETS):
            got = con.execute(
                digest_sql_bucketed(nulled_sql, cols, "doc_id", N_BUCKETS, k)
            ).fetchone()
            total += got[1]
            assert (got[1], got[2]) == parts.get(k, (0, 0))
        # every row — including the NULL-keyed ones — was compared
        assert total == sum(p[0] for p in parts.values()) == df.count()
        # and the NULL keys all share one bucket (they hash the sentinel)
        null_bucket = con.execute(
            f"SELECT DISTINCT {bucket_expr_sql('doc_id', N_BUCKETS)} "
            f"FROM ({nulled_sql}) __x WHERE doc_id IS NULL"
        ).fetchall()
        assert len(null_bucket) == 1
    finally:
        con.close()


def test_digest_cols_for_matches_frame_render(spark, sf_oracle):
    """kind 'd' exactly where digest_frame renders DECIMAL(28,6)."""
    df = ALL_QUERIES["ns_dedup_ngram_jaccard_capped"](spark, sf_oracle)
    kinds = dict(digest_cols_for(df))
    assert kinds["jaccard"] == "d"
    assert kinds["id_a"] == "s"
    assert kinds["n_common"] == "s"


def test_digest_cols_for_rejects_unproven_dtypes(spark):
    """Result schemas outside the proven rendering set fail loudly at
    setup (ADVICE r12) instead of as a confusing digest mismatch."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id"), F.array(F.col("id")).alias("arr")
    )
    with pytest.raises(TypeError, match="arr"):
        digest_cols_for(df)
    ts = spark.range(3).select(F.current_timestamp().alias("ts"))
    with pytest.raises(TypeError, match="ts"):
        digest_cols_for(ts)
    ok = spark.range(3).select(
        F.col("id"),
        (F.col("id") > 1).alias("b"),
        F.col("id").cast("double").alias("d"),
        F.col("id").cast("string").alias("s"),
    )
    assert [k for _c, k in digest_cols_for(ok)] == ["s", "s", "d", "s"]
