"""The remaining stateful sinks on the manifest (object-store) commit
protocol: IVF index (keyed fold) and DSIR feature counts (ledgered additive
fold). With dedup/CDC (live drain), SCD2, and the scoped-merge suite already
proven, this closes the claim that EVERY sink runs unchanged on either
physical layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_ingestion_canonical_snowflake_spark.operators.importance import (
    hashed_ngram_features,
)
from financial_data_ingestion_canonical_snowflake_spark.operators.manifest import (
    ManifestTable,
)
from financial_data_ingestion_canonical_snowflake_spark.operators.merge import (
    PART_COL,
)
from financial_data_ingestion_canonical_snowflake_spark.operators.similarity import (
    assign_to_centroids,
)
from financial_data_ingestion_canonical_snowflake_spark.operators.storage import (
    ParquetTable,
)
from financial_data_ingestion_canonical_snowflake_spark.streaming.importance_stream import (
    ImportanceFeatureSink,
)
from financial_data_ingestion_canonical_snowflake_spark.streaming.ivf_stream import (
    IvfIndexSink,
)

_EMB_SCHEMA = "vec_id long, embedding array<float>"


def _emb_rows(ids):
    return [(i, [float(i % 7) + 0.25, float(i % 3) - 1.5, 0.5]) for i in ids]


def test_ivf_index_sink_on_manifest(spark, tmp_path):
    """Keyed IVF fold + replay + re-ingest update, manifest-committed."""
    index_t = ManifestTable(
        str(tmp_path / "index"), partition_by=[PART_COL], n_buckets=4
    )
    cents_t = ParquetTable(str(tmp_path / "cents"))
    cents = spark.createDataFrame(_emb_rows(range(4)), _EMB_SCHEMA)
    cents_t.overwrite_atomic(cents)
    sink = IvfIndexSink(index_t, cents_t)

    b1 = spark.createDataFrame(_emb_rows(range(0, 30)), _EMB_SCHEMA)
    b2 = spark.createDataFrame(_emb_rows(range(30, 50)), _EMB_SCHEMA)
    sink(b1, 0)
    sink(b2, 1)
    union = spark.createDataFrame(_emb_rows(range(0, 50)), _EMB_SCHEMA)
    want = (
        assign_to_centroids(union, cents)
        .join(union, "vec_id")
        .select("vec_id", "centroid_id")
    )
    got = sink.index(spark).select("vec_id", "centroid_id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    before = sorted(map(tuple, sink.index(spark).collect()))
    sink(b2, 1)  # replay: keyed merge is a no-op
    assert sorted(map(tuple, sink.index(spark).collect())) == before


def test_importance_feature_sink_on_manifest(spark, tmp_path):
    """Ledgered additive feature fold, manifest-committed: stream-folded
    counts equal the batch aggregate, and a replayed batch does not
    double-count (the per-bucket ledger commits atomically with its
    bucket via the manifest PUT)."""
    table = ManifestTable(
        str(tmp_path / "features"), partition_by=[PART_COL], n_buckets=4
    )
    sink = ImportanceFeatureSink(table, hash_bits=8)
    rows1 = [(1, "the quick brown fox"), (2, "lazy dog sleeps here")]
    rows2 = [(3, "the quick red fox"), (4, "zzz qqq www eee")]
    b1 = spark.createDataFrame(rows1, "doc_id long, text string")
    b2 = spark.createDataFrame(rows2, "doc_id long, text string")
    sink(b1, 0)
    sink(b2, 1)

    docs = spark.createDataFrame(rows1 + rows2, "doc_id long, text string")
    want = (
        hashed_ngram_features(docs, "doc_id", "text", hash_bits=8)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    counts = lambda df: sorted(  # noqa: E731
        map(tuple, df.select("bucket", "cnt").collect())
    )
    assert counts(sink.feature_table(spark)) == counts(want)
    sink(b2, 1)  # replay: additive fold must be ledger-skipped
    assert counts(sink.feature_table(spark)) == counts(want)
