"""Training-data export writer: lay curated documents out on disk as
sharded, sequence-ordered parquet — the physical counterpart of
operators/packing.py.

A training job consumes shards as independent ordered streams, so the
writer must guarantee:

- **one file per shard** (a data-loader worker maps 1:1 to a file),
- **rows inside a shard file stored in packing order** (sequence layout is
  meaningful only if the on-disk order matches the logical stream),
- **a manifest** describing every shard (docs, tokens, sequence count) so
  the loader can schedule/checkpoint without scanning data files,
- **reproducibility**: same corpus -> byte-stable shard membership and
  order on any cluster size (md5 shard hash + doc-id order, no RNG).

Spark-first shape: ``repartition(num_shards, shard)`` + per-partition sort
is ONE shuffle; each task writes its own shard file (no driver funnel).
``partitionBy('shard')`` on the writer keeps shard directories addressable
for partition-pruned reads. At 100 TB the same layout holds with thousands
of shards — shard count is the parallelism knob, and the manifest stays
proportional to shard count, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .packing import assign_sequences


def export_shards(
    df: DataFrame,
    id_col: str,
    token_col: str,
    out_dir: str,
    *,
    budget: int,
    num_shards: int,
) -> DataFrame:
    """Write ``df`` as ``out_dir/shard=N/`` parquet (one file per shard,
    rows in packing order) and return the manifest DataFrame:
    ``(shard, n_docs, n_tokens, n_sequences, first_doc, last_doc)``.

    The manifest is derived from the written data (read back), so it
    describes what is actually on disk, not what was planned.
    """
    assigned = assign_sequences(
        df, id_col, token_col, budget=budget, num_shards=num_shards
    )
    (
        assigned.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    return shard_manifest(assigned.sparkSession, out_dir, id_col, token_col)


def shard_manifest(
    spark: SparkSession, out_dir: str, id_col: str, token_col: str
) -> DataFrame:
    """Per-shard manifest of an exported directory."""
    back = spark.read.parquet(out_dir)
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_col).cast("long").alias("n_tokens"),
        F.countDistinct("seq_id").cast("long").alias("n_sequences"),
        F.min(id_col).cast("long").alias("first_doc"),
        F.max(id_col).cast("long").alias("last_doc"),
    )
