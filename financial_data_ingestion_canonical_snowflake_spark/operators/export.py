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


def export_shards_jsonl(
    df: DataFrame,
    id_col: str,
    token_col: str,
    text_col: str,
    out_dir: str,
    *,
    budget: int,
    num_shards: int,
) -> DataFrame:
    """JSONL variant of :func:`export_shards`: one newline-delimited-JSON
    text file per shard under ``out_dir/shard=N/``, rows in packing order —
    the interchange format most training data-loaders consume directly.

    Same single-shuffle layout as the parquet writer (``repartition`` on
    shard + per-partition sort); a shard's rows always live in one task, so
    each ``shard=N`` directory gets exactly one file even when two shards
    hash to the same partition. Returns the manifest derived from the
    JSONL read back off disk (same schema as :func:`shard_manifest`), so a
    green manifest certifies the serialize→write→discover→parse loop, not
    just the plan.
    """
    assigned = assign_sequences(
        df, id_col, token_col, budget=budget, num_shards=num_shards
    )
    line = F.to_json(F.struct(id_col, "seq_id", token_col, text_col))
    (
        assigned.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .select(F.col("shard"), line.alias("value"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .text(out_dir)
    )
    return jsonl_manifest(
        assigned.sparkSession, out_dir, id_col, token_col,
        schema=f"{id_col} long, seq_id long, {token_col} long, {text_col} string",
    )


def jsonl_manifest(
    spark: SparkSession, out_dir: str, id_col: str, token_col: str, *, schema: str
) -> DataFrame:
    """Per-shard manifest of an exported JSONL directory (partition
    discovery supplies ``shard``).

    ``n_docs`` counts only lines that PARSE under ``schema``; a corrupt or
    truncated line lands in ``bad_lines`` instead, so a manifest whose
    totals reconcile cannot be hiding unparseable rows (callers asserting
    ``sum(n_docs) == corpus`` would otherwise pass while a training
    data-loader crashes on the broken line)."""
    back = spark.read.text(out_dir).select(
        "shard", F.from_json("value", schema).alias("j")
    )
    parsed = F.col("j").isNotNull()
    return back.groupBy("shard").agg(
        F.sum(parsed.cast("long")).cast("long").alias("n_docs"),
        F.sum((~parsed).cast("long")).cast("long").alias("bad_lines"),
        F.sum(f"j.{token_col}").cast("long").alias("n_tokens"),
        F.countDistinct("j.seq_id").cast("long").alias("n_sequences"),
        F.min(f"j.{id_col}").cast("long").alias("first_doc"),
        F.max(f"j.{id_col}").cast("long").alias("last_doc"),
    )
