"""Deterministic sequence packing: assign documents to fixed token-budget
training sequences.

Causal-LM pre-training consumes a continuous token stream chopped into
fixed-length sequences; the packer's job is to lay documents into that
stream deterministically so every re-run (and every engine) produces the
same sequence boundaries. This is the streaming variant (documents are laid
end-to-end in a canonical order; a document whose span crosses a boundary
simply starts its sequence at the bin where its first token lands) — the
shape used by block-packing data loaders, not bin-packing solvers.

Spark-first shape
-----------------
One shuffle total. Documents hash into ``num_shards`` independent streams
(md5-deterministic, engine-portable — shards are what a 1000-executor
cluster parallelizes over, so sequence ids are stable under any cluster
size), a running token offset is a window cumulative sum within the shard,
and ``seq_id = floor(offset_before / budget)``. The per-sequence rollup
groups on (shard, seq_id): HashPartitioning(shard) from the window already
satisfies the clustered distribution of the groupBy, so Catalyst plans NO
second exchange — window + rollup ride the same shuffle.

At 100 TB the only scale knob is ``num_shards`` (shard count bounds window
partition size; thousands of shards keep each sort in-memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scalars import md5_long


def assign_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    *,
    budget: int,
    num_shards: int,
) -> DataFrame:
    """Per-document sequence assignment: adds ``shard``, ``token_offset``
    (tokens laid before this doc within its shard) and ``seq_id``.

    Order within a shard is ascending ``id_col`` — total, deterministic,
    cross-engine (no RNG, no timestamps).
    """
    shard = md5_long(F.col(id_col).cast("string"), modulus=num_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("shard", shard)
        .withColumn(
            "token_offset",
            F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "seq_id", F.floor(F.col("token_offset") / F.lit(budget)).cast("long")
        )
    )


def pack_summary(
    df: DataFrame,
    id_col: str,
    token_col: str,
    *,
    budget: int,
    num_shards: int,
) -> DataFrame:
    """Per-(shard, seq_id) packing report: docs packed, tokens packed,
    id span — the manifest a training-data export publishes per shard."""
    assigned = assign_sequences(
        df, id_col, token_col, budget=budget, num_shards=num_shards
    )
    return assigned.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_col).cast("long").alias("tokens_packed"),
        F.min(id_col).cast("long").alias("first_doc"),
        F.max(id_col).cast("long").alias("last_doc"),
    )
