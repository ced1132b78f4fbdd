"""Composed corpus curation: the operators a training-data pipeline chains
on every refresh — quality gate → language gate → exact dedup → pack →
shard export — as one callable with per-stage accounting.

This is the PHYSICAL twin of the in-query funnel
(plans/parity_text.py::ns_doc_curation_funnel, which certifies the same
composition against the DuckDB oracle): it actually writes training shards
and returns the read-back manifest. Each stage is the already-tested
primitive (functions/text.py, operators/text_dedup.py,
operators/export.py); this module only composes and accounts.

Scale shape: the gates are zero-shuffle map work over ONE projected token
column; dedup is one hash groupBy; pack+export is one shuffle
(repartition on shard + per-partition sort). Nothing here collects rows —
the report is a handful of scalar aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as tx
from .export import export_shards, export_shards_jsonl


def curate_and_export(
    df: DataFrame,
    id_col: str,
    text_col: str,
    out_dir: str,
    *,
    min_tokens: int = 20,
    min_alpha_ratio: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    budget: int = 512,
    num_shards: int = 8,
    fmt: str = "parquet",
    remove_spans: bool = False,
    span_divisor: int = 8,
    span_max_doc_freq: int = 1,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the curation funnel over ``df`` and export survivors as
    training shards under ``out_dir``.

    Gates, in order (each survivor count lands in the report):

    1. quality — at least ``min_tokens`` tokens and ``min_alpha_ratio``
       alphabetic characters;
    2. language — n-gram heuristic language id in ``langs``;
    3. exact dedup — survivor = min id per normalized-text hash;
    4. (``remove_spans=True``) shared-span REMEDIATION — CDC chunks
       occurring in more than ``span_max_doc_freq`` surviving documents
       are dropped and each document reassembles from its kept chunks
       (operators/text_dedup.py::remove_shared_spans); documents made
       entirely of shared boilerplate drop out of the corpus. The chunk
       frame is computed ONCE (persisted) and feeds both the frequency
       side and the reassembly side — the single-pass prechunked path.
       Token counts for the packing budget are recomputed on the
       cleaned text, so ``span_tokens_removed`` is real budget savings,
       not just accounting.

    Returns ``(manifest_df, report)`` where ``manifest_df`` is the
    shard-manifest read back from disk (``fmt`` = "parquet" or "jsonl")
    and ``report`` counts documents entering/surviving each stage, plus
    (when ``remove_spans``) ``after_span_removal`` (documents with any
    text left) and ``span_tokens_removed`` (whitespace tokens scrubbed
    corpus-wide).
    """
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unsupported shard format: {fmt}")

    base = df.select(
        F.col(id_col), F.col(text_col), tx.tokens(F.col(text_col)).alias("__toks")
    )
    stats = tx.quality_stats(F.col(text_col), toks=F.col("__toks"))
    q_ok = (stats["n_tokens"] >= min_tokens) & (
        stats["alpha_ratio"] >= min_alpha_ratio
    )
    l_ok = tx.language_id(F.col(text_col), toks=F.col("__toks")).isin(*langs)
    # Both gate flags project in ONE pass so the funnel report is a single
    # conditional aggregation — not one full corpus re-scan per counter.
    flagged = base.select(
        id_col, text_col, "__toks",
        q_ok.alias("__q_ok"), (q_ok & l_ok).alias("__ql_ok"),
    )
    langed = flagged.filter(F.col("__ql_ok"))
    normalized = langed.select(
        id_col,
        text_col,
        tx.normalize_text(F.col(text_col)).alias("__norm"),
        tx.bpe_ish_token_count(F.col(text_col), toks=F.col("__toks")).alias(
            "tokens"
        ),
    )
    # survivor = min id per normalized-text hash (operators/text_dedup.py
    # exact_dedup semantics, inlined here to keep the already-computed
    # token count on the survivor row without a second join)
    from ..functions import scalars

    h = scalars.sha256_hex(F.col("__norm"))
    survivors = (
        normalized.withColumn("__h", h)
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__h").orderBy(F.col(id_col).asc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(id_col, text_col, "tokens")
        .cache()
    )

    gate_row = flagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__q_ok").cast("long")).alias("q"),
        F.sum(F.col("__ql_ok").cast("long")).alias("ql"),
    ).first()
    report = {
        "input_docs": gate_row["n"],
        "after_quality": int(gate_row["q"] or 0),
        "after_language": int(gate_row["ql"] or 0),
        "after_dedup": survivors.count(),
    }

    chunk_frame = None
    if remove_spans:
        from .text_dedup import remove_shared_spans

        # one chunking pass, persisted: remove_shared_spans consumes the
        # chunk frame twice (frequency side + scored/reassembly side)
        chunk_frame = tx.cdc_chunk_documents(
            survivors, id_col, text_col, divisor=span_divisor
        ).persist()
        cleaned = remove_shared_spans(
            survivors,
            id_col,
            text_col,
            divisor=span_divisor,
            max_doc_freq=span_max_doc_freq,
            chunks=chunk_frame,
        ).cache()
        # one aggregate pass: survivor count AND corpus-wide removed
        # tokens (including documents emptied entirely)
        span_row = cleaned.agg(
            F.sum((F.length("cleaned_text") > 0).cast("long")).alias("kept"),
            F.coalesce(F.sum("n_tokens_removed"), F.lit(0)).alias("removed"),
        ).first()
        report["after_span_removal"] = int(span_row["kept"] or 0)
        report["span_tokens_removed"] = int(span_row["removed"])
        survivors.unpersist()
        survivors = cleaned.filter(F.length("cleaned_text") > 0).select(
            id_col,
            F.col("cleaned_text").alias(text_col),
            tx.bpe_ish_token_count(F.col("cleaned_text")).alias("tokens"),
        )

    if fmt == "parquet":
        manifest = export_shards(
            survivors.drop(text_col), id_col, "tokens", out_dir,
            budget=budget, num_shards=num_shards,
        )
    else:
        manifest = export_shards_jsonl(
            survivors, id_col, "tokens", text_col, out_dir,
            budget=budget, num_shards=num_shards,
        )
    survivors.unpersist()
    if remove_spans:
        cleaned.unpersist()
        chunk_frame.unpersist()
    return manifest, report
