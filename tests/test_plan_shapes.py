"""Plan-shape regression tests for the HOF/generator recompute fixes.

Catalyst re-evaluates outer expressions referenced inside higher-order-
function lambdas, re-inlines multi-referenced non-cheap expressions when
projections collapse, and evaluates generator-adjacent expressions per
EXPLODED row. Each fix in round 5 pinned a specific expression count in the
optimized plan; these tests assert those counts so a refactor cannot
silently reintroduce an O(k x subtree) recompute.
"""

from __future__ import annotations

import os
import tempfile

import __spark_entry__ as entrymod

entrymod.queries()  # populate the registry
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (  # noqa: E402
    ALL_QUERIES,
)
from financial_data_ingestion_canonical_snowflake_spark.sources.readers import (  # noqa: E402
    CopySpec,
    read_raw_json,
)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_json_reader_parses_each_file_once(spark):
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "a.json"), "w") as f:
        f.write('[{"id":1}]')
    spec = CopySpec(file_type="JSON", path=d, client_id="C")
    plan = _optimized(read_raw_json(spark, spec, d, None))
    assert plan.count("parseJson") == 1, plan


def test_repetition_plan_has_one_shingle_and_one_fold_per_n(spark, sf_oracle):
    plan = _optimized(ALL_QUERIES["ns_repetition_signals"](spark, sf_oracle))
    # one shingle build and one sorted fold for each of n=2, n=3
    assert plan.count("transform(sequence") == 2, plan
    assert plan.count("aggregate(array_sort") == 2, plan


def test_decontaminate_builds_train_grams_once_per_branch(spark, sf_oracle):
    # cached frames from earlier tests (e.g. the bloom variant's persisted
    # gram universe) substitute InMemoryRelations into matching subtrees
    # and distort the expression count — assert against the cold plan
    spark.catalog.clearCache()
    plan = _optimized(ALL_QUERIES["ns_decontaminate"](spark, sf_oracle))
    # 3 union branches on the train side + 1 bench side = 4 shingle builds;
    # a regression that re-inlines grams into the explode or the size()
    # at least doubles this
    assert plan.count("transform(sequence") <= 4, plan


def test_text_stats_split_once_per_row(spark, sf_oracle):
    # the tokenizer projects once; quality filters/folds reference it
    plan = _optimized(ALL_QUERIES["ns_text_quality_stats"](spark, sf_oracle))
    assert plan.count("split(lower(") == 1, plan


def test_xml_reader_converts_each_file_once(spark):
    """The XML pandas-UDF result is staged as a column before the
    posexplode (same fix as the JSON reader): exactly one ArrowEvalPython
    node — a second one means the error-flag reference re-runs the whole
    document conversion."""
    import tempfile

    from financial_data_ingestion_canonical_snowflake_spark.examples import (
        write_fixtures,
    )
    from financial_data_ingestion_canonical_snowflake_spark.sources.readers import (
        read_raw_xml,
    )

    root = write_fixtures(tempfile.mkdtemp(prefix="fincan_xmlplan_"))
    spec = CopySpec(file_type="XML", path=f"{root}/client_a/xml/", client_id="ClientA")
    df = read_raw_xml(spark, spec, root, None)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert physical.count("ArrowEvalPython") == 1, physical


def test_bloom_prefilter_sits_below_the_join(spark, sf_oracle):
    """The Bloom membership predicate must run as a scan-stage Filter
    BEFORE the exact gram join (that pre-join rejection is its entire
    point) — a regression that evaluates it post-join turns the prefilter
    into dead weight."""
    spark.catalog.clearCache()
    plan = (
        ALL_QUERIES["ns_decontaminate_bloom"](spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    join_at = min(i for i, l in enumerate(lines) if "BroadcastHashJoin" in l)
    filter_at = [i for i, l in enumerate(lines) if "Filter (forall(" in l]
    assert filter_at, plan
    # physical plans print top-down: children (earlier stages) come AFTER
    # their parent join node
    assert all(i > join_at for i in filter_at), plan


def test_ivf_centroids_broadcast_not_shuffled(spark, sf_oracle):
    """The centroid set must reach every corpus/query partition via
    broadcast (BroadcastNestedLoopJoin from the crossJoin) — a shuffled
    centroid join would re-partition the corpus by quantizer internals."""
    plan = (
        ALL_QUERIES["ns_sim_ivf_topk"](spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_grouped_topk_gets_partial_window_group_limit(spark, sf_oracle):
    """The rank<=k filter over a row_number window must compile to a
    Partial WindowGroupLimit BELOW the group-key exchange (map tasks keep
    only their own top k per group before shuffling). A refactor that
    moves the rank filter away from the window (e.g. into a later stage)
    silently reverts to shuffling every row."""
    plan = (
        ALL_QUERIES["ns_text_topk_quality_by_lang"](spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan.split("WindowGroupLimit")[-1] or plan.count("WindowGroupLimit") >= 2, plan


def test_new_operator_scans_prune_columns(spark, sf_oracle):
    """Round-6 operators read only the columns they use (ReadSchema
    pruning reaches the parquet scan)."""
    import re

    cases = [
        ("ns_cohort_retention", {"ts", "user_id"}),
        ("ns_vector_quantize_int8", {"vec_id", "embedding"}),
        ("ns_source_token_divergence", {"text", "source"}),
        ("ns_fuzzy_match_pairs", {"p_partkey", "p_name"}),
        ("ns_gap_fill_ffill", {"user_id", "ts", "value", "event_id"}),
        ("ns_calendar_rollup", {"o_orderdate", "o_totalprice"}),
        ("ns_text_c4_filters", {"doc_id", "text"}),
        ("ns_linreg_corr", {"l_returnflag", "l_quantity", "l_extendedprice", "l_discount"}),
    ]
    for name, allowed in cases:
        plan = (
            ALL_QUERIES[name](spark, sf_oracle)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for schema in re.findall(r"ReadSchema: struct<([^>]*)", plan):
            cols = {f.split(":")[0] for f in schema.split(",") if ":" in f}
            assert cols <= allowed, (name, cols)


def _executed(name, spark, sf_oracle) -> str:
    return (
        ALL_QUERIES[name](spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_window_analytics_single_exchange(spark, sf_oracle):
    """All five window functions share one window spec — the plan must
    contain exactly ONE shuffle (the user_id exchange) and one Window node
    chain; a second exchange means a function drifted onto its own spec."""
    plan = _executed("ns_window_analytics", spark, sf_oracle)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_gap_fill_single_shuffle(spark, sf_oracle):
    """Gap filling has exactly its two intended exchanges — the map-side-
    combined (key, bucket) groupBy and the key window over bucket
    summaries — and no join node (the no-grid-join design is the
    operator's point)."""
    plan = _executed("ns_gap_fill_ffill", spark, sf_oracle)
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Join" not in plan, plan


def test_tpch_q5_dimensions_broadcast(spark, sf_oracle):
    """The true dimensions (supplier/nation/region) ride broadcast joins —
    the lineitem scan must never shuffle for a dimension. (customer is
    fact-sized and deliberately NOT hinted; AQE may broadcast it at
    fixture scale, so only 3 broadcasts are required.)"""
    plan = _executed("ns_tpch_q5_regional_volume", spark, sf_oracle)
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_c4_filters_zero_shuffle(spark, sf_oracle):
    """Line filtering is per-row HOF work: no exchange anywhere."""
    plan = _executed("ns_text_c4_filters", spark, sf_oracle)
    assert "Exchange" not in plan, plan


def test_linreg_single_aggregate_pass(spark, sf_oracle):
    """The moment sums come from ONE partial-aggregated groupBy: exactly
    one exchange, and it carries only one row per group."""
    plan = _executed("ns_linreg_corr", spark, sf_oracle)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_session3_operator_scans_prune_columns(spark, sf_oracle):
    """The continuation-session operators read only the columns they use."""
    import re

    # FileScan metadata truncates at 100 chars by default — wide schemas
    # would otherwise never close the struct<...> and the regex misparses.
    # Restored afterwards: other tests in this session parse plan strings
    # and must not become order-dependent on the longer rendering.
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    cases = [
        ("ns_text_line_dedup", {"doc_id", "text"}),
        ("ns_scd2_dimension", {"user_id", "event_type", "ts", "event_id"}),
        ("ns_rolling_range_agg", {"event_id", "user_id", "ts", "value"}),
        ("ns_snapshot_diff_cdc", {
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        }),
        ("ns_set_ops", {"o_custkey", "o_orderstatus"}),
        ("ns_window_rank_fracs", {"o_orderkey", "o_orderpriority", "o_totalprice"}),
        ("ns_text_bpe_pairs", {"text"}),
    ]
    try:
        for name, allowed in cases:
            plan = _executed(name, spark, sf_oracle)
            for schema in re.findall(r"ReadSchema: struct<([^>]*)", plan):
                cols = {f.split(":")[0] for f in schema.split(",") if ":" in f}
                assert cols <= allowed, (name, cols)
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


def test_rolling_range_single_exchange(spark, sf_oracle):
    """The time-range rolling window plans ONE (user_id) exchange and one
    Window node — the frame is evaluated inside the sorted partition."""
    plan = _executed("ns_rolling_range_agg", spark, sf_oracle)
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_bpe_pairs_trims_topk_below_exchange(spark, sf_oracle):
    """The global top-20 compiles to TakeOrderedAndProject — each map task
    pre-trims to its own top 20 instead of shuffling every pair; the rank
    window then runs over 20 rows."""
    plan = _executed("ns_text_bpe_pairs", spark, sf_oracle)
    assert "TakeOrderedAndProject" in plan, plan


def test_set_ops_compile_to_semi_anti_joins(spark, sf_oracle):
    """intersect/subtract must become LeftSemi/LeftAnti joins over the
    distinct inputs — set algebra without a manual dedupe-and-join."""
    plan = _executed("ns_set_ops", spark, sf_oracle)
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan


def test_hot_queries_stay_jvm_side(spark, sf_oracle):
    """The 'UDFs are the slow path' discipline, pinned: no Python eval
    node (Arrow or row) may appear in the hot relational/text/vector
    queries — the only sanctioned kernel sites are XML conversion,
    multimodal codecs, the sessionize state fold, and the zlib quality
    kernel, none of which these plans touch. (Codegen-span checks are
    unreliable pre-execution under AQE — isFinalPlan=false prints no
    WholeStageCodegen labels — so only the Python-node absence is
    pinned.)"""
    hot = [
        "a1_pricing_summary", "j1_revenue_by_segment", "w1_survivor_dedupe",
        "f8_canonical_id_derivation", "m2_merge_composite_key",
        "ns_text_quality_stats", "ns_dedup_minhash_lsh", "ns_sim_lsh_topk",
        "ns_asof_directions", "ns_sessionize_batch", "ns_scd2_dimension",
        "ns_rolling_range_agg", "ns_snapshot_diff_cdc", "ns_text_line_dedup",
        "ns_session_window_native", "ns_corpus_datacard",
    ]
    for name in hot:
        plan = _executed(name, spark, sf_oracle)
        assert "EvalPython" not in plan, f"{name}: Python eval node crept in"


def test_importance_weights_broadcast_shape(spark, sf_oracle):
    """DSIR importance weighting (round 7): both feature tables are hash-
    space-bounded and must ride broadcasts — the ratio table reaches the
    per-doc scoring join as a BroadcastHashJoin (never a sort-merge
    exchange of the corpus-sized feature stream), and the plan stays
    JVM-side."""
    plan = _executed("ns_importance_weights", spark, sf_oracle)
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan
    # the corpus-sized raw feature stream must NOT be sort-merge-joined
    assert "SortMergeJoin" not in plan, plan


def test_kmeans_assign_broadcast_and_partial_aggregate(spark, sf_oracle):
    """Trained-quantizer assignment (round 7): the k centroids ride a
    BroadcastNestedLoopJoin (crossJoin of a k-row table), and the argmax
    collapse is a partial-aggregate groupBy — the exchange carries one
    row per vector, never the k-way scored expansion."""
    plan = _executed("ns_sim_kmeans_assign", spark, sf_oracle)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "partial_max_by" in plan or "partial_maxby" in plan.replace(
        "_", ""
    ), plan


def test_sample_exact_k_window_group_limit(spark, sf_oracle):
    """Exact-k stratified sampling (round 7): the rank<=k filter must
    compile to WindowGroupLimit on BOTH sides of the stratum exchange —
    map tasks keep only k rows per stratum before the shuffle, so the
    exchange never carries whole strata."""
    plan = _executed("ns_sample_exact_k", spark, sf_oracle)
    import re

    ex = plan.find("Exchange hashpartitioning")
    assert ex > 0, plan
    # tree prints parents first: before the Exchange = the FINAL limit
    # (above it), after = the PARTIAL limit (map side, below it)
    assert "WindowGroupLimit" in plan[:ex], plan
    assert "WindowGroupLimit" in plan[ex:], plan


def test_adaptive_near_dup_stays_bucket_equi_join(spark, sf_oracle):
    """The adaptive-default near-dup path (round 9): computing num_planes
    from the corpus count must not change the plan class — candidates
    still come from a bucket EQUI-join (one exchange on the bucket key),
    never a Cartesian re-expansion, and the scan reads only
    (vec_id, embedding)."""
    import re

    plan = _executed("ns_vector_near_dup_adaptive", spark, sf_oracle)
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    for schema in re.findall(r"ReadSchema: struct<([^>]*)", plan):
        cols = {f.split(":")[0] for f in schema.split(",") if ":" in f}
        assert cols <= {"vec_id", "embedding"}, cols


def test_chunk_dedup_cdc_single_exchange_partial_agg(spark, sf_oracle):
    """CDC chunk-level dedup (round 10): chunking is map-side HOFs, so
    the whole query must be ONE content-hash exchange with a partial
    aggregate below it (each map task collapses its own duplicate chunks
    before shuffling), a pruned (doc_id, text) scan, and no Python eval
    node."""
    import re

    plan = _executed("ns_chunk_dedup_cdc", spark, sf_oracle)
    assert plan.count("Exchange") == 1, plan
    ex = plan.find("Exchange hashpartitioning")
    assert ex > 0 and "partial_min" in plan[ex:], plan
    assert "EvalPython" not in plan, plan
    for schema in re.findall(r"ReadSchema: struct<([^>]*)", plan):
        cols = {f.split(":")[0] for f in schema.split(",") if ":" in f}
        assert cols <= {"doc_id", "text"}, cols


def test_remove_spans_skew_safe_join_and_partial_reassembly(spark, sf_oracle):
    """Substring-span remediation (round 10): the chunk->doc-frequency
    lookup must stay an EQUI-join (hot boilerplate hashes are exactly the
    skewed keys AQE skew-join can split — a window over the hash key
    would pin each hot hash to one task, which is why the operator joins
    instead), the per-document reassembly must carry a partial
    collect_list below its exchange, the scan reads only (doc_id, text),
    and the plan stays JVM-side."""
    import re

    plan = _executed("ns_text_remove_spans", spark, sf_oracle)
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    # frequency lookup is a join on the 64-bit chunk hash, never a window
    # partitioned by it
    assert "Join [__h" in plan.replace("Join [coalesce(__h", "Join [__h") or re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[__h", plan
    ), plan
    ex = plan.find("Exchange hashpartitioning(doc_id")
    assert ex > 0 and "partial_collect_list" in plan[ex:], plan
    for schema in re.findall(r"ReadSchema: struct<([^>]*)", plan):
        cols = {f.split(":")[0] for f in schema.split(",") if ":" in f}
        assert cols <= {"doc_id", "text"}, cols


def test_remove_spans_state_fed_skips_frequency_aggregate(spark):
    """The incremental path (r11): with a maintained (chunk_hash,
    doc_freq) table supplied, remove_shared_spans must NOT rebuild the
    corpus-wide frequency aggregate — the plan carries exactly one
    count-style aggregate pair (the per-document reassembly), no
    count(distinct)-shaped frequency pass, and the freq lookup stays an
    equi-join on the hash."""
    import re

    from pyspark.sql import functions as F

    from financial_data_ingestion_canonical_snowflake_spark.functions.scalars import (
        md5_long,
    )
    from financial_data_ingestion_canonical_snowflake_spark.functions.text import (
        cdc_chunk_documents,
    )
    from financial_data_ingestion_canonical_snowflake_spark.operators.text_dedup import (
        remove_shared_spans,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(20)],
        "doc_id long, text string",
    )
    chunks = cdc_chunk_documents(docs, "doc_id", "text", divisor=8)
    freq = (
        chunks.withColumn("chunk_hash", md5_long(F.lower(F.col("chunk_text"))))
        .select("chunk_hash", "doc_id")
        .distinct()
        .groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
    )
    # materialize the state tables as parquet (what the sink maintains)
    import tempfile

    d = tempfile.mkdtemp(prefix="fincan_spanstate_")
    chunks.write.mode("overwrite").parquet(d + "/chunks")
    freq.write.mode("overwrite").parquet(d + "/freq")
    out = remove_shared_spans(
        None,
        "doc_id",
        "text",
        max_doc_freq=1,
        chunks=spark.read.parquet(d + "/chunks"),
        freq=spark.read.parquet(d + "/freq"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    # exactly ONE aggregate chain (reassembly); a rebuilt frequency pass
    # would add a second partial/final count pair over the chunk frame
    assert plan.count("partial_collect_list") == 1, plan
    assert "distinct" not in plan.lower(), plan
    # freq lookup joins on the hash (left join: external table may lag)
    assert re.search(r"Join .*__h", plan) or "Join [__h" in plan, plan


def test_ivf_from_index_serves_without_corpus_reassignment(spark, tmp_path):
    """The maintained-index query path (r11): ivf_topk_from_index must
    carry exactly ONE row_number window chain per side purpose — the
    probe selection (partitioned by query_id) and the final top-k — and
    NO window or aggregate over the index side (re-assigning the corpus
    would defeat the maintained index). Index side joins by centroid_id."""
    from financial_data_ingestion_canonical_snowflake_spark.operators.similarity import (
        ivf_topk_from_index,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 13) for d in range(8)]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    cents = emb.limit(6)
    index = spark.createDataFrame(
        [(i, i % 6, [float((i * 7 + d) % 13) for d in range(8)]) for i in range(100)],
        "vec_id long, centroid_id int, embedding array<double>",
    )
    tmp = str(tmp_path / "idx")
    index.write.mode("overwrite").parquet(tmp)
    out = ivf_topk_from_index(
        spark.read.parquet(tmp), emb.limit(10), cents, k=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # exactly two window specs in the whole plan — probe-rank over
    # query_id + final top-k over query_id — and none partitioned by the
    # index/neighbor key (a third window would mean the index side is
    # being re-ranked, defeating the maintained index)
    lp = plan.lower()
    assert lp.count("windowspecdefinition(") == 2, plan
    assert lp.count("windowspecdefinition(query_id") == 2, plan
    assert "windowspecdefinition(neighbor_id" not in lp, plan
    assert "windowspecdefinition(vec_id" not in lp, plan
