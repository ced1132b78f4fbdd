"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference Snowflake SQL pipeline
(``nafloriang/financial-data-ingestion-canonical-snowflake``).

The reference is a declarative, SQL-only batch ETL program: tri-format
(CSV/JSON/XML) raw ingestion -> canonical header/line normalization ->
MERGE upserts -> anomaly detection -> aggregate observability views
(see ``/root/reference/main.sql:15-24``). This package re-expresses those
semantics Spark-first: DataFrame/Catalyst for all relational work,
Structured Streaming for incremental ingestion, and adds the
LLM-data-pipeline operator family (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    session.py    SparkSession factory with pinned, scale-aware defaults
    schemas.py    canonical StructType constants (reference sql/02_canonical_ddl.sql)
    sources/      CSV/JSON/XML readers with lineage + load-audit capture
    functions/    scalar/text/vector column-expression library (no row UDFs)
    operators/    merge-upsert, survivorship dedupe, text dedup, similarity
    plans/        the 9-stage pipeline DAG, ops views, parity query registry
    streaming/    Structured Streaming ingestion + foreachBatch merge sink
"""

__version__ = "0.1.0"
