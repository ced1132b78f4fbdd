"""Raw-layer readers: the COPY INTO ports (SURVEY.md §2.1, S1-S10).

Each reader produces the reference's RAW-table shape
(``/root/reference/sql/01_raw_ingestion.sql:62-72,89-99,116-131``):

    client_id STRING, src_file STRING, src_row_number LONG,
    ingest_ts TIMESTAMP, payload VARIANT (CSV: ARRAY<STRING>)

plus a ``_load_error`` column (NULL when the record loaded cleanly) that
feeds the load-audit capture (audit.py) — the ``ON_ERROR='CONTINUE'`` +
RESULT_SCAN emulation. Payloads are Spark VARIANT (``parse_json``), the
engine-native equivalent of Snowflake VARIANT: binary-encoded, path-addressed
(``try_variant_get``), schema-drift tolerant.

Scale notes:
- JSON files are read ``wholetext`` (one row per file) because the reference
  semantics are per-file documents with STRIP_OUTER_ARRAY; financial txn
  files are small and many, so parallelism comes from file count. NDJSON
  sources at 100 TB should use the line-mode reader (``whole_file=False``).
- All lineage derives from ``_metadata.file_path`` (exact per-file scoping,
  no UDFs); per-file row numbers are a window over the file path — files are
  single-split at this size so intra-file order is the read order.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CopySpec:
    """One COPY INTO statement (reference sql/01_raw_ingestion.sql:62,89,116).

    ``client_id=None`` derives the client from the path prefix like the CSV
    COPY does (``:119-123``); a string pins it like the XML/JSON COPYs.
    ``files`` is the explicit FILES=(...) list (S10).
    """

    file_type: str  # 'JSON' | 'XML' | 'CSV'
    path: str  # directory or glob under the ingest root
    client_id: str | None = None
    files: tuple[str, ...] | None = None
    row_tag: str = "transaction"  # XML only
    # CSV only: split giant files across tasks (100 TB path) with exact
    # physical line ordinals (per-split prefix sums over file_block_start —
    # see read_raw_csv). Semantics match the wholetext default; the remaining
    # difference is embedded newlines in quoted fields, which only the
    # wholetext reader can honor.
    splittable: bool = False


def _src_file() -> Column:
    return F.col("_metadata.file_path")


def _client_from_path(rel_path: Column) -> Column:
    """CSV client derivation (reference sql/01_raw_ingestion.sql:119-123)."""
    return (
        F.when(rel_path.ilike("client_a/%"), "ClientA")
        .when(rel_path.ilike("client_c/%"), "ClientC")
        .otherwise(F.split_part(rel_path, F.lit("/"), F.lit(1)))
        .cast("string")
    )


def _with_client(df: DataFrame, spec: CopySpec, ingest_root: str) -> DataFrame:
    import re

    if spec.client_id is not None:
        return df.withColumn("client_id", F.lit(spec.client_id).cast("string"))
    # src_file is a URI ("file:///..."); strip scheme + ingest root.
    rel = F.regexp_replace(
        F.col("src_file"),
        "^(?:[a-z]+:/+)?/?" + re.escape(ingest_root.strip("/")) + "/",
        "",
    )
    return df.withColumn("client_id", _client_from_path(rel))


def read_raw_json(
    spark: SparkSession,
    spec: CopySpec,
    ingest_root: str,
    ingest_ts: Column | None = None,
    whole_file: bool = True,
) -> DataFrame:
    """JSON COPY port with STRIP_OUTER_ARRAY (reference :36-38, :89-99).

    A file holding a top-level array becomes one row per element; a file
    holding an object becomes one row. Malformed JSON yields one row with a
    NULL payload and ``_load_error`` set (ON_ERROR='CONTINUE').
    """
    paths = list(spec.files) if spec.files else [spec.path]
    txt = spark.read.text(paths, wholetext=whole_file).select(
        F.col("value"), _src_file().alias("src_file")
    )
    # Staged projections, deliberately: the parsed VARIANT materializes as a
    # column once, the element array and the error flag derive from it
    # BEFORE the generator, and the explode references only attributes.
    # Inlining `doc` next to the posexplode re-parses the ENTIRE file text
    # per exploded element (generator-adjacent expressions are evaluated
    # after the Generate, and the Generate input inlines every reference) —
    # O(file_size x elements) at scale.
    doc = F.col("__doc")
    parsed = txt.select("value", "src_file", F.try_parse_json(F.col("value")).alias("__doc"))
    # STRIP_OUTER_ARRAY: explode top-level arrays; wrap single documents.
    staged = parsed.select(
        "src_file",
        F.coalesce(
            F.try_variant_get(doc, "$", "array<variant>"),
            F.when(doc.isNotNull(), F.array(doc)),
        ).alias("__elems"),
        F.when(doc.isNull(), F.substring(F.col("value"), 1, 200)).alias("_load_error"),
    )
    out = staged.select(
        "src_file",
        "_load_error",
        F.posexplode_outer("__elems").alias("elem_idx", "payload"),
    ).withColumn("src_row_number", (F.coalesce(F.col("elem_idx"), F.lit(0)) + 1).cast("long"))
    out = _with_client(out, spec, ingest_root)
    return out.select(
        "client_id",
        "src_file",
        "src_row_number",
        (ingest_ts if ingest_ts is not None else F.current_timestamp()).alias("ingest_ts"),
        "payload",
        "_load_error",
    )


def _xml_element_to_obj(el):
    """XML element -> JSON-able value, Snowflake-VARIANT-style:
    attributes as ``@name`` keys, repeated child tags as arrays, text-only
    elements as strings (lexical form preserved — typing is TRY_TO_*'s job),
    mixed content under ``#text``."""
    obj = {"@" + k: v for k, v in el.attrib.items()}
    children = list(el)
    text = (el.text or "").strip()
    if not children:
        if obj:
            if text:
                obj["#text"] = text
            return obj
        return text if text else None
    groups: dict[str, list] = {}
    for c in children:
        groups.setdefault(c.tag, []).append(_xml_element_to_obj(c))
    for tag, vals in groups.items():
        obj[tag] = vals[0] if len(vals) == 1 else vals
    if text:
        obj["#text"] = text
    return obj


def _make_xml_docs_udf(row_tag: str):
    """Arrow-batched per-document XML->JSON conversion.

    Why not the native Spark XML reader: it infers ONE schema across all
    files (two passes over the data), and a tag that is a struct in one file
    but a string in another collapses to a raw-XML string — cross-file
    coupling Snowflake's per-document VARIANT doesn't have. Converting each
    document independently is one pass, embarrassingly parallel, and
    drift-faithful. XML parsing is genuinely CPU-bound Python work, the one
    sanctioned Pandas-UDF use (SURVEY.md §2.13).
    """
    import json
    import xml.etree.ElementTree as ET

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def xml_docs(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            try:
                root = ET.fromstring(t)
                rows = [root] if root.tag == row_tag else root.findall(row_tag)
                if not rows:
                    rows = [root]
                out.append(
                    [json.dumps(_xml_element_to_obj(r), ensure_ascii=False) for r in rows]
                )
            except Exception:
                out.append(None)
        return pd.Series(out)

    return xml_docs


def read_raw_xml(
    spark: SparkSession,
    spec: CopySpec,
    ingest_root: str,
    ingest_ts: Column | None = None,
) -> DataFrame:
    """XML COPY port (reference :40-41, :62-72).

    Attributes surface with the Snowflake-style ``@`` prefix so transform
    paths like ``payload:"@transaction_id"`` translate verbatim to variant
    paths ``$['@transaction_id']``. A wrapper document holding several
    ``row_tag`` elements yields one row per element (like Snowflake's
    one-VARIANT-per-top-level-element). Malformed XML -> NULL payload +
    ``_load_error`` (ON_ERROR='CONTINUE').
    """
    paths = list(spec.files) if spec.files else [spec.path]
    txt = spark.read.text(paths, wholetext=True).select(
        F.col("value"), _src_file().alias("src_file")
    )
    return xml_text_to_raw(txt, spec, ingest_root, ingest_ts)


def xml_text_to_raw(
    txt: DataFrame,
    spec: CopySpec,
    ingest_root: str,
    ingest_ts: Column | None = None,
) -> DataFrame:
    """XML conversion plan over a ``(value, src_file)`` whole-document text
    frame — shared verbatim by the batch reader above and the streaming
    reader (streaming/ingest.py xml_file_stream): every expression here is
    stateless, so the identical plan runs under readStream.

    Staged like read_raw_json: the pandas-UDF result materializes as ONE
    column, the error flag derives from it BEFORE the generator, and the
    explode references only attributes — so the plan carries exactly one
    ArrowEvalPython node (pinned in tests/test_plan_shapes.py) instead of
    trusting the optimizer to deduplicate UDF calls adjacent to a
    Generate.
    """
    docs = F.col("__docs")
    parsed = txt.select(
        "value",
        "src_file",
        _make_xml_docs_udf(spec.row_tag)(F.col("value")).alias("__docs"),
    )
    staged = parsed.select(
        "src_file",
        "__docs",
        F.when(docs.isNull(), F.substring(F.col("value"), 1, 200)).alias("_load_error"),
    )
    out = staged.select(
        "src_file",
        "_load_error",
        F.posexplode_outer(docs).alias("elem_idx", "doc_json"),
    ).select(
        "src_file",
        (F.coalesce(F.col("elem_idx"), F.lit(0)) + 1).cast("long").alias("src_row_number"),
        F.parse_json(F.col("doc_json")).alias("payload"),
        "_load_error",
    )
    out = _with_client(out, spec, ingest_root)
    return out.select(
        "client_id",
        "src_file",
        "src_row_number",
        (ingest_ts if ingest_ts is not None else F.current_timestamp()).alias("ingest_ts"),
        "payload",
        "_load_error",
    )


# Header arity per resolved path set: a driver-side first-line probe that
# was re-run on every read_raw_csv call (measured 1.6x on the lineage query,
# VERDICT r2). The arity is a property of the COPY spec's file layout, so one
# probe per path set per session is enough; clear on in-place file rewrites.
_ARITY_CACHE: dict[tuple[str, ...], int] = {}


def _csv_arity_of_line(line: str) -> int:
    """Top-level comma count + 1, honoring the SAME dialect the data rows
    are parsed with downstream (``from_csv`` options: quote ``"``, default
    backslash escape) — a stdlib ``csv.reader`` would apply the doublequote
    dialect instead and could disagree on headers with escaped quotes,
    poisoning the arity for every row. Doubled quotes inside a quoted field
    also parse correctly here (each toggles the in-quote state, netting
    zero across the pair). The escape char is honored only INSIDE quoted
    fields — Spark's univocity parser treats ``escape`` as a quote-escape
    within quoted values; an unquoted ``\\,`` is a literal backslash
    followed by a real delimiter."""
    if not line:
        return 0
    n, in_q, esc = 1, False, False
    for c in line:
        if esc:
            esc = False
        elif in_q and c == "\\":
            esc = True
        elif c == '"':
            in_q = not in_q
        elif c == "," and not in_q:
            n += 1
    return n


def _header_arity(spark: SparkSession, paths: list[str]) -> int:
    """Column count of the CSV header (first line of the first file).

    One ``text`` scan with ``limit(1)`` + a driver-side parse of that
    single line — NOT ``spark.read.csv(header=True)``: the csv data
    source's header resolution was the single most expensive fixed cost in
    the ingest stage (~1.5-2.5 s of driver-side source setup per cold run,
    measured), and all we need from it is an integer. If the first file is
    empty, fall back to the first line across ALL of the COPY's files
    (matching the old csv-source behavior of taking whichever header it
    found). Arity is assumed uniform across a COPY's files, same as before
    (from_csv enforces it per row downstream via the corrupt-record
    column).
    """
    key = tuple(paths)
    n = _ARITY_CACHE.get(key)
    if n is None:
        header = spark.read.text(paths[0]).limit(1).collect()
        if not header and len(paths) > 1:
            header = spark.read.text(paths).limit(1).collect()
        line = header[0][0] if header else ""
        n = _csv_arity_of_line(line)
        _ARITY_CACHE[key] = n
    return n


def read_raw_csv(
    spark: SparkSession,
    spec: CopySpec,
    ingest_root: str,
    ingest_ts: Column | None = None,
) -> DataFrame:
    """CSV COPY port (reference :43-46, :116-131) with ON_ERROR='CONTINUE'.

    SKIP_HEADER=1 -> the first physical line of each file is dropped;
    FIELD_OPTIONALLY_ENCLOSED_BY='"' -> ``quote='"'``; the row becomes
    ``payload ARRAY<STRING>`` exactly like ``ARRAY_CONSTRUCT(*)`` (positional
    access downstream; empty fields NULL, matching the csv reader's default
    nullValue and Snowflake's NULL-on-missing subscript).

    Error capture (reference ``ON_ERROR='CONTINUE'``, sql/01_raw_ingestion.sql:131):
    Snowflake rejects CSV rows whose token count mismatches the header
    (ERROR_ON_COLUMN_COUNT_MISMATCH default TRUE) and unparsable rows; both
    now set ``_load_error`` so the audit reports PARTIALLY_LOADED /
    LOAD_FAILED for CSV like the other formats. Detection: ``from_csv``
    against an exact-arity all-STRING schema + corrupt-record column —
    PERMISSIVE marks a row corrupt exactly when its token count differs from
    the schema arity (verified both directions; empty tokens count), which is
    the Snowflake rule.

    Files are read wholetext and split on newlines, which makes
    ``src_row_number`` the TRUE physical line ordinal — stable across reruns
    and split layouts (the prior row_number-over-read-order was only stable
    for single-split files). Tradeoff, same as the JSON reader's whole-file
    mode: one task per file, no intra-file splitting, no embedded newlines in
    quoted fields; financial txn drops are many-small-files, where per-file
    parallelism is the right axis. The ``splittable`` path now produces the
    SAME true line ordinals (see below), so the two modes are interchangeable
    on (src_file, src_row_number, payload, _load_error).
    """
    paths = list(spec.files) if spec.files else [spec.path]
    n = _header_arity(spark, paths)
    schema_ddl = ", ".join(f"_c{i} STRING" for i in range(n)) + ", _corrupt STRING"
    opts = {"quote": '"', "mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}

    if spec.splittable:
        # 100 TB path: line-mode text source (splits WITHIN files across
        # tasks) with EXACT physical line ordinals. Each line carries its
        # split's byte offset (``_metadata.file_block_start`` — a documented
        # file-source metadata column, unlike the partition-index read order
        # the previous design trusted) plus monotonically_increasing_id,
        # which is CONSECUTIVE within a partition; a split never spans
        # partitions, so ``_mid - min(_mid per split)`` is the 0-based
        # position within the split. Per-split (min _mid, line count) is a
        # map-side-combinable aggregation (ONE row per split, ~800k rows at
        # 100 TB with 128 MB splits); a prefix sum over splits ordered by
        # byte offset gives each split's starting line number, broadcast
        # back. The big side is never shuffled — the old design windowed
        # over src_file (one reducer per FILE: the exact skew this path
        # exists to avoid); this one pays a second text scan instead, the
        # right trade at scale. Header = line 1 BY CONSTRUCTION (no
        # ordering heuristics), and blank lines are dropped only AFTER
        # numbering, so ordinals match the wholetext path exactly.
        from pyspark.sql.window import Window

        txt = spark.read.text(paths).select(
            F.col("value").alias("line"),
            _src_file().alias("src_file"),
            F.col("_metadata.file_block_start").alias("_blk"),
            F.monotonically_increasing_id().alias("_mid"),
        )
        wf = Window.partitionBy("src_file").orderBy("_blk")
        split_stats = (
            txt.groupBy("src_file", "_blk")
            .agg(F.min("_mid").alias("_mid0"), F.count(F.lit(1)).alias("_n"))
            .withColumn(
                "_start",
                F.coalesce(
                    F.sum("_n").over(wf.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                ),
            )
            .select("src_file", "_blk", "_mid0", "_start")
        )
        lines = (
            txt.join(F.broadcast(split_stats), ["src_file", "_blk"])
            .withColumn(
                "_line_no", F.col("_start") + (F.col("_mid") - F.col("_mid0")) + 1
            )
            .filter((F.col("_line_no") > 1) & (F.col("line") != ""))
            # wholetext numbers the header 0, data lines from 1
            .withColumn("line_idx", F.col("_line_no") - 1)
        )
    else:
        txt = spark.read.text(paths, wholetext=True).select(
            F.col("value"), _src_file().alias("src_file")
        )
        lines = txt.select(
            "src_file",
            F.posexplode(F.split(F.col("value"), "\r?\n")).alias("line_idx", "line"),
        ).filter((F.col("line_idx") > 0) & (F.col("line") != ""))

    parsed = lines.withColumn("_p", F.from_csv(F.col("line"), schema_ddl, opts))
    err = F.when(
        F.col("_p._corrupt").isNotNull(),
        F.concat(
            F.format_string("column count mismatch (expected %d) or malformed: ", F.lit(n)),
            F.substring("line", 1, 200),
        ),
    )
    payload = F.array(*[F.col(f"_p._c{i}") for i in range(n)])
    raw = parsed.select(
        "src_file",
        F.col("line_idx").cast("long").alias("src_row_number"),
        payload.alias("payload"),
        err.alias("_load_error"),
    )
    raw = _with_client(raw, spec, ingest_root)
    return raw.select(
        "client_id",
        "src_file",
        "src_row_number",
        (ingest_ts if ingest_ts is not None else F.current_timestamp()).alias("ingest_ts"),
        "payload",
        "_load_error",
    )


READERS = {"JSON": read_raw_json, "XML": read_raw_xml, "CSV": read_raw_csv}


def read_raw(
    spark: SparkSession, spec: CopySpec, ingest_root: str, ingest_ts: Column | None = None
) -> DataFrame:
    return READERS[spec.file_type](spark, spec, ingest_root, ingest_ts)
