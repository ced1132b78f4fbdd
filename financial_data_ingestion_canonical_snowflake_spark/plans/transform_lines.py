"""Stage 04: nested line-item flattening -> staging line DataFrame.

Faithful port of ``/root/reference/sql/04_transform_lines.sql``: per-format
raw rows join the surviving headers (rn=1) on (client_id, src_file) —
file-granular, reproducing the reference's fan-out semantics (SURVEY.md
§7.4-2) — then JSON/XML payloads FLATTEN their line arrays
(posexplode_outer + value-not-null filter, the exact OUTER+WHERE
combination at :22-23,:39-40) and CSV rows map positions 7..11.

``join_mode='row'`` is the corrected row-granular variant (each raw row
joins only the header derived from that same row) for multi-txn-per-file
sources; fixtures keep one txn per JSON/XML file so both modes agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import scalars
from ..functions.variant import varray_chain, vget, vstr_chain
from ..schemas import MONEY

_HDR_COLS = ["canonical_txn_id", "client_id", "src_file"]


def _surviving_headers(stg_header: DataFrame, source_system: str) -> DataFrame:
    """h: headers with rn=1 for one format (reference :21,:38,:55)."""
    return stg_header.filter(
        (F.col("rn") == 1) & (F.col("source_system") == source_system)
    ).select(*_HDR_COLS)


def _join_headers(
    raw: DataFrame, stg_header: DataFrame, source_system: str, join_mode: str
) -> DataFrame:
    h = _surviving_headers(stg_header, source_system)
    if join_mode == "row":
        # Corrected mode: re-derive the row's own canonical id would require
        # carrying it through; instead join on the full lineage grain.
        h = stg_header.filter(
            (F.col("rn") == 1) & (F.col("source_system") == source_system)
        ).select(*_HDR_COLS, "src_row_number")
        return raw.join(
            h, on=["client_id", "src_file", "src_row_number"], how="inner"
        )
    return raw.join(h, on=["client_id", "src_file"], how="inner")


def _try_num(col: Column) -> Column:
    return scalars.try_to_number(col, str(MONEY.simpleString()))


def _json_like_lines(
    raw: DataFrame,
    stg_header: DataFrame,
    source_system: str,
    array_paths: tuple[str, ...],
    join_mode: str,
) -> DataFrame:
    """json_line / xml_line CTEs (reference :8-24 / :25-41)."""
    joined = _join_headers(
        raw.filter(F.col("payload").isNotNull()), stg_header, source_system, join_mode
    )
    li = joined.select(
        "canonical_txn_id",
        F.col("src_file"),
        F.col("ingest_ts"),
        F.col("payload"),
        F.posexplode_outer(varray_chain(F.col("payload"), *array_paths)).alias(
            "li_index", "li_value"
        ),
    ).filter(F.col("li_value").isNotNull())  # OUTER=>TRUE + WHERE value IS NOT NULL
    v = F.col("li_value")
    p = F.col("payload")
    return li.select(
        "canonical_txn_id",
        F.coalesce(
            scalars.try_to_number(vget(v, "line_number"), "decimal(38,9)").cast("long"),
            (F.col("li_index") + 1).cast("long"),
        ).alias("line_number"),
        vstr_chain(v, "line_id", "id").alias("line_txn_id"),
        vstr_chain(v, "item_id", "sku", "product_id").alias("item_id"),
        vstr_chain(v, "description", "item_name", "name").alias("description"),
        _try_num(vstr_chain(v, "quantity", "qty")).alias("quantity"),
        _try_num(vstr_chain(v, "unit_price", "price")).alias("unit_price"),
        _try_num(vstr_chain(v, "line_amount", "amount", "total")).alias("line_amount"),
        F.upper(
            F.coalesce(vget(v, "currency"), vstr_chain(p, "currency", "ccy"))
        ).alias("currency"),
        "src_file",
        "ingest_ts",
        F.concat(
            F.lit('{"raw_line":'),
            F.to_json(v),
            F.lit(',"source_format":"%s"}' % source_system),
        ).alias("attributes"),
    )


def _csv_lines(raw: DataFrame, stg_header: DataFrame, join_mode: str) -> DataFrame:
    """csv_line CTE (reference :42-57): positions 7..11, header-currency
    precedence COALESCE(payload[2], payload[12]), line emitted only when any
    of 7/8/11 is present."""
    joined = _join_headers(
        raw.filter(F.col("payload").isNotNull()), stg_header, "CSV", join_mode
    )
    p = F.col("payload")
    get = scalars.array_get
    return joined.filter(
        get(p, 7).isNotNull() | get(p, 8).isNotNull() | get(p, 11).isNotNull()
    ).select(
        "canonical_txn_id",
        F.lit(1).cast("long").alias("line_number"),
        F.lit(None).cast("string").alias("line_txn_id"),
        get(p, 7).alias("item_id"),
        get(p, 8).alias("description"),
        _try_num(get(p, 9)).alias("quantity"),
        _try_num(get(p, 10)).alias("unit_price"),
        _try_num(get(p, 11)).alias("line_amount"),
        F.upper(F.coalesce(get(p, 2), get(p, 12))).alias("currency"),
        "src_file",
        "ingest_ts",
        F.concat(
            F.lit('{"csv_payload":'),
            F.to_json(p),
            F.lit(
                ',"source_format":"CSV","mapping_assumption":"0..6=header, 7..11=line"}'
            ),
        ).alias("attributes"),
    )


def transform_lines(
    raw_json: DataFrame | None,
    raw_xml: DataFrame | None,
    raw_csv: DataFrame | None,
    stg_header: DataFrame,
    join_mode: str = "faithful",
) -> DataFrame:
    """STG_CAN_TXN_LINE (reference :6-62)."""
    branches = []
    if raw_json is not None:
        branches.append(
            _json_like_lines(
                raw_json, stg_header, "JSON", ("line_items", "items", "lines"), join_mode
            )
        )
    if raw_xml is not None:
        branches.append(
            _json_like_lines(
                raw_xml,
                stg_header,
                "XML",
                ("line_items.line", "items.item", "lines.line"),
                join_mode,
            )
        )
    if raw_csv is not None:
        branches.append(_csv_lines(raw_csv, stg_header, join_mode))
    if not branches:
        raise ValueError("transform_lines: no raw inputs")
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
