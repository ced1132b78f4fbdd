"""Scalar column-expression library (SURVEY.md §2.8-2.9, F1-F14, V1-V6).

Everything here is a pure Column expression built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen friendly, no Python
UDFs. Each helper cites the reference construct it reimplements.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,9)"


def nvl(col: Column, default: Column | str) -> Column:
    """``NVL(x, d)`` — reference sql/03_transform_headers.sql:72."""
    d = F.lit(default) if not isinstance(default, Column) else default
    return F.coalesce(col, d)


def try_to_number(col: Column, dtype: str = DEC) -> Column:
    """``TRY_TO_NUMBER(s)`` — NULL on unparsable, never throws.

    Reference sql/03_transform_headers.sql:16,31,46. ``try_cast`` matches the
    no-format-string form and stays inside codegen.
    """
    return col.cast("string").try_cast(dtype)


def try_to_timestamp(col: Column) -> Column:
    """``TRY_TO_TIMESTAMP_NTZ(s)`` — reference sql/03_transform_headers.sql:14.

    Fixtures pin ISO-8601 (SURVEY.md §7.4-5), which both Spark and the oracle
    parse identically.
    """
    return F.try_to_timestamp(col.cast("string"))


def concat_null_if_any(*cols: Column) -> Column:
    """``||`` concatenation: NULL if ANY operand is NULL.

    Reference sql/03_transform_headers.sql:69-72 builds hash inputs with
    ``||``; ``concat_ws`` would silently skip NULLs and change hash inputs,
    so this must stay ``F.concat`` (SURVEY.md F9 note).
    """
    return F.concat(*cols)


def sha256_hex(col: Column) -> Column:
    """``SHA2(s, 256)`` — reference sql/03_transform_headers.sql:23,38,53."""
    return F.sha2(col.cast("string"), 256)


def canonical_txn_id(
    client_id: Column, source_txn_id: Column, payload_hash: Column,
    src_file: Column, txn_timestamp: Column,
) -> Column:
    """Canonical-ID derivation, reference sql/03_transform_headers.sql:66-73.

    effective id = COALESCE(source_txn_id, payload_hash);
    canonical_txn_id =
        SHA2(client_id || '|' || effective_id, 256)          when derivable,
        else SHA2(client_id || '|' || src_file || '|' ||
                  NVL(TO_VARCHAR(txn_timestamp), ''), 256)   outer fallback.
    The fallback only fires when the inner concat is NULL (NULL client_id
    makes it NULL too — reproduced faithfully, see SURVEY.md §2.11).
    """
    effective = F.coalesce(source_txn_id, payload_hash)
    primary = sha256_hex(concat_null_if_any(client_id, F.lit("|"), effective))
    fallback = sha256_hex(
        concat_null_if_any(
            client_id,
            F.lit("|"),
            src_file,
            F.lit("|"),
            nvl(F.date_format(txn_timestamp, "yyyy-MM-dd HH:mm:ss.SSS"), F.lit("")),
        )
    )
    return F.coalesce(primary, fallback)


def array_compact_of(*cols: Column) -> Column:
    """``ARRAY_CONSTRUCT_COMPACT(a, b, ...)`` — drops NULL entries.

    Reference sql/03_transform_headers.sql:98-102 (anomaly-code array).
    """
    return F.array_compact(F.array(*cols))


def array_get(arr: Column, idx: int) -> Column:
    """``payload[N]`` positional access; out-of-range yields NULL, not error.

    Reference sql/03_transform_headers.sql:43-49 (CSV positional mapping).
    ``F.get`` is NULL-safe in ANSI mode, unlike ``element_at``/``[]``.
    """
    return F.get(arr, idx)


def iff(cond: Column, a, b) -> Column:
    """``IFF(cond, a, b)`` — reference sql/03_transform_headers.sql:68."""
    return F.when(cond, a).otherwise(b)


def md5_long(col: Column, *, modulus: int | None = None) -> Column:
    """Deterministic 60-bit integer hash shared with the DuckDB oracle.

    Parses the first 15 hex chars of md5 — both engines produce identical
    md5 hex, so this is the cross-engine-stable integer hash used by the
    minhash/simhash/LSH operators (Spark's ``xxhash64``/``hash`` have no
    DuckDB counterpart).
    """
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    if modulus is not None:
        return h % F.lit(modulus)
    return h
