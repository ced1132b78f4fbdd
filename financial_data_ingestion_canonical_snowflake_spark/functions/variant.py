"""VARIANT path-access helpers (SURVEY.md §1.3, §2.9 V5-V7).

Snowflake's ``payload:a:b::STRING`` / precedence-ordered COALESCE chains
(reference sql/03_transform_headers.sql:13-19) map to Spark VARIANT
(``try_variant_get``) — NULL on missing path or failed cast, never an error,
which is exactly the drift-tolerance contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vget(payload: Column, path: str, dtype: str = "string") -> Column:
    """``payload:path::TYPE``. Keys needing quoting (e.g. ``@transaction_id``)
    use variant bracket syntax ``$['@key']``.

    For ``string`` targets, structured values (objects/arrays) yield NULL
    rather than their JSON text: Snowflake's ``::STRING`` on a VARIANT object
    raises (so the reference's precedence chains implicitly assume scalars),
    and NULL is what lets ``COALESCE(payload:merchant, payload:merchant.name)``
    fall through to the nested candidate on drifted shapes.
    """
    if not path.startswith("$"):
        path = "$." + path
    val = F.try_variant_get(payload, path, dtype)
    if dtype == "string":
        v = F.try_variant_get(payload, path, "variant")
        val = F.when(~F.schema_of_variant(v).rlike("^(STRUCT|ARRAY|OBJECT)"), val)
    return val


def vstr_chain(payload: Column, *paths: str) -> Column:
    """``COALESCE(payload:p1::STRING, payload:p2::STRING, ...)`` —
    the key-precedence harmonization workhorse (F1)."""
    return F.coalesce(*[vget(payload, p, "string") for p in paths])


def varray_at(payload: Column, path: str) -> Column:
    """Array-of-variant at ``path``; a single nested object is wrapped into a
    one-element array.

    Mirrors Snowflake FLATTEN over XML-converted payloads where a repeated
    element collapses to a single object when it occurs once
    (reference sql/04_transform_lines.sql:39 relies on this tolerance).
    """
    arr = vget(payload, path, "array<variant>")
    single = vget(payload, path, "variant")
    return F.coalesce(arr, F.when(single.isNotNull(), F.array(single)))


def varray_chain(payload: Column, *paths: str) -> Column:
    """``COALESCE(FLATTEN input candidates)`` — e.g. line_items | items | lines
    (reference sql/04_transform_lines.sql:22,39)."""
    return F.coalesce(*[varray_at(payload, p) for p in paths])
