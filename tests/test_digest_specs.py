"""Digest member specs must match their member queries' ACTUAL schemas.

A digest composite hashes each member's result through a (column, kind)
spec on the DuckDB side and the live DataFrame dtypes on the Spark side.
A drifted spec (renamed column, reordered select, a double added without
kind 'd') surfaces only as an opaque content_sum mismatch in the
composite — this test turns that into a named, early failure. Schemas
come from the lazy plan (no execution), so the whole sweep is cheap.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

entrymod.queries()  # populate the registry

from financial_data_ingestion_canonical_snowflake_spark.plans import (  # noqa: E402
    parity_core,
    parity_curation,
    parity_multimodal,
    parity_sketches,
    parity_text,
    parity_vector,
)
from financial_data_ingestion_canonical_snowflake_spark.plans.registry import (  # noqa: E402
    ALL_ORACLE_SQL,
    ALL_QUERIES,
)

_MEMBER_LISTS = {
    "relational": parity_core._DIGEST_RELATIONAL,
    "scalar": parity_core._DIGEST_SCALAR,
    "variant": parity_core._DIGEST_VARIANT,
    "decontaminate": parity_curation._DECON_DIGEST,
    "curation": parity_curation._CURATION_DIGEST,
    "multimodal": parity_multimodal._MM_DIGEST,
    "sketches": parity_sketches._SKETCH_DIGEST,
    "text": parity_text._TEXT_DIGEST,
    "vector": parity_vector._VECTOR_DIGEST,
}

_ALL_MEMBERS = [
    (family, name, cols)
    for family, members in _MEMBER_LISTS.items()
    for name, cols in members
]


@pytest.mark.parametrize(
    "family,name,cols", _ALL_MEMBERS, ids=[m[1] for m in _ALL_MEMBERS]
)
def test_digest_spec_matches_member_schema(spark, sf_oracle, family, name, cols):
    assert name in ALL_QUERIES, f"{family}: member {name} not registered"
    assert name in ALL_ORACLE_SQL, (
        f"{family}: member {name} has no oracle — digest_union_oracle "
        "would KeyError at composite build"
    )
    df = ALL_QUERIES[name](spark, sf_oracle)  # lazy — schema only
    spec_names = [c for c, _k in cols]
    assert [c for c, _t in df.dtypes] == spec_names, (
        f"{family}/{name}: spec columns {spec_names} != "
        f"query output {[c for c, _t in df.dtypes]} (order matters — the "
        "digest renders columns in select order)"
    )
    for c, t in df.dtypes:
        kind = dict(cols)[c]
        is_float = t in ("double", "float") or t.startswith("decimal")
        assert (kind == "d") == is_float, (
            f"{family}/{name}.{c}: dtype {t} needs kind "
            f"{'d' if is_float else 's'}, spec says {kind!r} — the two "
            "engines would render it differently and the digest mismatches"
        )
