"""Skew-mitigation join operators.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the manual
fallback for the cases AQE can't fix — e.g. a single hot key whose rows all
carry the same join value (AQE can split the probe side, but a broadcast-less
join of one hot key still funnels build-side rows through few tasks), or
deterministic co-partitioning needs across engines.

``salted_join``: the skewed (large) side gets a random-ish salt in
[0, salt_factor); the small side is replicated salt_factor times via an
explode — turning one hot shuffle partition into ``salt_factor`` even ones.
Replication multiplies the small side's shuffle volume, so salt_factor trades
hot-partition latency against total shuffle bytes; 8-32 is the useful range
at 100 TB.

The salt is ``pmod(hash(monotonically_increasing_id()), k)`` — effectively
row-uniform, no RNG state, and never NULL, so inner/left join results are
IDENTICAL to the unsalted join (proved by the parity query
``skew_salted_join`` against a plain-join oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_factor: int = 16,
) -> DataFrame:
    """Equi-join with the skewed side salted and the small side replicated.

    Supports ``inner`` and ``left`` (skewed side preserved) — the join types
    where per-key fan-out of the small side is safe. Result columns match
    ``skewed.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(on)
    s = skewed.withColumn(
        _SALT, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_factor))
    )
    r = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return s.join(r, keys + [_SALT], how).drop(_SALT)
