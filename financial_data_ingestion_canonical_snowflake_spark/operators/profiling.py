"""Column-level data profiling: per-column completeness / cardinality /
range stats in one corpus pass.

The table-stats primitive every warehouse exposes (Snowflake's own
information-schema profiling, Delta's column stats, Deequ-style data
quality checks): per column — row count, non-null count, null fraction,
distinct count, lexical min/max. Feeds freshness/completeness monitoring
and optimizer-style pruning decisions.

Spark-first shape: ONE aggregate over the table computes every column's
stats (map-side partial aggregation reduces each partition to a single
row), then a ``stack`` unpivot reshapes the 1-row wide result into one row
per column — the unpivot runs on ONE row, so the whole operator costs one
scan + one 1-row exchange at any table size.

Distinct counts: ``exact=False`` (default) uses ``approx_count_distinct``
(HyperLogLog++, one pass, mergeable — the 100 TB path). ``exact=True``
uses ``countDistinct``, which Catalyst plans via ``Expand`` (the input is
replicated once per distinct aggregate — one logical pass but n_cols x the
rows through the aggregate); exact mode is for fixture-scale parity
checking and small dimension tables. The parity oracle pins exact mode
(DuckDB's approx sketch differs from Spark's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: list[str] | None = None, exact: bool = False
) -> DataFrame:
    """One row per column: ``(col_name, n_rows, n_nonnull, n_nulls,
    null_frac, n_distinct, min_value, max_value)`` (``col_name``, not
    ``column`` — the natural name is a reserved word in ANSI engines the
    oracle runs on).

    ``min_value``/``max_value`` are the column min/max cast to string
    (uniform output schema across column types). NULLs are excluded from
    distinct counts and min/max (both engines' aggregate semantics).
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_columns: no columns to profile")
    ndv = F.countDistinct if exact else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).cast("long").alias("__n_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).cast("long").alias(f"__{c}__nn"),
            ndv(col).cast("long").alias(f"__{c}__ndv"),
            F.min(col).cast("string").alias(f"__{c}__min"),
            F.max(col).cast("string").alias(f"__{c}__max"),
        ]
    wide = df.agg(*aggs)

    stack_args = []
    for c in cols:
        # escape quote/backtick: column names are interpolated into a SQL
        # string literal and backticked identifiers
        lit = c.replace("'", "''")
        ident = c.replace("`", "``")
        stack_args += [
            f"'{lit}'",
            f"`__{ident}__nn`", f"`__{ident}__ndv`",
            f"`__{ident}__min`", f"`__{ident}__max`",
        ]
    stacked = wide.select(
        "__n_rows",
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) "
            "AS (col_name, n_nonnull, n_distinct, min_value, max_value)"
        ),
    )
    n_rows = F.col("__n_rows")
    nn = F.col("n_nonnull")
    return stacked.select(
        "col_name",
        n_rows.alias("n_rows"),
        nn.alias("n_nonnull"),
        (n_rows - nn).cast("long").alias("n_nulls"),
        ((n_rows - nn).cast("double") / n_rows.cast("double")).alias("null_frac"),
        "n_distinct",
        "min_value",
        "max_value",
    )
