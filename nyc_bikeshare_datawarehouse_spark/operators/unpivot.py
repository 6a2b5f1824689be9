"""Unpivot / pivot reshaping.

The reference melts 9 one-hot NOAA weather-type flag columns into
(date_time, weather_type_id) rows with a **driver-side per-column collect
loop** (etl.py:107-118) — O(rows x cols) through the driver, the single
worst scaling decision in the reference. Here the same semantics are one
distributed `stack` expression: no collect, fully codegen'd, scales with
the cluster.

Flag decode semantics preserved exactly (SURVEY §8.8): a flag counts as set
when `trim(value) == "1"` (values arrive as strings with stray whitespace),
and the type id is the integer of the column name's last two characters
(`"WT08" -> 8`, etl.py:114-115).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "name",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long via a single `stack` expression (distributed melt).

    Column values are taken as-is (caller casts to a common type if the
    value columns disagree — stack requires a shared type).
    """
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stack_expr = f"stack({len(value_cols)}, {pairs}) as (`{var_name}`, `{value_name}`)"
    return df.select(*[F.col(c) for c in id_cols], F.expr(stack_expr))


def decode_onehot_flags(
    df: DataFrame,
    id_col: str,
    flag_cols: Sequence[str],
    out_id_col: str = "date_time",
    out_type_col: str = "weather_type_id",
) -> DataFrame:
    """One-hot flag columns -> (id, type_id) bridge rows.

    Reference parity (etl.py:107-118, 165-168): keep rows where the flag,
    trimmed, equals the string "1"; decode the type id from the last two
    chars of the column name.
    """
    long = unpivot(df, [id_col], flag_cols, var_name="flag_name", value_name="flag_value")
    return (
        long.filter(F.trim(F.col("flag_value")) == "1")
        .select(
            F.col(id_col).alias(out_id_col),
            F.substring(F.col("flag_name"), -2, 2).cast("int").alias(out_type_col),
        )
    )


def pivot_flags(
    df: DataFrame,
    id_col: str,
    type_col: str,
    type_values: Sequence[int] | None = None,
) -> DataFrame:
    """Inverse reshaping: long bridge rows -> wide one-hot columns.

    Passing `type_values` pins the output schema and skips the extra
    distinct-scan Spark otherwise runs to discover pivot values — required
    practice at scale.
    """
    grouped = df.groupBy(id_col)
    if type_values is not None:
        p = grouped.pivot(type_col, list(type_values))
    else:
        p = grouped.pivot(type_col)
    return p.count().na.fill(0)
