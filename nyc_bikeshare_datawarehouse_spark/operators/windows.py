"""Window-function helpers: top-k, deterministic ids, date parts.

Reference parity notes:
- `deterministic_id` replaces `monotonically_increasing_id` (etl.py:91),
  which is partition-layout-dependent and therefore run-dependent. A
  deterministic surrogate key needs a total order; at 100 TB prefer a
  *natural composite key* or a hash of one (`md5(concat(...))`,
  sql_queries.py:4) over a global row_number, because a single unpartitioned
  window is a 1-task bottleneck. `deterministic_id` is offered for
  small/medium dims; `hash_key` is the scale path.
- `with_date_parts` mirrors the dim_datetime derivation (etl.py:186-192).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Deterministic top-k: always a total order (include a unique key in
    `order_by`!) then limit. Spark executes as TakeOrderedAndProject —
    per-partition heap + driver merge of k rows, no full sort at scale."""
    return df.orderBy(*order_by).limit(k)


def deterministic_id(
    df: DataFrame,
    order_by: Sequence[str | Column],
    id_col: str = "id",
) -> DataFrame:
    """Stable 1-based dense id from a total order (row_number over an
    unpartitioned window — fine for dims, NOT for 100 TB facts; use
    `hash_key` there)."""
    w = Window.orderBy(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    return df.withColumn(id_col, F.row_number().over(w).cast("long"))


def hash_key(cols: Sequence[str | Column], id_col: str = "id") -> Column:
    """Deterministic, shuffle-free surrogate key: md5 over the natural key
    (the reference's own pattern, sql_queries.py:4). Collision-safe enough
    for 128-bit at any realistic cardinality."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.md5(F.concat_ws("", *parts)).alias(id_col)


def with_date_parts(df: DataFrame, ts_col: str, prefix: str = "") -> DataFrame:
    """Append the reference's seven date parts (etl.py:186-192)."""
    c = F.col(ts_col)
    return (
        df.withColumn(f"{prefix}hour", F.hour(c))
        .withColumn(f"{prefix}day", F.dayofmonth(c))
        .withColumn(f"{prefix}week", F.weekofyear(c))
        .withColumn(f"{prefix}month", F.month(c))
        .withColumn(f"{prefix}weekday", F.dayofweek(c))
        .withColumn(f"{prefix}year", F.year(c))
        .withColumn(f"{prefix}quarter", F.quarter(c))
    )
