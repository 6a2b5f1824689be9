"""As-of (point-in-time) join — an operator Spark lacks natively.

Semantics: for every left row, attach the latest right row whose timestamp
is <= the left timestamp (optionally within a tolerance), per entity key.
The reference's model implies it (trip start_time -> daily weather row,
SURVEY §2.4 "range/as-of join"); training-data pipelines use it for
feature point-in-time correctness.

Spark-first implementation — the union-sort trick, NOT a theta join:

    tag left/right -> unionByName -> window(partitionBy key, orderBy ts,
    tag) -> last(right_value, ignorenulls) over rows-unbounded-preceding
    -> keep left rows.

Cost: one shuffle on the key + one linear sort pass per partition —
O(n log n) per key group, versus the O(n·m) BroadcastNestedLoopJoin a
naive `l.ts >= r.ts` condition degenerates to. This is the standard
scalable formulation; AQE skew handling applies to the single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"  # right=0 sorts before left=1 on ts ties (<= semantics)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Attach to each left row the most recent right row (right_ts <=
    left_ts) for the same `key`.

    value_cols: right columns to carry (default: all but key/ts).
    tolerance_seconds: matches older than this are nulled out.
    """
    for df, cols, side in ((left, [key, left_ts], "left"), (right, [key, right_ts], "right")):
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(f"asof_join: {side} frame is missing column(s) {missing}; has {df.columns}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, right_ts)]
    bad = [c for c in value_cols if c not in right.columns]
    if bad:
        raise ValueError(f"asof_join: value_cols {bad} not in right frame columns {right.columns}")
    if not value_cols:
        raise ValueError("asof_join: right frame has no value columns to carry")

    lifted = [f"{c}{suffix}" for c in value_cols]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_TAG),
        *[F.col(c).alias(a) for c, a in zip(value_cols, lifted)],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_TAG),
        *[F.lit(None).cast(r.schema[a].dataType).alias(a) for a in lifted],
    )
    r_aligned = r.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c) if c != key else F.col(key)
            for c in left.columns
        ],
        "__ts",
        _TAG,
        *lifted,
    )

    unioned = l.unionByName(r_aligned)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        _TAG,
        "__ts",
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in lifted],
        F.last(F.when(F.col(_TAG) == 0, F.col("__ts")), ignorenulls=True).over(w).alias("__match_ts"),
    )
    out = filled.filter(F.col(_TAG) == 1)
    if tolerance_seconds is not None:
        too_old = (
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__match_ts"))
            > tolerance_seconds * 1_000_000
        )
        out = out.select(
            *left.columns,
            "__match_ts",
            *[F.when(too_old, F.lit(None)).otherwise(F.col(a)).alias(a) for a in lifted],
        )
    return out.select(*left.columns, *lifted)
