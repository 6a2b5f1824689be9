"""Skew-handling join helpers for hot keys at scale.

At 100 TB, a handful of hot keys (a mega-station in the trip fact, a bot
user_id in events, a stopword shingle in the dedup index) can put one
shuffle partition orders of magnitude above the rest. Two mitigations,
in preference order:

1. **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on by default
   in session.get_spark): runtime splitting of oversized partitions.
   Zero code — always the first choice.
2. **Salted join** (this module): when AQE can't help — e.g. skewed
   *aggregations*, or joins where the runtime stats arrive too late —
   explicitly shard hot keys by a salt, replicate the small side per
   salt, and join on (key, salt).

`salted_join` implements the classic replicate-broadcast pattern as pure
DataFrame ops; `two_phase_agg` does salted partial aggregation (shard,
partially aggregate, merge); `skew_topk` does salted per-group top-k —
the WINDOW-skew case, which AQE cannot touch at all (a
`Window.partitionBy` needs the whole key in one task, so a 40%-hot key
like `lang='en'` in a web crawl runs alone while the rest of the
cluster idles).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT_COL = "__salt"

#: Join types for which replicate-the-small-side salting is semantics-
#: preserving. With how='right'/'full'/'right_semi', an UNMATCHED small-side
#: row survives the join once per salt replica (num_salts duplicates) — the
#: pattern is only sound when unmatched small-side rows are dropped (inner,
#: semi, anti) or the small side never emits unmatched rows (left).
SALTABLE_JOINS = frozenset({"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"})


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys in `big`: big rows get a random-ish
    (deterministic: hash of the full row won't work for joins, so we use a
    uniform spread via monotonic partition id folded with the key) salt in
    [0, num_salts); `small` is replicated once per salt value. The join key
    becomes (on, salt), so a hot key's rows spread over `num_salts`
    partitions.

    Cost: small side is materialized num_salts times — only use when
    `small` is broadcast-sized and `big` is skewed on `on`.

    `how` is restricted to SALTABLE_JOINS: with right/full joins an
    unmatched small-side row would be emitted once per salt replica."""
    if how.lower() not in SALTABLE_JOINS:
        raise ValueError(
            f"salted_join: how='{how}' is not salt-safe (unmatched small-side "
            f"rows would duplicate per salt); allowed: inner, left, left_semi, left_anti"
        )
    if on not in big.columns or on not in small.columns:
        raise ValueError(f"salted_join: join column '{on}' must exist on both sides")
    if num_salts < 2:
        raise ValueError("salted_join: num_salts must be >= 2 (1 salt = no mitigation)")
    salted_big = big.withColumn(
        SALT_COL, (F.abs(F.xxhash64(F.col(on), F.spark_partition_id())) % num_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias(SALT_COL)
    replicated_small = small.select("*", salts)
    out = salted_big.join(replicated_small, on=[on, SALT_COL], how=how)
    return out.drop(SALT_COL)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    num_salts: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: group by (keys + salt) first (spreads a hot
    key over `num_salts` reducers), then merge the partials by `keys`.

    `aggs`: {column: fn} with fn in {sum, count, min, max} (mergeable
    aggregates only — avg must be expressed as sum+count by the caller).

    Note: Spark's hash aggregate already does map-side partials, which
    handles *input* skew; this helper exists for the reduce-side case
    where one grouping key dominates the shuffle (partial rows from every
    map task still land on one reducer)."""
    salted = df.withColumn(SALT_COL, (F.abs(F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id())) % num_salts).cast("int"))

    phase1_exprs = []
    merge_exprs = []
    for col, fn in aggs.items():
        partial = f"__p_{fn}_{col}"
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(partial))
            merge_exprs.append(F.sum(partial).alias(f"count_{col}"))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(partial))
            merge_exprs.append(F.sum(partial).alias(f"sum_{col}"))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(partial))
            merge_exprs.append(F.min(partial).alias(f"min_{col}"))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(partial))
            merge_exprs.append(F.max(partial).alias(f"max_{col}"))
        else:
            raise ValueError(f"non-mergeable aggregate: {fn}")

    phase1 = salted.groupBy(*keys, SALT_COL).agg(*phase1_exprs)
    return phase1.groupBy(*keys).agg(*merge_exprs)


def skew_topk(
    df: DataFrame,
    part_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    num_salts: int = 8,
    rank_col: str = "rank",
) -> DataFrame:
    """Skew-safe per-group top-k: row-identical to
    ``row_number() OVER (PARTITION BY part ORDER BY order) <= k`` but
    without funneling a whole hot group through one task.

    Phase 1 ranks within (group, salt) and keeps k rows per salted
    subgroup — sound for ANY salt assignment, because a member of the
    group's true top-k is within the top-k of every subset it can land
    in. Phase 2 re-ranks the ≤ k·num_salts survivors per group; that
    second window sees a bounded row count per group regardless of how
    skewed the input was. Two hash shuffles (salted key, then key), the
    second over k·num_salts·n_groups rows only.

    `order_by` must be a TOTAL order within each group (tie-break on a
    unique id) — otherwise the k-th member is partition-dependent in any
    engine, salted or not. Output keeps all input columns plus
    `rank_col` (1-based int)."""
    if k < 1:
        raise ValueError(f"skew_topk: k must be >= 1, got {k}")
    if num_salts < 2:
        raise ValueError("skew_topk: num_salts must be >= 2 (1 salt = no mitigation)")
    salted = df.withColumn(
        SALT_COL,
        (F.abs(F.xxhash64(*[F.col(c) for c in part_cols], F.spark_partition_id())) % num_salts).cast("int"),
    )
    w1 = Window.partitionBy(*part_cols, SALT_COL).orderBy(*order_by)
    survivors = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1", SALT_COL)
    )
    w2 = Window.partitionBy(*part_cols).orderBy(*order_by)
    return survivors.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )
