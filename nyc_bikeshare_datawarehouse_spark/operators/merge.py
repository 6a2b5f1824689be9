"""Merge/upsert patterns on plain parquet (no table-format dependency).

The reference refreshed its warehouse with truncate-and-load (DELETE +
COPY, stage_redshift.py:38-48). Between full truncation and a real
lakehouse MERGE sits the parquet-native upsert implemented here:

- `merge_upsert` (SCD1): updates win over target rows on the key; new
  keys append. One full-outer join on the key — at scale, combine with
  partition pruning (join only the partitions the updates touch, then
  `overwrite_partitions`) so a small update batch never rewrites the
  whole table.
- `changed_rows`: the CDC-style diff between two snapshots (added /
  removed / updated) via a full-outer join on the key + row comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """SCD1 upsert: rows from `updates` replace same-key rows in
    `target`; unmatched update rows are inserts. Column sets must match."""
    cols = target.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            "merge_upsert: column sets differ — "
            f"target-only {sorted(set(cols) - set(updates.columns))}, "
            f"updates-only {sorted(set(updates.columns) - set(cols))}"
        )
    if key not in cols:
        raise ValueError(f"merge_upsert: key '{key}' not in columns {cols}")
    t = target.alias("t")
    u = updates.alias("u")
    joined = t.join(u, on=F.col(f"t.{key}") == F.col(f"u.{key}"), how="full")
    # "updates win" is whole-row precedence, not per-column coalesce: a
    # legitimate NULL in an update column must survive
    has_update = F.col(f"u.{key}").isNotNull()
    return joined.select(
        *[F.when(has_update, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c) for c in cols]
    )


def scd2_history(
    snapshots: DataFrame,
    key: str,
    ts_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a stream of keyed
    snapshots: one row per (key, value-version) with valid_from /
    valid_to (null = current). Consecutive identical versions collapse.

    Window formulation: order each key's snapshots by ts, keep rows whose
    compared values differ from the previous snapshot (version starts),
    then valid_to = next version's valid_from. One shuffle on the key,
    two window passes over the same sort."""
    from pyspark.sql import Window

    compare_cols = compare_cols or [c for c in snapshots.columns if c not in (key, ts_col)]
    w = Window.partitionBy(key).orderBy(ts_col)
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    is_start = F.lag(F.col(ts_col)).over(w).isNull() | changed
    starts = snapshots.withColumn("__start", is_start).filter(F.col("__start")).drop("__start")
    w2 = Window.partitionBy(key).orderBy(ts_col)
    return (
        starts.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .drop(ts_col)
    )


def changed_rows(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Snapshot diff: one row per changed key with change_type in
    ('added', 'removed', 'updated'). Unchanged keys are dropped. The
    key-only projection of `changed_rows_detail` — one classifier,
    two entry points."""
    return changed_rows_detail(old, new, key).select(key, "change_type")


def changed_rows_detail(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """`changed_rows` with the before/after values carried along: one
    row per changed key with change_type plus old_<col>/new_<col> for
    every value column (NULL on the absent side) — the payload a CDC
    consumer (audit table, delta feed, reconciliation report) actually
    needs. Same single full-outer join keyed on `key`; no extra pass."""
    cols = [c for c in old.columns if c != key]
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, on=F.col(f"o.{key}") == F.col(f"n.{key}"), how="full")
    in_old = F.col(f"o.{key}").isNotNull()
    in_new = F.col(f"n.{key}").isNotNull()
    differs = F.lit(False)
    for c in cols:
        differs = differs | ~(F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")))
    change = (
        F.when(in_old & ~in_new, "removed")
        .when(~in_old & in_new, "added")
        .when(in_old & in_new & differs, "updated")
    )
    carried = [F.col(f"o.{c}").alias(f"old_{c}") for c in cols] + [
        F.col(f"n.{c}").alias(f"new_{c}") for c in cols
    ]
    return (
        joined.select(
            F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key),
            change.alias("change_type"),
            *carried,
        )
        .filter(F.col("change_type").isNotNull())
    )
