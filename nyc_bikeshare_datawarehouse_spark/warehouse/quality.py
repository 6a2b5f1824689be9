"""Data-quality gates — the reference's post-load checks as engine
assertions, with its latent bugs fixed.

Reference (data_quality.py:25-41): (a) non-empty table; (b) null-PK count —
but the null gate passed when exactly ONE null existed (`> 1`,
data_quality.py:39), and a build variant inverted the predicate entirely
(SURVEY §8.5). Here: zero nulls means zero; plus two gates the reference's
schema *declares* but never checks (create_tables.sql PRIMARY KEYs are
unenforced in Redshift): PK uniqueness and FK referential integrity.

Each gate computes a single aggregate (one job, no driver materialization
beyond one row) and returns a QualityResult; `check_all` runs a standard
gate battery for a fact/dim pair.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class QualityResult:
    gate: str
    table: str
    passed: bool
    detail: str


def expect_non_empty(df: DataFrame, table: str) -> QualityResult:
    """Gate (a): table has >= 1 row (data_quality.py:25-32)."""
    n = df.limit(1).count()  # limit(1) => scan short-circuits; no full count
    return QualityResult("non_empty", table, n > 0, f"probe_rows={n}")


def expect_no_null_pk(df: DataFrame, table: str, pk: str) -> QualityResult:
    """Gate (b), fixed: ZERO null PKs (reference tolerated one —
    data_quality.py:39 `> 1`)."""
    n = df.filter(F.col(pk).isNull()).count()
    return QualityResult("no_null_pk", table, n == 0, f"null_pk_rows={n}")


def expect_unique_pk(df: DataFrame, table: str, *pk: str) -> QualityResult:
    """PK uniqueness: count == count distinct over the PK column(s).
    Single aggregate pass; at 100 TB prefer this over a groupBy-having
    scan because it short-circuits to two longs."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(c) for c in pk]).alias("nd"),
    ).first()
    return QualityResult("unique_pk", table, row["n"] == row["nd"], f"rows={row['n']} distinct={row['nd']}")


def expect_fk_integrity(fact: DataFrame, dim: DataFrame, table: str, fk: str, pk: str) -> QualityResult:
    """FK referential integrity as a left-anti join (the relational form of
    data_quality.py's count checks): orphan rows must be zero. Broadcast
    the dim when small; Catalyst/AQE decides otherwise."""
    orphans = (
        fact.filter(F.col(fk).isNotNull())
        .join(dim.select(F.col(pk).alias(fk)).dropDuplicates(), on=fk, how="left_anti")
        .limit(1)
        .count()
    )
    return QualityResult("fk_integrity", table, orphans == 0, f"orphan_probe={orphans}")


def profile(df: DataFrame, approx_distinct: bool = True) -> DataFrame:
    """One-pass column profile: per column — null count, null ratio, and
    (approximate by default) distinct count. A single aggregate job
    regardless of column count; the standard pre-gate data inspection.

    Returns one row per column: (column, n_nulls, null_ratio, n_distinct).
    """
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        else:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    row = df.agg(*aggs).first()
    n = row["__n"] or 1
    out = [
        (c, row[f"__nulls_{c}"], round(row[f"__nulls_{c}"] / n, 4), row[f"__nd_{c}"])
        for c in df.columns
    ]
    return spark.createDataFrame(out, "column string, n_nulls long, null_ratio double, n_distinct long")


def profile_frame(df: DataFrame) -> DataFrame:
    """`profile` without the driver round-trip: the same one-pass aggregate,
    reshaped to one-row-per-column entirely in the plan (explode over a
    struct array on the single agg row). Exact distinct counts, so the
    result is oracle-checkable; null_ratio is the raw IEEE quotient
    (bit-identical across engines — no rounding needed).

    One wide aggregate job regardless of column count, then a 1-row
    explode: the reshape costs nothing at any scale."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                (F.col(f"__nulls_{c}") / F.col("__n")).alias("null_ratio"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in df.columns
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def check_all(
    fact: DataFrame,
    table: str,
    pk: str,
    dims: list[tuple[DataFrame, str, str]] | None = None,
) -> list[QualityResult]:
    """Standard battery: non-empty, no-null PK, unique PK, plus FK gates
    for each (dim_df, fk_col, dim_pk_col) triple."""
    results = [
        expect_non_empty(fact, table),
        expect_no_null_pk(fact, table, pk),
        expect_unique_pk(fact, table, pk),
    ]
    for dim_df, fk, dim_pk in dims or []:
        results.append(expect_fk_integrity(fact, dim_df, table, fk, dim_pk))
    return results


def checksum_state(df: DataFrame, cols: list) -> DataFrame:
    """One-row mergeable checksum state (n_rows long, checksum
    decimal(38,0)) over `cols` rendered engine-stable — the partial-
    aggregate algebra behind `content_checksum`: states from disjoint
    row sets ADD (both fields), so per-partition / per-micro-batch /
    per-day states fold into the corpus checksum without re-reading
    history (the same mergeability contract as functions/sketches.py;
    wired to Structured Streaming in streaming/sketches.checksum_stream).

    Canonicalization is INJECTIVE on the column tuple: each column
    becomes a fixed-alphabet token — 32 hex chars of md5(value), or the
    literal '-' for NULL ('-' is outside the hex alphabet, so no value
    can impersonate a NULL and no separator-shift between adjacent
    columns can realign tokens) — before the row md5. A naive
    concat_ws would SKIP nulls (row ('a',NULL,'b') == ('a','b',NULL))
    and let a '|' inside a value shift content across fields; both
    collide real differences into equal checksums."""
    canon = F.concat_ws(
        "|",
        *[
            F.when(c.isNull(), F.lit("-")).otherwise(F.md5(c.cast("string")))
            for c in cols
        ],
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(h), F.lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("checksum"),
    )


def checksum_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two checksum states: counts and sums add."""
    return (
        a.unionByName(b)
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("checksum").cast("decimal(38,0)").alias("checksum"),
        )
    )


def content_checksum(df: DataFrame, cols: list, table: str) -> DataFrame:
    """Order-independent CONTENT checksum of a table over engine-stable
    column renderings — the migration-verification gate the count-based
    checks (expect_* above; reference data_quality.py:25-41) cannot
    provide: equal row counts do not prove equal content after a COPY /
    engine migration / backfill. checksum = Σ over rows of the first 60
    bits of md5(canonical row string), accumulated in DECIMAL(38,0)
    (exact to ~10^38 — 2^60-bit terms over trillions of rows fit), so
    two systems agree iff they hold the same multiset of rows.

    Scale shape: ONE map-side-combined aggregate — each partition emits
    a single (count, partial sum), one 2-value exchange total; nothing
    row-sized leaves the executors. Portable by construction (md5 +
    decimal sum exist everywhere), hence fully oracle-checkable —
    unlike a xxhash64 variant, which would be rows-only.

    `cols` are Column expressions ALREADY rendered engine-stable
    (integers/strings as-is, timestamps via explicit date_format —
    never raw doubles: their decimal rendering is engine-specific)."""
    return checksum_state(df, cols).select(
        F.lit(table).alias("table_name"),
        "n_rows",
        F.col("checksum").cast("string").alias("content_checksum"),
    )


def verified_bulk_load(
    spark,
    source_df: DataFrame,
    table: str,
    checksum_cols: list,
    analyze_columns: list | None = None,
    path: str | None = None,
    label: str | None = None,
) -> DataFrame:
    """The reference's warehouse-stage contract as ONE verifiable step
    (stage_redshift.py:34-48 shape: COPY → post-load ANALYZE → count
    check — with the count check upgraded to a CONTENT check): write
    `source_df` to `table` (external under `path` when given, else
    managed), run ANALYZE TABLE [FOR COLUMNS], then recompute the
    content checksum on BOTH sides — the source plan and the persisted
    table — and return a one-row report
    (table_name, n_rows, content_checksum, loaded_rows,
    loaded_checksum, verified bool).

    verified=false means the persisted bytes do NOT round-trip to the
    source multiset (partial write, concurrent overwrite, engine
    re-encoding bug) even when the counts agree — the failure class a
    COUNT(*) check cannot see. Both checksums are one map-side-combined
    aggregate each; the write is the only corpus-sized cost.

    `checksum_cols` follow the content_checksum contract (engine-stable
    renderings; no raw doubles). `label` names the report row (defaults
    to `table`) — pass it when the physical table name carries a
    session/SF tag that a stable report or oracle must not see."""
    from nyc_bikeshare_datawarehouse_spark.sources.sinks import drop_table

    label = label if label is not None else table
    drop_table(spark, table)
    writer = source_df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    if analyze_columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS "
            + ", ".join(analyze_columns)
        )
    else:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    src = content_checksum(source_df, checksum_cols, label)
    loaded = content_checksum(spark.table(table), checksum_cols, label).select(
        F.col("table_name").alias("__t"),
        F.col("n_rows").alias("loaded_rows"),
        F.col("content_checksum").alias("loaded_checksum"),
    )
    return (
        src.join(loaded, src.table_name == loaded.__t)
        .select(
            "table_name",
            "n_rows",
            "content_checksum",
            "loaded_rows",
            "loaded_checksum",
            (
                (F.col("n_rows") == F.col("loaded_rows"))
                & (F.col("content_checksum") == F.col("loaded_checksum"))
            ).alias("verified"),
        )
    )
