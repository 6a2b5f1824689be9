"""Distribution-drift metrics between two slices of a corpus.

Population Stability Index (PSI) — the standard production monitor for
"did this week's data shift against the reference week" (public modeling
literature; widely used for training-data snapshot comparison). Bins come
from the REFERENCE slice's own quantiles, so the metric is self-calibrating:

    PSI = Σ_bins (ref_frac − cur_frac) · ln(ref_frac / cur_frac)

rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.

Determinism contract (driver oracle rules): bin edges are the per-tile MAX
of an `ntile(n)` over the reference ordered by (value, tiebreak) — a total
order, so edges are exact data values both engines agree on bit-for-bit.
Binning is "count of edges strictly below v" against the first n−1 edges —
a pure comparison on exact doubles. Counts are exact longs; fractions are
Laplace-smoothed ((n_i + 1)/(N + bins), sidestepping ln(0) on empty bins)
and only the final ln/product is floored to 6 decimals (`_trunc` rule —
both inputs to ln are identical doubles cross-engine, so the result
matches to the last ulp in practice, same class as q_unigram_logprob).

Scale: bin edges ride the DISTRIBUTED two-phase NTILE
(`operators/windows.two_phase_ntile`) — rows range-bucketed on a
min/max-derived monotone bucket of the value (one 1-row broadcast for the
stats, one hash shuffle on the bucket key), never a corpus-slice
`ntile().over(Window.orderBy(...))` single-task sort (the r11 verdict's
remaining scale-killer here). The sequential NTILE stays in the DuckDB
oracle, so a green q_psi_drift row is the equivalence proof (the
q_zorder/q_shard_assign evidence pattern). For 100 TB references the
sketch path (functions/sketches.histogram_sketch + psi_from_histograms)
avoids even that one shuffle. Binning the
current slice is a broadcast nested-loop against the O(bins) edge frame —
the current slice never shuffles at all. Totals ride 1-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_edges(
    ref: DataFrame,
    value_col: str,
    n_bins: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(edge_idx, edge) — the n_bins−1 internal bin boundaries: max value
    of each of the first n_bins−1 reference ntiles under a total order.

    Tile assignment is `operators/windows.two_phase_ntile` (bit-identical
    to SQL NTILE, proven by the sequential-NTILE oracle): rows are
    range-bucketed by a linear min/max map of the value — monotone
    non-decreasing along the (value, tiebreak) total order, so the
    two-phase contract holds; ties land in one bucket, which only costs
    balance, never correctness. All-equal references (min == max)
    degenerate to one bucket, guarding the width division (ANSI 0/0)."""
    from nyc_bikeshare_datawarehouse_spark.operators.windows import (
        two_phase_ntile,
    )

    order = [F.col(value_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    n_buckets = 64
    stats = ref.agg(
        F.min(F.col(value_col).cast("double")).alias("__vmin"),
        F.max(F.col(value_col).cast("double")).alias("__vmax"),
    )
    v = F.col(value_col).cast("double")
    width = (F.col("__vmax") - F.col("__vmin")) / F.lit(float(n_buckets))
    bucket = F.when(
        F.col("__vmax") > F.col("__vmin"),
        F.least(F.floor((v - F.col("__vmin")) / width), F.lit(n_buckets - 1)),
    ).otherwise(F.lit(0))
    tiled = two_phase_ntile(
        ref.crossJoin(F.broadcast(stats)),
        n_bins,
        bucket,
        order,
        tile_col="__tile",
    )
    return (
        tiled.groupBy("__tile")
        .agg(F.max(value_col).alias("edge"))
        .filter(F.col("__tile") < n_bins)
        .select(F.col("__tile").cast("int").alias("edge_idx"), "edge")
    )


def _bin_counts(df: DataFrame, value_col: str, edges: DataFrame, n_bins: int) -> DataFrame:
    """(bin, n) with every bin 0..n_bins−1 present (zero-filled).
    bin(v) = number of edges strictly below v — a function of the value,
    so bins are computed per DISTINCT value (pre-aggregated with its
    multiplicity) and the broadcast edge expansion touches only the
    distinct-value frame, not every source row."""
    spark = df.sparkSession
    per_value = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__mult")
    )
    value_bins = (
        per_value.crossJoin(F.broadcast(edges.select("edge")))
        .groupBy("__v", "__mult")
        .agg(F.sum(F.when(F.col("edge") < F.col("__v"), 1).otherwise(0)).alias("bin"))
        .groupBy("bin")
        .agg(F.sum("__mult").alias("n"))
    )
    all_bins = spark.range(n_bins).select(F.col("id").cast("bigint").alias("bin"))
    return (
        all_bins.join(value_bins, "bin", "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)).cast("long"))
    )


def psi_table(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-bin PSI decomposition: (bin, ref_n, cur_n, psi_contrib).
    Total PSI = SUM(psi_contrib); emitting the decomposition keeps the
    output explainable (which bins drove the drift) and O(bins)."""
    edges = quantile_edges(ref, value_col, n_bins, tiebreak_col)
    rb = _bin_counts(ref, value_col, edges, n_bins).withColumnRenamed("n", "ref_n")
    cb = _bin_counts(cur, value_col, edges, n_bins).withColumnRenamed("n", "cur_n")
    rt = ref.agg(F.count(F.lit(1)).alias("__rt"))
    ct = cur.agg(F.count(F.lit(1)).alias("__ct"))
    scale = 10 ** round_to
    joined = (
        rb.join(cb, "bin")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(ct))
    )
    rp = (F.col("ref_n") + 1).cast("double") / (F.col("__rt") + n_bins).cast("double")
    cp = (F.col("cur_n") + 1).cast("double") / (F.col("__ct") + n_bins).cast("double")
    contrib = F.floor((rp - cp) * F.log(rp / cp) * scale) / scale
    return joined.select(
        F.col("bin").cast("int").alias("bin"),
        "ref_n",
        "cur_n",
        contrib.alias("psi_contrib"),
    )


def ks_stat(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bucket=None,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the reference and
    current slices: max over all values v of |F_ref(v) − F_cur(v)| — the
    nonparametric companion to `psi_table` (no binning choice at all).
    Returns ONE row: (ks_value = the smallest v attaining the max gap,
    ref_n, cur_n, gap_num, ks_stat).

    Exactness: CDF steps are integer cumulative counts, and the gap is
    compared as the INTEGER |cum_ref·n_cur − cum_cur·n_ref| (cross-
    multiplied — no float enters the argmax), so the selected row is
    bit-deterministic cross-engine; only the final ks_stat = gap/(n_r·n_c)
    is floored to `round_to` decimals. Long arithmetic bounds the slices
    at ~3·10^9 rows each (gap_num ≤ n_r·n_c); beyond that switch the
    product to decimal(38,0) on both engines.

    Scale: per-side value counts are map-side-combined groupBys; the
    merged distinct-value frame gets BOTH running sums in one pass of
    `two_phase_cumsum` (range-bucketed, never a single-task corpus
    window; `bucket` defaults to floor(value) — supply a tighter
    monotone bucketing for heavily-skewed domains); the argmax is a
    TakeOrdered(1), O(1) to the driver."""
    from nyc_bikeshare_datawarehouse_spark.operators.windows import two_phase_cumsum

    if bucket is None:
        bucket = F.floor(F.col("__v"))
    rc = ref.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__r")
    )
    cc = cur.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    merged = (
        rc.join(cc, "__v", "full_outer")
        .select(
            "__v",
            F.coalesce(F.col("__r"), F.lit(0)).alias("__r"),
            F.coalesce(F.col("__c"), F.lit(0)).alias("__c"),
        )
    )
    cum = two_phase_cumsum(
        merged, bucket, [F.col("__v")], [("__r", "__cr"), ("__c", "__cc")]
    )
    rt = ref.agg(F.count(F.lit(1)).alias("__nr"))
    ct = cur.agg(F.count(F.lit(1)).alias("__nc"))
    scale = 10 ** round_to
    gap = F.abs(F.col("__cr") * F.col("__nc") - F.col("__cc") * F.col("__nr"))
    return (
        cum.crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(ct))
        .select(
            F.col("__v").alias("ks_value"),
            F.col("__nr").cast("long").alias("ref_n"),
            F.col("__nc").cast("long").alias("cur_n"),
            gap.cast("long").alias("gap_num"),
            (
                F.floor(gap / (F.col("__nr") * F.col("__nc")).cast("double") * scale)
                / scale
            ).alias("ks_stat"),
        )
        .orderBy(F.col("gap_num").desc(), F.col("ks_value"))
        .limit(1)
    )


def psi_from_histograms(
    ref_sketch: DataFrame,
    cur_sketch: DataFrame,
    n_bins: int = 256,
    round_to: int = 6,
) -> DataFrame:
    """PSI computed from two fixed-width histogram SKETCHES (the
    (bin, cnt) frames of functions/sketches.histogram_sketch — including
    states maintained incrementally by streaming/sketches'
    foreachBatch maintainer): per-bin Laplace-smoothed
    (p − q)·ln(p/q), same determinism contract as `psi_table`. This is
    the STREAMING/rollup path of drift monitoring: the corpora are never
    re-read — two O(n_bins) frames join, nothing else moves. Bins the
    two sketches must share come from the same (lo, hi, n_bins) config;
    missing bins count 0 on either side. Quantile-binned `psi_table`
    and this fixed-width form answer the same question with different
    bin semantics — use this one when the reference is a maintained
    sketch rather than a queryable slice."""
    spark = ref_sketch.sparkSession
    all_bins = spark.range(n_bins).select(F.col("id").cast("bigint").alias("bin"))
    r = all_bins.join(ref_sketch.withColumnRenamed("cnt", "ref_n"), "bin", "left")
    c = all_bins.join(cur_sketch.withColumnRenamed("cnt", "cur_n"), "bin", "left")
    rt = ref_sketch.agg(F.sum("cnt").alias("__rt"))
    ct = cur_sketch.agg(F.sum("cnt").alias("__ct"))
    scale = 10 ** round_to
    joined = (
        r.join(c, "bin")
        .select(
            "bin",
            F.coalesce(F.col("ref_n"), F.lit(0)).cast("long").alias("ref_n"),
            F.coalesce(F.col("cur_n"), F.lit(0)).cast("long").alias("cur_n"),
        )
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(ct))
    )
    rp = (F.col("ref_n") + 1).cast("double") / (F.col("__rt") + n_bins).cast("double")
    cp = (F.col("cur_n") + 1).cast("double") / (F.col("__ct") + n_bins).cast("double")
    contrib = F.floor((rp - cp) * F.log(rp / cp) * scale) / scale
    return joined.select(
        F.col("bin").cast("int").alias("bin"),
        "ref_n",
        "cur_n",
        contrib.alias("psi_contrib"),
    )


def chi2_independence(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Pearson chi-square test of independence over a categorical
    contingency table — the categorical sibling of ks_stat (continuous)
    and psi_table (binned): did the row/column factors decouple?

    Determinism contract: observed counts, marginals and the grand
    total are EXACT longs; each cell's statistic is derived from them
    with the verbatim expression tree

        num  = o·g − rt·ct            (products in DOUBLE, one subtract)
        cell = num² / (g · rt · ct) · g   -- i.e. (o−e)²/e with e=rt·ct/g

    which is DETERMINISTIC cross-engine (the q_ab_ttest corollary:
    identical +,−,×,÷ expression trees over exact integer aggregates
    round identically), then FLOOR-quantized to micro-units per cell
    BEFORE summation so the total is an exact integer sum — immune to
    partial-aggregation order. Note deterministic ≠ exact: the DOUBLE
    products lose integer exactness once o·g or rt·ct exceeds 2^53
    (≈9e15 — corpora past ~95M rows per label pair), where the
    quantized statistic can drift from the true value by an ulp-scale
    amount while both engines still agree bit-for-bit; past that bound
    compute num/denom in DECIMAL(38,0) (the q_gini_concentration
    pattern) at ~2× the cell-frame cost. ZERO cells are
    materialized (row-universe × col-universe cross of the two O(k)
    distinct frames) because (0−e)²/e contributes.

    NULL categories are EXCLUDED up front (documented contract): a
    NULL key would silently miss the grid equi-join while still
    counting in its marginal, corrupting every expected count — the
    filter makes "rows with both labels present" the tested population.

    Scale: one corpus groupBy on the (row, col) pair; everything after
    runs on the O(R·C) cell frame (bounded by category cardinalities).
    Returns per-cell rows (row_key, col_key, o, contrib_micro) plus
    the same chi2_micro / dof totals on every row (O(cells) windows)."""
    # localCheckpoint: cells feeds three consumers (row marginals, col
    # marginals, the grid join) — without truncation Spark re-runs the
    # corpus groupBy per consumer (diverged-subplan rule, CLAUDE.md)
    cells = (
        df.filter(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
        .groupBy(
            F.col(row_col).alias("row_key"), F.col(col_col).alias("col_key")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .localCheckpoint(eager=True)
    )
    rows = cells.groupBy("row_key").agg(F.sum("o").alias("rt"))
    cols = cells.groupBy("col_key").agg(F.sum("o").alias("ct"))
    grid = rows.crossJoin(cols)  # O(R·C), both sides O(k) frames
    full = grid.join(cells, ["row_key", "col_key"], "left").select(
        "row_key",
        "col_key",
        F.coalesce("o", F.lit(0)).cast("long").alias("o"),
        "rt",
        "ct",
        F.sum(F.coalesce("o", F.lit(0)))
        .over(Window.partitionBy())  # O(R·C) frame: cells, not corpus
        .cast("long")
        .alias("g"),
    )
    num = F.col("o").cast("double") * F.col("g").cast("double") - F.col(
        "rt"
    ).cast("double") * F.col("ct").cast("double")
    denom = (
        F.col("g").cast("double")
        * F.col("rt").cast("double")
        * F.col("ct").cast("double")
    )
    contrib = F.floor(
        num * num / denom * F.lit(1000000.0)
    ).cast("long")
    scored = full.select(
        "row_key", "col_key", "o", contrib.alias("contrib_micro")
    )
    dims = rows.agg(F.count(F.lit(1)).alias("__r")).crossJoin(
        cols.agg(F.count(F.lit(1)).alias("__c"))
    )
    wtot = Window.partitionBy()  # O(R·C) frame: cells, not corpus
    return scored.crossJoin(F.broadcast(dims)).select(
        "row_key",
        "col_key",
        "o",
        "contrib_micro",
        F.sum("contrib_micro").over(wtot).cast("long").alias("chi2_micro"),
        ((F.col("__r") - 1) * (F.col("__c") - 1)).cast("long").alias("dof"),
    )
