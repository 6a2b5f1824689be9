"""Classifier-evaluation metrics at corpus scale — exact, integer-first.

A curation pipeline trains quality/contamination/language classifiers
(functions/selection.py, functions/text.py) and then has to EVALUATE them
over the same 100 TB corpus it scores. These are the three evaluation
primitives, each designed so engine and oracle agree bit-for-bit:

- `roc_auc`: EXACT ROC-AUC (Mann-Whitney U with tie-averaged ranks) for
  many one-vs-rest labels in ONE pass. Never ranks the corpus row-by-row:
  rows collapse to per-distinct-score counts first (map-side combinable
  groupBy — the score key space, not the corpus, bounds the state), then
  the cumulative negative counts come from `two_phase_cumsum`, so there is
  no corpus-sized single-partition window at any scale. All rank algebra
  stays in longs (2·U is integral even with ties); the only float op is
  the final division of two exact longs — IEEE-correctly-rounded, hence
  identical in Spark and DuckDB.

- `welch_ttest`: Welch's unequal-variance t-test between two variants
  (the A/B readout over experiment events). Per-variant n / Σv / Σv² are
  EXACT integer sums of caller-quantized longs (one conditional aggregate,
  one reduce to a single row); mean/variance/t/dof are then derived in
  doubles with the same expression tree the oracle uses — every step is
  +,-,×,÷,sqrt on identical inputs, all IEEE correctly rounded, so the
  doubles are bit-identical cross-engine (the q_ab_ttest gate proves it).
  Σv² is the overflow hazard, not Σv: quantize so v² · rows < 2^63.

- `threshold_metrics`: confusion counts + precision/recall/F1 over a
  literal threshold grid. The grid joins as a broadcast literal frame
  (one corpus scan serves every threshold via the conditional aggregate;
  no per-threshold pass), counts are exact longs, ratios are single
  divisions of exact longs.

No reference counterpart (LLM-pipeline extension surface; the reference's
analytics stop at warehouse SQL — sql_queries.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.windows import two_phase_cumsum


def roc_auc(
    df: DataFrame,
    score: Column,
    labels: Sequence[tuple[str, Column]],
    bucket_width: int = 4096,
) -> DataFrame:
    """Exact one-vs-rest ROC-AUC for each (name, boolean Column) in
    `labels`, sharing one scan + one cumulative pass.

    With ties handled by average ranks, AUC = U / (n_pos · n_neg) where
    U = Σ_s pos_s · (neg_below_s + neg_s / 2) over distinct scores s.
    2·U is integral, so the engine carries `u2 = Σ pos_s · (2·neg_below_s
    + neg_s)` in longs and divides once at the end:
    auc = u2 / (2 · n_pos · n_neg).

    Scale shape: groupBy(score) is map-side combinable (state = distinct
    scores, not rows); `two_phase_cumsum` turns the grouped frame into
    global below-counts with one bucket-key shuffle and a B-row driver
    window; the final aggregate is a single reduced row exploded to one
    output row per label. `score` must be integral (quantize floats with
    FLOOR(x·scale + 0.5) so the oracle can reproduce the key exactly).

    Output: (label, n_pos, n_neg, u2, auc) — auc NULL when a class is
    empty. Longs throughout; u2 < 2·n_pos·n_neg, so corpora beyond ~3e9
    rows per class need the decimal(38,0) variant of the same algebra.
    """
    tags = [name for name, _ in labels]
    grouped = df.groupBy(score.alias("__s")).agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[
            F.sum(c.cast("int")).cast("long").alias(f"__pos_{i}")
            for i, (_, c) in enumerate(labels)
        ],
    )
    values = [("__cnt", "__cum_cnt")] + [
        (f"__pos_{i}", f"__cum_pos_{i}") for i in range(len(labels))
    ]
    cum = two_phase_cumsum(
        grouped,
        bucket=F.floor(F.col("__s") / bucket_width),
        order_by=[F.col("__s")],
        values=values,
    )
    # neg_below = rows strictly below s minus positives strictly below s
    # (cumsum is inclusive, so subtract the current score's own counts).
    terms = []
    for i in range(len(labels)):
        pos = F.col(f"__pos_{i}")
        neg = F.col("__cnt") - pos
        neg_below = (F.col("__cum_cnt") - F.col("__cnt")) - (
            F.col(f"__cum_pos_{i}") - pos
        )
        terms += [
            F.sum(pos * (2 * neg_below + neg)).alias(f"__u2_{i}"),
            F.sum(pos).alias(f"__np_{i}"),
        ]
    one = cum.agg(F.sum("__cnt").alias("__n"), *terms)
    per_label = one.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(tags[i]).alias("label"),
                    F.col(f"__np_{i}").alias("n_pos"),
                    (F.col("__n") - F.col(f"__np_{i}")).alias("n_neg"),
                    F.col(f"__u2_{i}").alias("u2"),
                )
                for i in range(len(labels))
            ])
        ).alias("r")
    ).select("r.*")
    return per_label.select(
        "label",
        "n_pos",
        "n_neg",
        "u2",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("u2").cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
    )


def welch_ttest(
    df: DataFrame,
    variant: Column,
    value: Column,
    group_a: str = "A",
    group_b: str = "B",
) -> DataFrame:
    """Welch's two-sample t-test (unequal variances) between two variants.

    `value` must already be an exact integer quantization (e.g. cents as
    long): n / Σv / Σv² are then exact longs from ONE conditional
    aggregate — a single all-to-one reduce whose partial aggregates are
    six longs, the cheapest possible shape at any corpus size. The
    derived statistics (sample mean and variance, t, Welch-Satterthwaite
    dof) are doubles computed from those longs with a fixed expression
    tree mirrored verbatim in the oracle SQL.

    Output (one row): n_a, n_b, sum_a, sum_b, mean_a, mean_b, var_a,
    var_b, t_stat, dof — NULL statistics when a variant has < 2 rows.
    """

    def side(tag: str, suffix: str):
        match = F.when(variant == tag, value)
        return [
            F.count(match).alias(f"n_{suffix}"),
            F.sum(match).alias(f"sum_{suffix}"),
            F.sum(
                F.when(variant == tag, value * value)
            ).alias(f"ss_{suffix}"),
        ]

    agg = df.agg(*side(group_a, "a"), *side(group_b, "b"))

    def stats(suffix: str):
        n = F.col(f"n_{suffix}").cast("double")
        s = F.col(f"sum_{suffix}").cast("double")
        ss = F.col(f"ss_{suffix}").cast("double")
        mean = s / n
        var = (ss - s * s / n) / (n - F.lit(1.0))
        return mean, var, n

    mean_a, var_a, n_a = stats("a")
    mean_b, var_b, n_b = stats("b")
    se2 = var_a / n_a + var_b / n_b
    t = (mean_a - mean_b) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (var_a / n_a) * (var_a / n_a) / (n_a - F.lit(1.0))
        + (var_b / n_b) * (var_b / n_b) / (n_b - F.lit(1.0))
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    # se2 = 0 (both groups constant) makes t and dof 0/0 — under ANSI
    # (Spark 4 default) that's a DIVIDE_BY_ZERO crash, not a NaN, so the
    # degenerate case must be guarded out explicitly (hypothesis-found;
    # the oracle mirrors the guard)
    ok_t = ok & (se2 > 0)
    return agg.select(
        "n_a",
        "n_b",
        "sum_a",
        "sum_b",
        F.when(F.col("n_a") >= 1, mean_a).alias("mean_a"),
        F.when(F.col("n_b") >= 1, mean_b).alias("mean_b"),
        F.when(ok, var_a).alias("var_a"),
        F.when(ok, var_b).alias("var_b"),
        F.when(ok_t, t).alias("t_stat"),
        F.when(ok_t, dof).alias("dof"),
    )


def threshold_metrics(
    df: DataFrame,
    score: Column,
    label: Column,
    thresholds: Sequence[int],
) -> DataFrame:
    """Precision / recall / F1 of `score >= threshold` against a boolean
    `label`, for every threshold in one corpus scan.

    The grid is a broadcast literal frame (VALUES-style inline source —
    q_literal_lookup's shape); the cross join fans each row out only
    len(thresholds) times BEFORE the aggregate's map-side combine, so the
    shuffle carries len(thresholds) partial-count rows per task, not the
    corpus. Counts are exact longs; precision/recall/F1 are single
    divisions (and one ×2) of exact longs — bit-stable cross-engine.
    NULL where a denominator is zero (no predicted / no actual positives).
    """
    return confusion_report(confusion_state(df, score, label, thresholds))


def confusion_state(
    df: DataFrame,
    score: Column,
    label: Column,
    thresholds: Sequence[int],
) -> DataFrame:
    """The additive half of `threshold_metrics`: exact confusion longs
    per threshold, len(thresholds) rows. Counts ADD across disjoint
    slices of a corpus — the mergeable-algebra property the streaming
    maintainer (streaming/sketches.confusion_stream) folds micro-batches
    with — so state stays bounded at the grid size forever."""
    spark = df.sparkSession
    grid = spark.createDataFrame(
        [(int(t),) for t in thresholds], "threshold long"
    )
    tagged = df.select(score.alias("__score"), label.cast("int").alias("__y"))
    j = tagged.crossJoin(F.broadcast(grid))
    pred = (F.col("__score") >= F.col("threshold")).cast("int")
    return j.groupBy("threshold").agg(
        F.sum(pred * F.col("__y")).alias("tp"),
        F.sum(pred * (1 - F.col("__y"))).alias("fp"),
        F.sum((1 - pred) * F.col("__y")).alias("fn"),
        F.sum((1 - pred) * (1 - F.col("__y"))).alias("tn"),
    )


def confusion_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise ADD of two confusion states (same threshold grid)."""
    return (
        a.unionByName(b)
        .groupBy("threshold")
        .agg(*[F.sum(c).alias(c) for c in ("tp", "fp", "fn", "tn")])
    )


def confusion_report(agg: DataFrame) -> DataFrame:
    """Derive precision/recall/F1 from a confusion state — single
    divisions of exact longs, the same expression tree the
    q_threshold_metrics oracle mirrors."""
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    precision = F.when(
        tp + fp > 0, tp.cast("double") / (tp + fp).cast("double")
    )
    recall = F.when(tp + fn > 0, tp.cast("double") / (tp + fn).cast("double"))
    f1 = F.when(
        (2 * tp + fp + fn) > 0,
        (2 * tp).cast("double") / (2 * tp + fp + fn).cast("double"),
    )
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
) -> DataFrame:
    """Exact tie-averaged Spearman rank correlation of two integral
    columns per group — the monotone-drift readout (does value creep
    with time? does quality sink with length?) that Pearson misses and
    sampled estimators fuzz.

    Ranks come from per-(group, value) counts: avg_rank = below + (cnt
    + 1)/2, carried as the integral r2 = 2·below + cnt + 1. The rank
    maps are KEY-SPACE-bounded (distinct values per group, not rows) —
    the per-group rank window runs over the grouped frame (O(distinct)
    partitions) and the maps broadcast back onto the corpus, so rows
    shuffle once into the final per-group aggregate. rho is then
    Pearson on the r2 ranks: exact long sums (n, Σrx, Σry, Σrx·ry,
    Σrx², Σry²) reduced per group, doubles only afterwards with the
    oracle-mirrored expression tree. Σrx·ry ≤ 4n³ bounds a group at
    ~1.3e6 rows in longs — beyond that, switch the moment sums to
    decimal(38,0) on both engines.

    Output per group: (group, n, rho); rho NULL when either column is
    constant within the group (zero variance)."""
    base = df.select(
        F.col(group_col).alias("__g"), x.alias("__x"), y.alias("__y")
    )

    def rank2_map(col: str, out: str) -> DataFrame:
        cnts = base.groupBy("__g", col).agg(F.count(F.lit(1)).alias("__cnt"))
        w = (
            Window.partitionBy("__g")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        below = F.sum("__cnt").over(w) - F.col("__cnt")
        return cnts.select(
            "__g", col, (2 * below + F.col("__cnt") + 1).alias(out)
        )

    j = base.join(F.broadcast(rank2_map("__x", "__rx")), ["__g", "__x"]).join(
        F.broadcast(rank2_map("__y", "__ry")), ["__g", "__y"]
    )
    agg = j.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__rx").alias("__sx"),
        F.sum("__ry").alias("__sy"),
        F.sum(F.col("__rx") * F.col("__ry")).alias("__sxy"),
        F.sum(F.col("__rx") * F.col("__rx")).alias("__sxx"),
        F.sum(F.col("__ry") * F.col("__ry")).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    num = n * F.col("__sxy").cast("double") - sx * sy
    denx = n * F.col("__sxx").cast("double") - sx * sx
    deny = n * F.col("__syy").cast("double") - sy * sy
    return agg.select(
        F.col("__g").alias(group_col),
        "n",
        F.when(
            (denx > 0) & (deny > 0), num / (F.sqrt(denx) * F.sqrt(deny))
        ).alias("rho"),
    )


def cohens_kappa(df: DataFrame, rater_a: Column, rater_b: Column) -> DataFrame:
    """Cohen's kappa between two boolean raters (label vs classifier,
    or two annotation pipelines) — chance-corrected agreement over the
    whole corpus in ONE conditional aggregate.

    Exact single-division integer form: with confusion longs n11/n10/
    n01/n00 and n = their sum,
        kappa = (n·(n11+n00) − E) / (n² − E),
        E = (n11+n10)(n11+n01) + (n01+n00)(n10+n00),
    so engine and oracle divide the same two exact longs (n² bounds a
    corpus at ~3e9 rows in longs). po/pe are emitted as the same
    single divisions. Output: one row (n11, n10, n01, n00, po, pe,
    kappa); kappa NULL when pe = 1 (both raters constant)."""
    a = rater_a.cast("int")
    b = rater_b.cast("int")
    agg = df.agg(
        F.sum(a * b).alias("n11"),
        F.sum(a * (1 - b)).alias("n10"),
        F.sum((1 - a) * b).alias("n01"),
        F.sum((1 - a) * (1 - b)).alias("n00"),
    )
    n11, n10, n01, n00 = (F.col(c) for c in ("n11", "n10", "n01", "n00"))
    n = n11 + n10 + n01 + n00
    e = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    return agg.select(
        "n11",
        "n10",
        "n01",
        "n00",
        ((n11 + n00).cast("double") / n.cast("double")).alias("po"),
        (e.cast("double") / (n * n).cast("double")).alias("pe"),
        F.when(
            n * n - e > 0,
            (n * (n11 + n00) - e).cast("double") / (n * n - e).cast("double"),
        ).alias("kappa"),
    )


#: Poisson(1) CDF quantized to basis points (floor(P(X<=k)·10000)) — the
#: deterministic resampling ladder: an md5-uniform u in [0,10000) maps to
#: the replicate weight w = min{k : u < CDF_bp[k]}. Literal integers so
#: engine and oracle draw IDENTICAL weights.
POISSON1_CDF_BP = (3678, 7357, 9196, 9810, 9963, 9994, 9999)


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: Column,
    value: Column,
    n_replicates: int = 64,
    lo_bp: int = 250,
    hi_bp: int = 9750,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the MEAN of an exact
    integer column — error bars over a 100 TB corpus in one pass, no
    history resampling. Each row draws a deterministic Poisson(1)
    weight per replicate from md5(id ‖ ':' ‖ rep) (the hash_sample
    idiom, so draws are identical cross-engine and stable under
    recomputation); replicate means are weighted exact-long sums with
    one final division, and the CI endpoints are the DISCRETE rank
    statistics of the R replicate means (rank = ceil(bp·R/10000) — an
    element of the set, no interpolation, so engines agree bit-level).

    Scale shape: the fan-out is R× BEFORE a map-side-combinable
    groupBy(rep), so the shuffle carries R partial rows per task; the
    rank window runs over R rows (O(k)). Σw·x bounds: w ≤ 7, so the
    value quantization budget is ~2^63/(7·rows).

    Output (one row): n, point_mean, ci_lo, ci_hi, n_replicates."""
    base = df.select(id_col.cast("string").alias("__id"), value.alias("__x"))
    fan = base.select(
        "__id",
        "__x",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("__rep"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("__id"), F.lit(":"), F.col("__rep").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    w = F.lit(len(POISSON1_CDF_BP))
    for k in range(len(POISSON1_CDF_BP) - 1, -1, -1):
        w = F.when(u < POISSON1_CDF_BP[k], k).otherwise(w)
    per_rep = fan.select("__rep", w.alias("__w"), F.col("__x")).groupBy("__rep").agg(
        F.sum("__w").alias("__n_eff"),
        F.sum(F.col("__w") * F.col("__x")).alias("__s"),
    )
    means = per_rep.select(
        "__rep",
        F.when(
            F.col("__n_eff") > 0,
            F.col("__s").cast("double") / F.col("__n_eff").cast("double"),
        ).alias("__m"),
    )
    lo_rank = max(1, -(-lo_bp * n_replicates // 10000))
    hi_rank = max(1, -(-hi_bp * n_replicates // 10000))
    ranked = means.withColumn(
        "__rn",
        F.row_number().over(Window.orderBy(F.col("__m"), F.col("__rep"))),
    )
    ci = ranked.agg(
        F.max(F.when(F.col("__rn") == lo_rank, F.col("__m"))).alias("ci_lo"),
        F.max(F.when(F.col("__rn") == hi_rank, F.col("__m"))).alias("ci_hi"),
        F.count(F.lit(1)).alias("n_replicates"),
    )
    point = base.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("__x").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "point_mean"
        ),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n", "point_mean", "ci_lo", "ci_hi", "n_replicates"
    )


def calibration_bins(
    df: DataFrame,
    score: Column,
    label: Column,
    bin_width: int,
) -> DataFrame:
    """Reliability-diagram bins: group rows by fixed-width score bins
    and report observed positive rate next to the mean score — the
    calibration readout that AUC (pure discrimination) cannot see. One
    map-side-combinable groupBy on the integral bin key; n/Σscore/Σpos
    are exact longs, the two rates are single divisions. Output per
    non-empty bin: (bin_lo, n, mean_score, pos_rate)."""
    binned = df.select(
        (F.floor(score / bin_width) * bin_width).cast("long").alias("bin_lo"),
        score.alias("__s"),
        label.cast("int").alias("__y"),
    )
    agg = binned.groupBy("bin_lo").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__s").alias("__sum_s"),
        F.sum("__y").alias("__pos"),
    )
    return agg.select(
        "bin_lo",
        "n",
        (F.col("__sum_s").cast("double") / F.col("n").cast("double")).alias(
            "mean_score"
        ),
        (F.col("__pos").cast("double") / F.col("n").cast("double")).alias(
            "pos_rate"
        ),
    )


def isotonic_fit(bins: DataFrame) -> DataFrame:
    """Monotone non-decreasing calibration of binned positive rates —
    PAVA's output computed through the exact minimax closed form
    iso(i) = max_{j≤i} min_{l≥i} pooled-rate(j..l) (Barlow et al.
    1972, public literature), with every pooled rate QUANTIZED to
    integer micro-units BEFORE comparison so max/min run on exact
    longs and the fit is engine-identical (the fitted value can sit
    1 µ-unit from float PAVA at a quantization boundary — the price
    of a hash-checkable fit).

    `bins` must carry (bin_lo, n, pos) with exact-long n/pos. The
    interval grid is O(k³) rows on the BIN frame — k is the bin
    count (bounded by the caller's literal bin width), never the
    corpus, so the two inequality joins stay broadcast-tiny at any
    data scale. Returns (bin_lo, n, raw_micro, iso_micro)."""
    wi = Window.orderBy("bin_lo")  # O(k) frame: bin count, not corpus
    idx = bins.select(
        "bin_lo",
        "n",
        F.col("pos").alias("__pos"),
        F.row_number().over(wi).alias("i"),
        F.sum("n").over(wi).alias("__cn"),
        F.sum("pos").over(wi).alias("__cp"),
    ).localCheckpoint(eager=True)
    lo = idx.select(
        F.col("i").alias("j"),
        (F.col("__cn") - F.col("n")).alias("__cn_before"),
        (F.col("__cp") - F.col("__pos")).alias("__cp_before"),
    )
    hi = idx.select(
        F.col("i").alias("l"),
        F.col("__cn").alias("__cn_to"),
        F.col("__cp").alias("__cp_to"),
    )
    intervals = lo.join(hi, F.col("j") <= F.col("l")).select(
        "j",
        "l",
        F.expr(
            "((__cp_to - __cp_before) * 1000000) div (__cn_to - __cn_before)"
        ).alias("q"),
    )
    pos = idx.select("i", "bin_lo", "n", "__pos")
    iso = (
        pos.join(
            intervals,
            (F.col("j") <= F.col("i")) & (F.col("l") >= F.col("i")),
        )
        .groupBy("i", "bin_lo", "n", "__pos", "j")
        .agg(F.min("q").alias("__minq"))
        .groupBy("i", "bin_lo", "n", "__pos")
        .agg(F.max("__minq").alias("iso_micro"))
    )
    return iso.select(
        "bin_lo",
        "n",
        F.expr("(__pos * 1000000) div n").cast("long").alias("raw_micro"),
        F.col("iso_micro").cast("long").alias("iso_micro"),
    )


def kaplan_meier(durations: DataFrame) -> DataFrame:
    """Kaplan-Meier survival curve (Kaplan & Meier 1958 — public
    literature) over a frame of (dur, ev) rows: integer duration plus
    1 = event observed / 0 = right-censored. Returns one row per
    distinct EVENT time t: (t, n_risk, d_events, survival) where
    n_risk counts all durations ≥ t (censored included) and

        S(t_i) = Π_{j ≤ i} (1 − d_j / n_j)

    Cross-engine float contract (CLAUDE.md): d and n are exact longs;
    each factor is one correctly-rounded divide + subtract, and the
    product is a LEFT FOLD over factors in ascending-t order — the
    identical sequential expression tree in Spark (`aggregate` seeded
    from the first element) and DuckDB (`list_reduce`), so every
    prefix product is bit-identical. No exp/ln shortcut (not correctly
    rounded).

    Scale shape: the heavy work is ONE map-side-combinable groupBy on
    the duration key; everything after runs on the distinct-duration
    frame, whose size is bounded by the time-resolution span (hours of
    corpus coverage), not the corpus — so the single-partition window
    and the in-row fold are O(k) by construction, the house rule for
    rank-then-fold curves."""
    per_t = durations.groupBy(F.col("dur").alias("t")).agg(
        F.sum(F.col("ev").cast("long")).alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    # n_risk(t) = suffix sum of counts over descending t: O(k) frame
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t", "d", F.sum("c").over(w).cast("long").alias("n")
    ).filter(F.col("d") > 0)
    # fold factors ascending-t inside one O(k) array; prefix product per
    # index replays the same left association the oracle uses
    packed = risk.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("t", "d", "n"))
        ).alias("__rows")
    )
    factors = F.transform(
        F.col("__rows"),
        lambda r: F.lit(1.0)
        - r["d"].cast("double") / r["n"].cast("double"),
    )
    exploded = packed.select(
        F.posexplode(F.col("__rows")).alias("__i0", "__r"),
        factors.alias("__f"),
    ).select(
        F.col("__r")["t"].alias("t"),
        F.col("__r")["n"].alias("n_risk"),
        F.col("__r")["d"].alias("d_events"),
        (F.col("__i0") + 1).alias("__i"),
        F.col("__f").alias("__fs"),
    )
    survival = F.aggregate(
        F.slice(F.col("__fs"), 2, F.col("__i") - 1),
        F.element_at(F.col("__fs"), 1),
        lambda acc, x: acc * x,
    )
    return exploded.select("t", "n_risk", "d_events", survival.alias("survival"))
