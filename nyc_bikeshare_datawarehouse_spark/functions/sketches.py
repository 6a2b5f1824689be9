"""Mergeable frequency sketches as DataFrame aggregations.

Count-min (Cormode & Muthukrishnan, J. Algorithms 2005): a d x w counter
grid; every key occurrence increments one cell per row via d independent
hashes; estimate(key) = min over the d cells — always >= the true count,
because collisions only ADD. This is the fixed-memory form of frequency
counting at 100 TB: the shuffle key space is d*w cells REGARDLESS of
vocabulary size, map-side combine collapses each task's stream to <= d*w
partial rows before the exchange, and grids built on disjoint corpus
slices merge by cell-wise addition (the same partial-aggregate algebra as
operators/incremental.py). Hashes are md5-derived — engine-portable, same
rationale as dedup.minhash_lsh_candidates_portable — so the entire sketch
carries a DuckDB oracle instead of a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cm_bucket(key: Column, row_i: int, width: int) -> Column:
    """Row-i hash bucket: first 8 hex chars of md5("i:key") mod width.
    Seeding via the string prefix keeps the d hashes independent and the
    arithmetic replayable in any SQL engine."""
    h = F.md5(F.concat(F.lit(f"{row_i}:"), key))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def _cm_cells(key: Column, depth: int, width: int):
    """posexplode'd (row_i, bucket) pairs for one key occurrence."""
    return F.posexplode(F.array(*[_cm_bucket(key, i, width) for i in range(depth)]))


def countmin_build(
    stream: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Aggregate a key stream into the d x w grid: (row_i, bucket, cell).

    One shuffle whose key space is d*w (bounded, data-independent);
    partial aggregation reduces each input partition to <= d*w rows, so
    network cost is O(tasks * d * w), not O(stream). Missing cells are
    implicit zeros."""
    key = F.col(key_col)
    return (
        stream.select(_cm_cells(key, depth, width).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise addition of two grids built with the same (depth, width)
    — the property that lets per-day / per-slice sketches roll up without
    revisiting the streams."""
    return (
        a.unionByName(b)
        .groupBy("row_i", "bucket")
        .agg(F.sum("cell").cast("long").alias("cell"))
    )


def hll_registers(df: DataFrame, key_col: str, b: int = 6) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007): m = 2^b rows
    (register, rank) where rank is the max leading-zero-run(+1) of the
    60-bit hash tail among keys routed to that register; absent
    registers are zero-filled so the frame always has exactly m rows.

    The registers — not the estimate — are the sketch's durable state:
    integers, bit-exact across engines (md5-derived like every portable
    sketch here, so the whole table carries a DuckDB oracle), mergeable
    by elementwise max (`hll_merge`), O(m) memory per slice regardless
    of stream size. Build cost: one groupBy over m register keys with
    map-side combine — each task emits <= m rows. `hll_estimate` turns
    registers into the cardinality estimate (float math, library-side).
    Spark's own approx_count_distinct is the fused engine-specific form
    (q_approx_distinct); this is the portable, checkable, composable
    one."""
    if not 1 <= b <= 8:
        raise ValueError(f"b must be in [1, 8], got {b}")
    m = 1 << b
    h = F.md5(F.col(key_col).cast("string"))
    # first hex byte -> register (256 % m == 0 for m <= 256: uniform);
    # next 15 hex chars -> 60-bit tail for the leading-zero rank
    idx = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % m
    tail = F.substring(h, 3, 15)
    v = F.conv(tail, 16, 10).cast("long")
    # rank = leading zeros in the 60-bit field + 1 = 61 - bitlength(v);
    # conv(x, 16, 2) drops leading zeros, so its length IS the bitlength
    # (with the v=0 edge pinned explicitly on both engines)
    rank = F.when(v == 0, F.lit(61)).otherwise(61 - F.length(F.conv(tail, 16, 2)))
    regs = (
        df.select(idx.alias("register"), rank.cast("int").alias("rank"))
        .groupBy("register")
        .agg(F.max("rank").alias("rank"))
    )
    spark = df.sparkSession
    full = spark.range(m).select(F.col("id").cast("long").alias("register"))
    return full.join(regs, "register", "left").select(
        "register", F.coalesce(F.col("rank"), F.lit(0)).cast("int").alias("rank")
    )


def hll_registers_grouped(
    df: DataFrame, key_col: str, group_cols: list[str], b: int = 6
) -> DataFrame:
    """Per-GROUP HLL register tables — the sketch-ROLLUP primitive: one
    register table per (group_cols) slice (e.g. per day), zero-filled to
    exactly m rows per group, each mergeable by elementwise max across
    any slice combination (trailing windows, month rollups, global).
    Same md5 derivation as `hll_registers`, so the state is bit-exact
    cross-engine and a slice merge is just MAX(rank) GROUP BY register.
    Build cost: one groupBy on (group, register) with map-side combine —
    each task emits ≤ m rows per group it touched."""
    if not 1 <= b <= 8:
        raise ValueError(f"b must be in [1, 8], got {b}")
    m = 1 << b
    h = F.md5(F.col(key_col).cast("string"))
    idx = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % m
    tail = F.substring(h, 3, 15)
    v = F.conv(tail, 16, 10).cast("long")
    rank = F.when(v == 0, F.lit(61)).otherwise(
        61 - F.length(F.conv(tail, 16, 2))
    )
    regs = (
        df.select(*group_cols, idx.alias("register"), rank.cast("int").alias("rank"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rank").alias("rank"))
    )
    spark = df.sparkSession
    full = df.select(*group_cols).distinct().crossJoin(
        spark.range(m).select(F.col("id").cast("long").alias("register"))
    )
    return full.join(regs, [*group_cols, "register"], "left").select(
        *group_cols,
        "register",
        F.coalesce(F.col("rank"), F.lit(0)).cast("int").alias("rank"),
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of the underlying key sets = elementwise max of registers —
    the property that lets per-day sketches roll up without re-reading
    the streams (same partial-aggregate algebra as countmin_merge)."""
    return (
        a.unionByName(b)
        .groupBy("register")
        .agg(F.max("rank").cast("int").alias("rank"))
    )


def hll_estimate(regs: DataFrame) -> float:
    """Bias-corrected cardinality estimate from a register table:
    alpha_m * m^2 / sum(2^-rank), with the small-range linear-counting
    correction (E <= 2.5m and empty registers present). Driver-side
    float math over m rows — the sketch state stays distributed; only
    the m-row register table ever reaches the driver."""
    rows = regs.collect()
    m = len(rows)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    inv_sum = sum(2.0 ** -r["rank"] for r in rows)
    est = alpha * m * m / inv_sum
    zeros = sum(1 for r in rows if r["rank"] == 0)
    if est <= 2.5 * m and zeros > 0:
        import math

        est = m * math.log(m / zeros)
    return est


def kmv_sketch(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """KMV / bottom-k sketch (Bar-Yossef et al. 2002; the theta-sketch
    family): the k smallest md5-derived 60-bit hash values of the key
    set — one column `hval`. Unlike HLL it supports SET OPERATIONS:
    union = bottom-k of the merged value lists (`kmv_union`), and
    intersections estimate via the Jaccard of survivors
    (`kmv_jaccard`), which registers cannot express. The state is a
    deterministic integer list (bit-exact across engines — full oracle),
    built as distinct-hash + TakeOrdered: per-partition heaps, O(k)
    rows to the driver side of the plan, never a global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hval")
    )
    return df.select(h).distinct().orderBy("hval").limit(k)


def _kmv_check_k(k: int, n_rows: int, what: str) -> None:
    """A sketch holding more rows than the claimed k was built with a
    LARGER k — normalizing by the wrong one silently truncates or skews
    the estimate, so mismatches fail loudly instead (ADVICE r6)."""
    if n_rows > k:
        raise ValueError(
            f"{what}: sketch holds {n_rows} values but k={k}; "
            "pass the k the sketch was built with"
        )


def kmv_union(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Sketch of the union of the underlying sets, from sketches alone.
    `k` must be the k the inputs were built with (validated against
    their row counts — they are O(k) frames, the count is free)."""
    _kmv_check_k(k, a.count(), "kmv_union(a)")
    _kmv_check_k(k, b.count(), "kmv_union(b)")
    return a.unionByName(b).distinct().orderBy("hval").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 64) -> float:
    """Distinct-count estimate: (k-1) / normalized k-th minimum; exact
    when fewer than k distinct values exist (the sketch IS the set).
    Raises if the sketch holds more than k values (built with a larger
    k — the k-th-minimum formula would mis-normalize)."""
    vals = sorted(r["hval"] for r in sketch.collect())
    _kmv_check_k(k, len(vals), "kmv_estimate")
    if len(vals) < k:
        return float(len(vals))
    return (k - 1) * float(1 << 60) / vals[-1]


def kmv_jaccard(a: DataFrame, b: DataFrame, k: int = 64) -> float:
    """Jaccard estimate of the underlying sets from their sketches: the
    fraction of the merged bottom-k that appears in BOTH — multiply by
    `kmv_estimate(kmv_union(a, b))` for the intersection cardinality.
    Like kmv_union, validates k against the sketch sizes."""
    sa = {r["hval"] for r in a.collect()}
    sb = {r["hval"] for r in b.collect()}
    _kmv_check_k(k, len(sa), "kmv_jaccard(a)")
    _kmv_check_k(k, len(sb), "kmv_jaccard(b)")
    merged = sorted(sa | sb)[:k]
    if not merged:
        return 0.0
    return sum(1 for v in merged if v in sa and v in sb) / len(merged)


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    est_col: str = "cm_est",
) -> DataFrame:
    """Point estimates for the probe keys: min over the key's d cells.
    The grid (d*w rows) is broadcast; the probe side never shuffles its
    payload — only the final per-key min aggregation moves (probe, d)
    rows. Keys absent from the stream estimate to 0 (upward-biased like
    every count-min estimate; never below the true count)."""
    key = F.col(key_col)
    keep = list(probes.columns)
    p = probes.select("*", _cm_cells(key, depth, width).alias("row_i", "bucket"))
    joined = p.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
    return joined.groupBy(*keep).agg(
        F.min(F.coalesce(F.col("cell"), F.lit(0).cast("long"))).alias(est_col)
    )


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    n_bins: int = 256,
) -> DataFrame:
    """Fixed-width histogram sketch over a numeric column: (bin, cnt)
    rows, bin = floor((x - lo) / w) clamped into [0, n_bins) — the
    quantile member of the portable sketch family (count-min = point
    frequency, HLL/KMV = distinct, histogram = distribution). Same
    algebra as the others: the shuffle key space is n_bins regardless of
    data volume, map-side combine collapses each task to <= n_bins
    partial rows, and slices merge by bin-wise addition
    (`histogram_merge`), so per-day sketches roll up without re-reading
    the streams — including via the streaming maintainer
    (streaming/sketches.histogram_stream). All-integer state -> full
    bit-exact DuckDB oracle (q_histogram_quantiles).

    `(hi - lo)` must divide evenly by n_bins (integer bin width) so the
    binning expression replays exactly in any engine."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if (hi - lo) % n_bins != 0:
        raise ValueError(
            f"(hi - lo) = {hi - lo} must be divisible by n_bins = {n_bins} "
            "for an integer bin width"
        )
    w = (hi - lo) // n_bins
    x = F.col(value_col)
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((x - F.lit(lo)) / F.lit(w)).cast("long")),
    )
    return (
        df.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bin-wise addition — the roll-up algebra (same shape as
    countmin_merge)."""
    return (
        a.unionByName(b).groupBy("bin").agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    q_bps: list[int],
    lo: int,
    hi: int,
    n_bins: int = 256,
) -> DataFrame:
    """Quantile estimates from the histogram sketch, ALL-INTEGER:
    for each quantile q (basis points), target rank k = ceil(q*N/10000)
    computed as (q*N + 9999) div 10000, the covering bin found on the
    running cumulative count, and the within-bin linear interpolation
    emitted as floor-truncated 1e-4 fixed point:

        est = bin_lo + floor(w * (k - cum_before - 1) * 10000
                             / cnt_bin) / 10000

    No float enters until the final /10000.0 display division, so the
    estimate is bit-exact across engines (the oracle replays it
    verbatim). Distributed shape: the sketch is O(n_bins); the cumsum
    window runs on that bounded frame, and the quantile probe list is a
    broadcast literal."""
    if any(not 0 < q <= 10000 for q in q_bps):
        raise ValueError(f"q_bps must be in (0, 10000], got {q_bps}")
    w = (hi - lo) // n_bins
    from pyspark.sql import Window

    total = sketch.agg(F.sum("cnt").cast("long").alias("__n"))
    cum = sketch.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("cum_before", F.col("cum") - F.col("cnt"))
    qs = sketch.sparkSession.createDataFrame(
        [(int(q),) for q in q_bps], "q_bp int"
    ).crossJoin(F.broadcast(total))
    ranked = qs.withColumn(
        "k", ((F.col("q_bp") * F.col("__n") + F.lit(9999)) / F.lit(10000)).cast("long")
    )
    # covering bin: smallest cum >= k (one row per quantile — the join is
    # bounded by n_bins * |q_bps|, then min-reduced)
    joined = (
        ranked.join(F.broadcast(cum), F.col("cum") >= F.col("k"))
        .groupBy("q_bp", "k")
        .agg(
            F.min(F.struct("bin", "cnt", "cum_before")).alias("__b"),
        )
        .select("q_bp", "k", F.col("__b.bin").alias("bin"),
                F.col("__b.cnt").alias("cnt"),
                F.col("__b.cum_before").alias("cum_before"))
    )
    est_fp = (
        (F.lit(lo) + F.col("bin") * F.lit(w)) * F.lit(10000)
        + F.floor(
            F.lit(w) * (F.col("k") - F.col("cum_before") - 1) * F.lit(10000)
            / F.col("cnt")
        )
    ).cast("long")
    return joined.select(
        "q_bp", (est_fp / F.lit(10000.0)).alias("est")
    ).orderBy("q_bp")
