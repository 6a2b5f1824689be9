"""Exact global order statistics WITHOUT a global sort.

The scale problem: an exact global median/quantile naively needs either a
total sort (one-task bottleneck in the final merge, and a full shuffle of
the corpus) or Spark's built-in `percentile` aggregate, which buffers the
group's values — unbounded state for a global quantile at 100 TB.

`exact_rank_values` is the classic distributed selection algorithm
(iterative range partitioning / multi-round Blum-style select): each round
is ONE full-scan aggregate that histograms the current candidate value
range into `n_buckets`, the driver keeps only the O(n_buckets) counts,
picks the bucket containing the target rank, and recurses INTO that value
range with the rank offset carried forward. The candidate set shrinks
~n_buckets× per round, so log_B(N) rounds (2-3 in practice) of cheap
map-side-combined aggregates replace the sort; the terminal slice (at most
`max_slice` rows, or a single tied value) resolves with a TakeOrdered —
per-partition heaps, O(slice) network.

Determinism: bucket boundaries derive from the slice's own exact min/max
(aggregate results, identical everywhere); rank arithmetic is integer;
the returned value is an element OF the column (no interpolation), so
engines agree bit-for-bit. Ties are benign — rank selection by value only
ever needs the VALUE at a rank, which is tie-order independent.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _non_null_vals(df: DataFrame, c: Column) -> DataFrame:
    """Project `c` as __v and drop NULLs — and, for float/double columns,
    NaNs too: NaN is not NULL, survives isNotNull(), and poisons min/max
    (max returns NaN, bucket width becomes NaN, every row buckets NULL)."""
    vals = df.select(c.alias("__v"))
    if vals.schema["__v"].dataType.simpleString() in ("float", "double"):
        return vals.filter(F.col("__v").isNotNull() & ~F.isnan("__v"))
    return vals.filter(F.col("__v").isNotNull())


def exact_rank_values(
    df: DataFrame,
    col: str | Column,
    ranks: Sequence[int] | None = None,
    n_buckets: int = 1024,
    max_slice: int = 65536,
    quantiles_bp: Sequence[int] | None = None,
) -> dict[int, float]:
    """Exact value at each 1-based `rank` of `col`'s ascending order.

    Rounds are SHARED across ranks: the worklist holds (slice, offset,
    ranks-in-slice) groups, so every rank rides the same first full-scan
    histogram and only diverges once targets land in different buckets —
    q quantiles cost ~log_B(N) scans TOTAL, not per quantile. Driver-
    side state is O(n_buckets) counts per round — the bounded-collect
    class (sketch states); the corpus is only ever scanned by map-side-
    combined aggregates plus one final TakeOrdered per resolved rank.
    NULLs are excluded (SQL ORDER BY semantics for rank selection over
    non-null values).

    Pass `quantiles_bp` (basis points) instead of absolute `ranks` to
    have ranks derived as GREATEST(1, ceil(q·N/10000)) from the FIRST
    round's own count — callers then skip a dedicated count() scan.
    With absolute `ranks`, a rank past the column's row count raises
    ValueError (the first round knows N)."""
    if (ranks is None) == (quantiles_bp is None):
        raise ValueError("pass exactly one of ranks / quantiles_bp")
    if not (ranks if ranks is not None else quantiles_bp):
        raise ValueError("ranks / quantiles_bp must be non-empty")
    if ranks is not None and min(ranks) < 1:
        # ranks are 1-based; an invalid 0/negative rank would otherwise
        # negative-index the terminal slice and return a WRONG value
        raise ValueError(f"ranks must be >= 1, got {min(ranks)}")
    c = F.col(col) if isinstance(col, str) else col
    vals = _non_null_vals(df, c)
    out: dict[int, float] = {}
    # worklist groups: (predicate, offset = rows strictly before slice,
    # ranks awaiting resolution inside the slice)
    work: list[tuple[Column, int, list[int]]] = [
        (F.lit(True), 0, sorted(set(ranks)) if ranks is not None else [])
    ]
    first_round = True
    while work:
        pred, offset, group = work.pop()
        sl = vals.filter(pred)
        stats = sl.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
        ).head()
        n, lo, hi = stats["n"], stats["lo"], stats["hi"]
        if first_round:
            first_round = False
            if quantiles_bp is not None:
                group = sorted({max(1, (bp * n + 9999) // 10000) for bp in quantiles_bp})
            if n == 0 or (group and group[-1] > n):
                raise ValueError(f"ranks {group} out of range (column has {n} rows)")
        if n == 0:
            raise ValueError(f"ranks {group} out of range (empty slice)")
        if lo == hi:
            for rank in group:  # the whole slice is one tied value
                out[rank] = float(lo)
            continue
        if n <= max_slice:
            # terminal: ONE TakeOrdered of (max pending rank - offset)
            # rows resolves EVERY rank in the slice — per-partition
            # heaps, O(k ≤ max_slice) doubles over the network, one job
            # per slice instead of one per rank
            k = group[-1] - offset
            top = sorted(r["__v"] for r in sl.orderBy("__v").limit(k).collect())
            for rank in group:
                out[rank] = float(top[rank - offset - 1])
            continue
        width = (hi - lo) / n_buckets
        # The narrowing predicate is the SAME bucket expression the
        # counts grouped on (literal lo/width of this round), not
        # reconstructed range bounds — a 1-ulp floor straddle at a
        # bucket edge would otherwise desynchronize offset and slice.
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("__v") - F.lit(lo)) / F.lit(width)).cast("int"),
        )
        counts = dict(
            (r["b"], r["n"])
            for r in sl.groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        # one cumulative walk assigns EVERY pending rank to its bucket
        by_bucket: dict[int, tuple[int, list[int]]] = {}
        cum, b, it = offset, 0, iter(group)
        rank = next(it)
        while True:
            nb = counts.get(b, 0)
            while cum + nb >= rank:
                off_b, rks = by_bucket.setdefault(b, (cum, []))
                rks.append(rank)
                nxt = next(it, None)
                if nxt is None:
                    rank = None
                    break
                rank = nxt
            if rank is None:
                break
            cum += nb
            b += 1
            if b >= n_buckets:  # pragma: no cover - rank <= n guaranteed
                raise AssertionError("rank walked past every bucket")
        for b, (off_b, rks) in by_bucket.items():
            work.append((pred & (bucket == F.lit(b)), off_b, rks))
    return out


def exact_group_quantile(
    df: DataFrame,
    group_col: str,
    col: str | Column,
    q_bp: int = 5000,
    n_buckets: int = 256,
    max_slice: int = 65536,
) -> DataFrame:
    """EXACT per-group quantile (rank = ceil(q·n_g), q in basis points)
    for EVERY group in ONE set of shared scans — the grouped sibling of
    `exact_rank_values`, and since round 10 a thin wrapper over
    `exact_group_quantiles` (the multi-quantile work-group machinery)
    with a single basis point: one implementation owns the
    determinism-critical bucket-chain replay.

    Why not a window: `Window.partitionBy(group)` funnels each group
    through ONE sort task — the r01 scale-killer for macroscopic groups
    (languages, sources, days). Why not a per-group loop: G groups would
    pay G·log(N) scans. Here every round is ONE aggregate
    `groupBy((group, work-group), bucket)` with per-group histogram
    parameters on a broadcast state frame, and all terminal groups of a
    round resolve in ONE batched windowed job (see
    exact_group_quantiles for the invariants).

    Returns (group, n, rank, value) with rank =
    GREATEST(1, ceil(q_bp·n/10000)). The group column keeps its input
    type; NULL group keys and NULL/NaN values are excluded (rank
    selection needs an equatable key; aggregate NULLs into a sentinel
    first if they must participate)."""
    return exact_group_quantiles(
        df, group_col, col, quantiles_bp=(q_bp,),
        n_buckets=n_buckets, max_slice=max_slice,
    ).drop("q_bp")


def exact_quantiles_frame(
    df: DataFrame,
    col: str | Column,
    quantiles: Sequence[float],
    n_buckets: int = 1024,
    max_slice: int = 65536,
) -> DataFrame:
    """One row per quantile q: (q, rank, value) with rank = ceil(q·N) —
    the discrete (no-interpolation) quantile, so `value` is an element of
    the column and both engines agree exactly. Built on
    `exact_rank_values`; N counts non-null values."""
    c = F.col(col) if isinstance(col, str) else col
    spark = df.sparkSession
    n = _non_null_vals(df, c).count()
    # ceil(q*N) in exact integer arithmetic: q scaled to basis points.
    # Half-UP (floor(x+0.5)), not Python round()'s banker's rounding —
    # matches DuckDB ROUND (half away from zero) for non-negative q, so a
    # caller-supplied q landing exactly on .5 bp agrees with the oracle.
    ranks = {q: max(1, (int(math.floor(q * 10000 + 0.5)) * n + 9999) // 10000) for q in quantiles}
    vals = exact_rank_values(df, c, sorted(set(ranks.values())), n_buckets, max_slice)
    rows = [(float(q), int(r), vals[r]) for q, r in sorted(ranks.items())]
    return spark.createDataFrame(rows, "q double, rank long, value double")


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    col: str | Column,
    quantiles_bp: Sequence[int] = (2500, 5000, 7500),
    n_buckets: int = 256,
    max_slice: int = 65536,
) -> DataFrame:
    """EXACT value at MULTIPLE quantiles (basis points; rank =
    GREATEST(1, ceil(bp·n_g/10000))) for EVERY group — all groups AND
    all quantiles sharing the same scans.

    The unit of driver state is a WORK-GROUP: (group, slice-chain,
    pending ranks). All of a group's ranks start in one work-group and
    ride the same histogram; when ranks land in different buckets the
    work-group SPLITS, and because every split child is exactly one
    level deeper, all active work-groups keep a uniform chain depth —
    the invariant that lets one broadcast-state scan serve every
    work-group per round. A value row joined to its group's state rows
    survives the chain filters for AT MOST ONE work-group (diverged
    chains differ in some chosen bucket, and the filters compare every
    level), so the fan-out of the state join is bounded by the number
    of rank-clusters per group (<= len(quantiles_bp)) and each round is
    still ONE groupBy((group, work-group), bucket) aggregate.

    Terminals batch exactly like exact_group_quantile: one windowed job
    resolves every work-group that finished this round, with
    array_contains(ks, row_number) picking ALL of that slice's pending
    ranks at once. Cost: ~log_B(max_g n_g) shared scans TOTAL — adding
    quantiles adds rank-cluster rows to the broadcast state, not scans.

    Returns (group, q_bp int, n long, rank long, value double); ties in
    rank (two bps mapping to the same rank in a small group) resolve to
    the same value, one output row per DISTINCT bp (duplicates in
    `quantiles_bp` are collapsed). NULL groups/values (and float NaNs)
    are excluded as in exact_group_quantile."""
    if not quantiles_bp:
        raise ValueError("quantiles_bp must be non-empty")
    bad = [bp for bp in quantiles_bp if not 1 <= bp <= 10000]
    if bad:
        # bp > 10000 would derive rank > n_g, which no bucket walk can
        # resolve (KeyError at output assembly); bp < 1 would clamp to
        # rank 1 silently — reject both up front like exact_rank_values
        raise ValueError(f"quantiles_bp must be within [1, 10000], got {bad}")
    quantiles_bp = sorted(set(quantiles_bp))
    c = F.col(col) if isinstance(col, str) else col
    spark = df.sparkSession
    g_type = df.select(F.col(group_col).alias("__g")).schema["__g"].dataType.simpleString()
    vals = df.select(F.col(group_col).alias("__g"), c.alias("__v")).filter(
        F.col("__v").isNotNull() & F.col("__g").isNotNull()
    )
    if vals.schema["__v"].dataType.simpleString() in ("float", "double"):
        vals = vals.filter(~F.isnan("__v"))
    B = n_buckets

    def bucket_expr(lo, width):
        return F.least(
            F.lit(B - 1),
            F.floor((F.col("__v") - lo) / width).cast("int"),
        )

    stats = vals.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
    ).collect()
    totals = {r["__g"]: r["n"] for r in stats}
    rank_of: dict = {}  # (g, bp) -> rank
    active: list[dict] = []
    for r in stats:
        n = r["n"]
        for bp in quantiles_bp:
            rank_of[(r["__g"], bp)] = max(1, (bp * n + 9999) // 10000)
        active.append({
            "g": r["__g"],
            "ranks": sorted({rank_of[(r["__g"], bp)] for bp in quantiles_bp}),
            "offset": 0, "n": n,
            "lo": float(r["lo"]), "hi": float(r["hi"]),
            "chain": [],
        })
    resolved: dict = {}  # (g, rank) -> value
    while active:
        term: list[dict] = []
        pend: list[dict] = []
        for s in active:
            if s["lo"] == s["hi"]:
                for rank in s["ranks"]:  # one tied value fills the slice
                    resolved[(s["g"], rank)] = s["lo"]
            elif s["n"] <= max_slice:
                term.append(s)
            else:
                pend.append(s)
        # uniform depth across term+pend: every child of a split is one
        # level deeper than its parent, and all roots started at depth 0
        if term:
            depth_t = len(term[0]["chain"])
            assert all(len(s["chain"]) == depth_t for s in term)
            tstate = spark.createDataFrame(
                [
                    (
                        wid,
                        s["g"],
                        [lo for lo, _, _ in s["chain"]],
                        [w for _, w, _ in s["chain"]],
                        [b for _, _, b in s["chain"]],
                        [rank - s["offset"] for rank in s["ranks"]],
                    )
                    for wid, s in enumerate(term)
                ],
                f"__wid int, __g {g_type}, __los array<double>, "
                "__ws array<double>, __bs array<int>, __ks array<long>",
            )
            tj = vals.join(F.broadcast(tstate), "__g")
            for i in range(1, depth_t + 1):
                tj = tj.filter(
                    bucket_expr(
                        F.element_at("__los", F.lit(i)),
                        F.element_at("__ws", F.lit(i)),
                    )
                    == F.element_at("__bs", F.lit(i))
                )
            from pyspark.sql import Window

            rn = F.row_number().over(
                Window.partitionBy("__g", "__wid").orderBy("__v")
            ).cast("long")
            rows = (
                tj.withColumn("__rn", rn)
                .filter(F.array_contains("__ks", F.col("__rn")))
                .select("__wid", "__g", "__rn", "__v")
                .collect()
            )
            offsets = {wid: s["offset"] for wid, s in enumerate(term)}
            for r in rows:
                resolved[(r["__g"], r["__rn"] + offsets[r["__wid"]])] = float(r["__v"])
        if not pend:
            break
        depth = len(pend[0]["chain"])
        assert all(len(s["chain"]) == depth for s in pend)
        gstate = spark.createDataFrame(
            [
                (
                    wid,
                    s["g"],
                    [lo for lo, _, _ in s["chain"]],
                    [w for _, w, _ in s["chain"]],
                    [b for _, _, b in s["chain"]],
                    s["lo"],
                    (s["hi"] - s["lo"]) / B,
                )
                for wid, s in enumerate(pend)
            ],
            f"__wid int, __g {g_type}, __los array<double>, __ws array<double>, "
            "__bs array<int>, __clo double, __cw double",
        )
        joined = vals.join(F.broadcast(gstate), "__g")
        for i in range(1, depth + 1):
            joined = joined.filter(
                bucket_expr(
                    F.element_at("__los", F.lit(i)),
                    F.element_at("__ws", F.lit(i)),
                )
                == F.element_at("__bs", F.lit(i))
            )
        cur_bucket = bucket_expr(F.col("__clo"), F.col("__cw"))
        hist = (
            joined.groupBy("__wid", cur_bucket.alias("__b"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("__v").alias("lo"),
                F.max("__v").alias("hi"),
            )
            .collect()
        )
        per_wid: dict = {}
        for r in hist:
            per_wid.setdefault(r["__wid"], {})[r["__b"]] = r
        nxt: list[dict] = []
        for wid, s in enumerate(pend):
            hist_lo, hist_w = s["lo"], (s["hi"] - s["lo"]) / B
            # one cumulative walk assigns EVERY pending rank to a bucket;
            # ranks in the same bucket stay one work-group (split = new list)
            by_bucket: dict[int, tuple[int, list[int]]] = {}
            cum, b, it = s["offset"], 0, iter(s["ranks"])
            rank = next(it)
            while True:
                r = per_wid[wid].get(b)
                nb = r["n"] if r else 0
                while cum + nb >= rank:
                    by_bucket.setdefault(b, (cum, []))[1].append(rank)
                    rank = next(it, None)
                    if rank is None:
                        break
                if rank is None:
                    break
                cum += nb
                b += 1
                if b >= B:  # pragma: no cover - rank <= n guaranteed
                    raise AssertionError("rank walked past every bucket")
            for b, (off_b, rks) in by_bucket.items():
                r = per_wid[wid][b]
                nxt.append({
                    "g": s["g"], "ranks": rks, "offset": off_b,
                    "n": r["n"], "lo": float(r["lo"]), "hi": float(r["hi"]),
                    "chain": s["chain"] + [(hist_lo, hist_w, b)],
                })
        active = nxt
    out_rows = [
        (g, int(bp), totals[g], rank_of[(g, bp)], resolved[(g, rank_of[(g, bp)])])
        for g in sorted(totals)
        for bp in quantiles_bp
    ]
    return spark.createDataFrame(
        out_rows,
        f"{group_col} {g_type}, q_bp int, n long, rank long, value double",
    )
