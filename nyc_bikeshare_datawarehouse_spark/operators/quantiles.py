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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_rank_values(
    df: DataFrame,
    col: str | Column,
    ranks: Sequence[int],
    n_buckets: int = 1024,
    max_slice: int = 65536,
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
    non-null values)."""
    c = F.col(col) if isinstance(col, str) else col
    vals = df.select(c.alias("__v")).filter(F.col("__v").isNotNull())
    out: dict[int, float] = {}
    # worklist groups: (predicate, offset = rows strictly before slice,
    # ranks awaiting resolution inside the slice)
    work: list[tuple[Column, int, list[int]]] = [
        (F.lit(True), 0, sorted(set(ranks)))
    ]
    while work:
        pred, offset, group = work.pop()
        sl = vals.filter(pred)
        stats = sl.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
        ).head()
        n, lo, hi = stats["n"], stats["lo"], stats["hi"]
        if n == 0:
            raise ValueError(f"ranks {group} out of range (empty slice)")
        if lo == hi:
            for rank in group:  # the whole slice is one tied value
                out[rank] = float(lo)
            continue
        if n <= max_slice:
            # terminal: TakeOrdered (rank-offset) rows per rank, keep the
            # last — per-partition heaps, O(k) network each
            for rank in group:
                row = (
                    sl.orderBy("__v")
                    .limit(rank - offset)
                    .agg(F.max("__v").alias("v"))
                    .head()
                )
                out[rank] = float(row["v"])
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
    n = df.filter(c.isNotNull()).count()
    # ceil(q*N) in exact integer arithmetic: q scaled to basis points
    ranks = {q: max(1, (int(round(q * 10000)) * n + 9999) // 10000) for q in quantiles}
    vals = exact_rank_values(df, c, sorted(set(ranks.values())), n_buckets, max_slice)
    rows = [(float(q), int(r), vals[r]) for q, r in sorted(ranks.items())]
    return spark.createDataFrame(rows, "q double, rank long, value double")
