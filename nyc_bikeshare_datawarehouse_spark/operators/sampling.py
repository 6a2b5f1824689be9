"""Deterministic sampling for large-scale pipelines.

RNG-based `df.sample` is partition-layout-dependent and unreproducible
across engines/runs; hash-based sampling is the production norm:

- `hash_sample`: keep a row iff md5(key) mod M < rate·M. The SAME rows
  are selected on every run, engine, and partitioning; rate changes are
  monotone (a 1% sample is a subset of a 10% sample), which makes
  nested train/validation splits and incremental backfills coherent.
- `stratified_hash_sample`: per-stratum rates via a rate map.
- `split`: disjoint train/val/test assignment from the same hash, so
  membership is stable as data grows (a row never migrates between
  splits when new rows arrive).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MOD = 10_000  # basis points of sampling resolution


def _bucket(key_col: str | Column) -> Column:
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    # md5 (not xxhash64): identical across engines, so samples are
    # verifiable against any SQL oracle; first 8 hex chars -> [0, MOD)
    return (F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long") % _MOD)


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep ~rate of rows, selected deterministically by key hash."""
    return df.filter(_bucket(key_col) < int(rate * _MOD))


def stratified_hash_sample(df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, float]) -> DataFrame:
    """Per-stratum deterministic sampling; strata absent from `rates`
    are dropped (explicit is safer than a silent default at scale)."""
    bucket = _bucket(key_col)
    cond = F.lit(False)
    for value, rate in rates.items():
        cond = cond | ((F.col(stratum_col) == value) & (bucket < int(rate * _MOD)))
    return df.filter(cond)


def weighted_hash_sample(
    df: DataFrame, key_col: str, weight_col: str, bp_per_unit: int
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep a row with
    probability min(1, weight · bp_per_unit / 10000), decided by the
    row's md5 bucket — the data-mixing primitive (upsample long/rare-
    domain documents, downsample boilerplate) of LLM corpus curation.

    The threshold is an exact integer (`least(MOD, weight·bp)`), so the
    selected set is bit-identical across engines and runs, monotone in
    `bp_per_unit` (doubling the rate only ADDS rows), and stable under
    repartitioning — unlike RNG rejection sampling, whose accept set
    changes with partition layout. Weight column must be a non-negative
    integer type (chars, tokens, bytes); per-row filter, no shuffle.
    """
    if bp_per_unit < 0:
        raise ValueError(f"bp_per_unit must be >= 0, got {bp_per_unit}")
    thr = F.least(F.lit(_MOD).cast("long"), F.col(weight_col).cast("long") * bp_per_unit)
    return df.filter(_bucket(key_col) < thr)


def mixture_upsample(
    df: DataFrame, key_col: str, weight_bp_col: str, epoch_col: str = "epoch"
) -> DataFrame:
    """Deterministic fractional upsampling — the other half of corpus
    mixture weighting (`weighted_hash_sample` downsamples; this emits a
    row floor(w) times plus one more with probability frac(w), so a
    domain weighted 2.25 contributes each document 2 or 3 times and the
    corpus-level expectation is exactly 2.25 epochs).

    The weight is an integer in basis points (22500 = 2.25 epochs) and
    the fractional accept is the same md5-bucket compare as the samplers,
    so the replicated set is bit-identical across engines/runs and
    monotone in the weight (raising a domain's weight only ADDS copies —
    mixtures stay nested across re-weighting experiments). Replication
    is a per-row `explode(sequence(1, copies))` — no shuffle; at 100 TB
    the multiplied rows flow straight into the downstream shard write.
    `epoch_col` numbers the copies 1..n so downstream shuffling can
    decorrelate epochs. Rows with copies = 0 are dropped (sequence(1,0)
    would DESCEND in Spark, hence the explicit empty-array guard)."""
    bp = F.col(weight_bp_col).cast("long")
    copies = (F.floor(bp / _MOD) + (_bucket(key_col) < bp % _MOD).cast("long")).cast("int")
    seq = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(epoch_col, F.explode(seq))


def rendezvous_shard(key_col: str | Column, n_shards: int, out_col: str = "shard") -> Column:
    """Rendezvous (highest-random-weight, Thaler & Ravishankar 1996)
    shard assignment: shard = argmax_s md5(key ‖ ':' ‖ s) — the stable
    alternative to `hash mod N`. Growing N→N+1 re-evaluates one more
    candidate, so EXACTLY the keys whose new candidate wins move — an
    expected 1/(N+1) of them, every one INTO the new shard (mod-N
    resharding moves ~half of all keys and scatters them). That is the
    property that makes incremental corpus resharding, cache routing,
    and shard-count growth O(moved) instead of O(corpus).

    One codegen expression per row (n_shards md5s folded by a strict->
    max, ties to the lowest shard id — md5-collision-improbable but
    deterministic); no shuffle, no state. Engine-portable: the oracle
    replays it as ROW_NUMBER over the same '0x'||md5-prefix longs.
    NULL keys coalesce to a sentinel so they shard deterministically
    (concat_ws would otherwise silently hash the bare shard index,
    while the SQL `||` idiom would go NULL — an engine divergence);
    mirror COALESCE(key, '\\x00null') in any oracle over nullable keys."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    raw = (F.col(key_col) if isinstance(key_col, str) else key_col).cast("string")
    k = F.coalesce(raw, F.lit("\x00null"))
    cands = F.array(*[
        F.struct(
            F.conv(
                F.substring(F.md5(F.concat_ws(":", k, F.lit(str(s)))), 1, 15),
                16, 10,
            ).cast("long").alias("h"),
            F.lit(s).alias("s"),
        )
        for s in range(n_shards)
    ])
    best = F.aggregate(
        cands,
        F.struct(F.lit(-1).cast("long").alias("h"), F.lit(-1).alias("s")),
        lambda acc, x: F.when(x["h"] > acc["h"], x).otherwise(acc),
    )
    return best["s"].alias(out_col)


def temperature_mix_weights(
    df: DataFrame, group_col: str, weight_col: str = "weight_bp"
) -> DataFrame:
    """Temperature-balanced mixture weights at alpha = 0.5 — the public
    multilingual-LM data-balancing recipe (sampling probability ∝ n^alpha
    with alpha < 1 upweights low-resource domains; alpha = 0.5 is the
    classic exponential-smoothing setting). Returns one row per group:
    (group, n_docs, weight_bp) where weight_bp is the EPOCH weight in
    basis points for `mixture_upsample`:

        epochs_g = N · n_g^(alpha-1) / Σ_m n_m^alpha
                 ≈ floor(10000 · N · s_g / (n_g · S)) / 10000,
        s_g = floor(sqrt(n_g) · 10000)  (exact long),  S = Σ s_m (exact)

    so the mixed corpus keeps its total size in expectation while the
    per-group shares move from n_g/N to n_g^0.5/Σ n^0.5.

    Engine parity: alpha is FIXED at 0.5 because IEEE sqrt is correctly
    rounded (bit-identical everywhere) while a general pow(n, alpha) is
    not — the same reason the graph family uses integer fixed-point.
    sqrt is quantized per group BEFORE summation, so S is an exact
    integer sum (no float summation-order ulps); the single double
    division runs on exact integer operands in both engines. The group
    totals ride a window over the group-count frame (O(#groups) rows —
    the bounded single-task exception), not an aggregate joined back, so
    the corpus-side groupBy executes once."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    s = F.floor(F.sqrt(F.col("n_docs")) * _MOD).cast("long")
    w_all = Window.partitionBy(F.lit(1))
    sc = counts.withColumn("__s", s)
    # denominator multiplies in DOUBLE: n_docs*S as long*long wraps
    # silently past 2^63 (n~1e10 groups in a large corpus) while DuckDB
    # errors — double*long is correctly rounded identically in both
    # engines and the final floor absorbs the ulp (numerator already is)
    return sc.select(
        group_col,
        "n_docs",
        F.floor(
            F.lit(float(_MOD))
            * F.sum("n_docs").over(w_all)
            * F.col("__s")
            / (F.col("n_docs").cast("double") * F.sum("__s").over(w_all))
        )
        .cast("long")
        .alias(weight_col),
    )


def shard_assign(
    df: DataFrame,
    key_col: str,
    shard_size: int,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle + fixed-size training-shard layout:
    order rows by md5(key) — a pseudo-random permutation decorrelated
    from ingestion order, identical on every engine — and assign
    shard = rank div shard_size, pos = rank mod shard_size.

    This is the terminal step of a pretraining pipeline (write N-row
    shards in shuffled order). A naive global `row_number()` funnels
    100 TB through ONE sort task; here the rank comes from
    `two_phase_global_rank` with the hash's first byte as the range
    bucket — md5 is uniform, so 256 buckets stay balanced at any scale,
    and the plan is one hash shuffle + a broadcast of 256 offsets. The
    eventual `write.partitionBy(shard)` then lands each shard as one
    directory."""
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    from nyc_bikeshare_datawarehouse_spark.operators.windows import two_phase_global_rank

    key = F.col(key_col)
    h = F.md5(key.cast("string"))
    # First hex byte as int: monotone along ORDER BY h (fixed-width
    # lowercase hex ⇒ lexicographic order = numeric order of any prefix).
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    ranked = two_phase_global_rank(
        df.withColumn("__h", h), bucket, [F.col("__h"), key], rn_col="__rn"
    )
    return (
        ranked.withColumn(shard_col, F.floor((F.col("__rn") - 1) / shard_size).cast("int"))
        .withColumn(pos_col, ((F.col("__rn") - 1) % shard_size).cast("int"))
        .drop("__h", "__rn", "__n")
    )


def split(df: DataFrame, key_col: str, weights: dict[str, float], split_col: str = "split") -> DataFrame:
    """Disjoint deterministic splits (e.g. {"train": .8, "val": .1,
    "test": .1}); assignment is stable under data growth."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = _bucket(key_col)
    expr = F.lit(None).cast("string")
    bounds = []
    lo = 0.0
    for name, w in weights.items():
        bounds.append((name, int(lo * _MOD), int((lo + w) * _MOD)))
        lo += w
    for name, b_lo, b_hi in reversed(bounds):
        expr = F.when((bucket >= b_lo) & (bucket < b_hi), name).otherwise(expr)
    return df.withColumn(split_col, expr)


def cluster_keyed_split(
    clusters: DataFrame,
    doc_col: str,
    cluster_col: str,
    weights: dict[str, float],
    split_col: str = "split",
    risk_col: str = "leak_risk",
) -> DataFrame:
    """Leakage-safe split+flag from a PRECOMPUTED cluster frame
    (doc_col, cluster_col): the split key is the cluster id, so every
    member of a near-dup cluster lands in the same split, and
    `risk_col` flags multi-member clusters — exactly the rows a
    doc-keyed split could tear across the train/test boundary.

    This is the LINEAR stage of the leakage-safe split: one md5-bucket
    projection plus one cluster-keyed window. In a real pipeline the
    dedup stage materializes clusters ONCE; re-running the whole
    candidate→verify→CC lattice inline per split request (the fused
    q_leakage_safe_split form, kept for its end-to-end oracle) inherits
    the pair-verify growth (alpha 1.46 at the r09 10x probe) for no new
    information."""
    from pyspark.sql import Window

    out = split(clusters, cluster_col, weights, split_col=split_col)
    sz = F.count(F.lit(1)).over(Window.partitionBy(cluster_col))
    return out.select(
        doc_col, cluster_col, split_col, (sz > 1).alias(risk_col)
    )
