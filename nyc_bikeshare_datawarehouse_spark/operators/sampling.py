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
