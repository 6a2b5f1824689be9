"""Explicit Bloom-filter semi-join reduction.

At 100 TB the dominant cost of `probe SEMI JOIN build` is shuffling the
probe side; when the build keys fit a few KB of bits, a Bloom filter
pushed into the probe scan removes most non-matching rows BEFORE the
exchange (Bloom 1970; the classic distributed-join reduction, e.g.
Mackert & Lohman's Bloomjoin, SIGMOD 1986). Spark's AQE injects runtime
bloom filters itself when thresholds allow (
spark.sql.optimizer.runtime.bloomFilter.enabled); this operator is the
explicit, engine-portable, tunable form — and `q_bloom_join` proves the
reduction is semantics-preserving by carrying the PLAIN semi-join SQL as
its oracle.

Representation: the filter is a (word_idx -> 64-bit word) map built with
`bit_or` partial aggregation — num_bits/64 entries, broadcast as a 1-row
frame. The probe check is pure per-row codegen (k md5 buckets, k map
lookups + bitwise AND), so the probe side's scan-time cost is O(k) per
row with NO shuffle and no false negatives; false positives are removed
by the exact join that follows, which now touches only the surviving
sliver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _one_shifted(pos: Column) -> Column:
    """1L << (pos % 64). The PySpark `shiftleft` wrapper only takes a
    Python-int shift; `call_function` reaches the SQL form, which
    accepts a column."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k md5-derived bit positions (engine-portable, seeded by prefix)."""
    key_s = key.cast("string")
    return [
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), key_s)), 1, 8), 16, 10)
        .cast("long") % num_bits
        for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int = 4096, num_hashes: int = 3
) -> DataFrame:
    """One-row frame holding the filter as map<word_idx int, word long>
    in column `__bloom` (dunder-named so probe columns cannot collide).

    Build cost: explode k positions per key, groupBy word_idx (at most
    num_bits/64 groups — map-side combine collapses each task to that
    bound), bit_or the per-position masks, then map_from_entries over
    the tiny word list. The result is a broadcastable scalar frame, the
    same 1-row crossJoin idiom as the repo's stat frames."""
    pos = F.explode(F.array(*_positions(F.col(key_col), num_bits, num_hashes))).alias("pos")
    words = (
        keys.select(pos)
        .groupBy((F.col("pos") / 64).cast("int").alias("word_idx"))
        .agg(F.bit_or(_one_shifted(F.col("pos"))).alias("word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("__bloom")
    )


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int = 4096,
    num_hashes: int = 3,
) -> DataFrame:
    """Rows of `probe` whose key MIGHT be in the build set (no false
    negatives): every one of the k bits is set. Pure per-row predicate on
    top of a 1-row broadcast — the probe never shuffles here."""
    checks = []
    for p in _positions(F.col(key_col), num_bits, num_hashes):
        word = F.coalesce(
            F.element_at(F.col("__bloom"), (p / 64).cast("int")), F.lit(0).cast("long")
        )
        mask = _one_shifted(p)
        checks.append(word.bitwiseAND(mask) != 0)
    keep = checks[0]
    for c in checks[1:]:
        keep = keep & c
    return probe.crossJoin(F.broadcast(bloom)).filter(keep).drop("__bloom")
