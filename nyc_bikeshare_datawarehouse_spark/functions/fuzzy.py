"""Edit-distance (fuzzy) string joins via positional q-gram prefix filtering.

The record-linkage primitive the dedup family lacks: match strings within
Levenshtein distance <= k WITHOUT the all-pairs cross join. Method is
Ed-Join (Xiao, Wang, Lin — VLDB'08, public literature), the edit-distance
cousin of the prefix-filtered Jaccard join already in functions/dedup.py:

- every string is decomposed into positional q-grams (substring, position);
- a single edit operation can destroy at most q grams, so strings within
  distance k share at least one gram among the first k*q + 1 grams of each,
  under ANY fixed global gram ordering (rarest-first makes the surviving
  candidate lists smallest);
- matching prefix grams must also sit within k positions of each other and
  the string lengths within k (both necessary conditions of distance <= k);
- survivors are verified with the exact Levenshtein distance, a per-pair
  codegen expression (`F.levenshtein`), never a Python UDF.

Scale shape: the gram stream shuffles (gram_hash, id, pos, len) prefixes
only — document-frequency, per-string rank, and prefix cut are window
functions over that one stream (same two-exchange plan as
dedup.prefix_jaccard_candidates). The candidate equi-join is keyed by the
gram; hot grams are exactly the ones the rarest-first prefix refuses to
index. Verify joins the strings back by id. Strings too short for the
gram guarantee (both under q·(k+1) chars — including those under q with
no grams at all) ride a separate length-band candidate branch, so the
join is lossless for every input length (see fuzzy_pairs).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def positional_qgrams(col: Column | str, q: int = 2) -> Column:
    """array<struct<g,p>> of the string's overlapping q-grams with their
    1-based positions; empty when length(s) < q. The sequence guard rides
    the `when` (sequence(1, 0) DESCENDS in Spark, it is not empty)."""
    s = F.col(col) if isinstance(col, str) else col
    n = F.length(s) - q + 1
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(F.substring(s, i, q).alias("g"), i.alias("p")),
        ),
    ).otherwise(F.array().cast("array<struct<g:string,p:int>>"))


def _gram_stream(df: DataFrame, str_col: str, id_col: str, q: int) -> DataFrame:
    """(id, g, p, len) — one row per positional gram occurrence."""
    return df.select(
        F.col(id_col),
        F.length(F.col(str_col)).alias("__len"),
        F.explode(positional_qgrams(str_col, q)).alias("__gp"),
    ).select(id_col, "__len", F.col("__gp.g").alias("__g"), F.col("__gp.p").alias("__p"))


def fuzzy_pairs_exhaustive(
    left: DataFrame,
    right: DataFrame,
    str_col: str = "name",
    left_id: str = "id_l",
    right_id: str = "id_r",
    k: int = 1,
    q: int = 2,
    length_banded: bool = False,
) -> DataFrame:
    """(left_id, right_id, dist) for every cross pair with
    levenshtein(left.str, right.str) <= k, running the gram index over
    EVERY input row (no distinct-universe collapse). Through round 9
    this WAS `fuzzy_pairs`; it is now the probe/exhaustive twin —
    `fuzzy_pairs` defaults to the distinct-universe + banded + q=3 scale
    path (r09 verdict: alpha 1.68/1.65 at the 10x probe for this form).
    LOSSLESS for ALL strings (proven against brute force + hypothesis in
    tests/test_fuzzy.py / test_properties.py), via two candidate
    branches:

    - gram branch (Ed-Join prefix lemma): covers every pair whose LONGER
      string has length >= q·(k+1) — the count bound
      |G(s)∩G(t)| >= max(|s|,|t|)−q+1−k·q then guarantees a shared gram,
      and at most k·q of the k·q+1 rarest prefix grams can be destroyed
      by k edits, so the prefixes must intersect (with positions within
      k and lengths within k);
    - short branch: pairs where BOTH strings are shorter than q·(k+1)
      can share ZERO grams (found by hypothesis: 'aa'~'ab' at q=2,k=1
      share no bigram), so short strings join on a length-band key
      instead — each left length l meets right lengths l−k..l+k via an
      explode(sequence) equi-join. Bounded: the short universe is
      strings under q·(k+1) chars, a tiny distinct set at any corpus
      size, and the k-band length filter is exact (|len diff| <= k is
      necessary for distance <= k).

    The global gram ordering is document frequency over the UNION of both
    sides (ascending, ties by gram text) — both sides must rank against
    the same ordering for the lemma to hold, which is why df is computed
    once on the tagged union rather than per side.

    `length_banded=True` adds the string LENGTH to the gram-branch join
    key: the left prefix stream explodes each row to its len-k..len+k
    target lengths (2k+1 rows) and the equi-join key becomes (gram,
    length), so
    a hot gram's candidate volume is Σ_l |a@(g,·)|·|b@(g,l)| instead of
    |a@g|·|b@g| — the |len diff| <= k necessary condition enforced AT
    the shuffle instead of after it. Lossless by construction (the
    exploded range IS the filter's accept set)."""
    lg = _gram_stream(left, str_col, left_id, q).withColumnRenamed(left_id, "__id")
    rg = _gram_stream(right, str_col, right_id, q).withColumnRenamed(right_id, "__id")
    both = lg.withColumn("__side", F.lit("l")).unionByName(
        rg.withColumn("__side", F.lit("r"))
    )
    w_df = Window.partitionBy("__g")
    w_rank = Window.partitionBy("__side", "__id").orderBy("__df", "__g", "__p")
    prefix = (
        both.withColumn("__df", F.count(F.lit(1)).over(w_df))
        .withColumn("__rk", F.row_number().over(w_rank))
        .filter(F.col("__rk") <= k * q + 1)
        .select("__side", "__id", "__g", "__p", "__len")
    )
    a = prefix.filter(F.col("__side") == "l").select(
        F.col("__id").alias(left_id),
        F.col("__g"),
        F.col("__p").alias("__pa"),
        F.col("__len").alias("__la"),
    )
    b = prefix.filter(F.col("__side") == "r").select(
        F.col("__id").alias(right_id),
        F.col("__g"),
        F.col("__p").alias("__pb"),
        F.col("__len").alias("__lb"),
    )
    if length_banded:
        a_banded = a.withColumn(
            "__lb", F.explode(F.sequence(F.col("__la") - k, F.col("__la") + k))
        )
        cand_gram = (
            a_banded.join(b, ["__g", "__lb"])
            .filter(F.abs(F.col("__pa") - F.col("__pb")) <= k)
            .select(left_id, right_id)
        )
    else:
        cand_gram = (
            a.join(b, "__g")
            .filter(
                (F.abs(F.col("__pa") - F.col("__pb")) <= k)
                & (F.abs(F.col("__la") - F.col("__lb")) <= k)
            )
            .select(left_id, right_id)
        )
    min_long = q * (k + 1)
    short_l = left.filter(F.length(str_col) < min_long).select(
        F.col(left_id), F.length(str_col).alias("__key")
    )
    short_r = right.filter(F.length(str_col) < min_long).select(
        F.col(right_id),
        F.explode(
            F.sequence(F.length(str_col) - k, F.length(str_col) + k)
        ).alias("__key"),
    )
    cand_short = short_l.join(short_r, "__key").select(left_id, right_id)
    # ONE exchange dedups AND spreads the candidate stream for the
    # levenshtein verify (r15, the prefix_jaccard_candidates fusion):
    # hash-repartition on the pair satisfies the dedup aggregation's
    # distribution requirement — single complete HashAggregate instead
    # of distinct's partial agg + exchange + AQE size-coalesce.
    cand = (
        cand_gram.unionByName(cand_short)
        .repartition(
            left.sparkSession.sparkContext.defaultParallelism,
            left_id,
            right_id,
        )
        .dropDuplicates()
    )
    ln = left.select(F.col(left_id), F.col(str_col).alias("__sl"))
    rn = right.select(F.col(right_id), F.col(str_col).alias("__sr"))
    return (
        cand.join(ln, left_id)
        .join(rn, right_id)
        .withColumn("dist", F.levenshtein("__sl", "__sr"))
        .filter(F.col("dist") <= k)
        .select(left_id, right_id, F.col("dist").cast("int").alias("dist"))
    )


def fuzzy_pairs(
    left: DataFrame,
    right: DataFrame,
    str_col: str = "name",
    left_id: str = "id_l",
    right_id: str = "id_r",
    k: int = 1,
    q: int = 3,
) -> DataFrame:
    """THE default fuzzy join (round 10): `fuzzy_pairs_exhaustive`'s exact
    semantics — (left_id, right_id, dist) for every cross pair within
    levenshtein <= k — through the three scale levers stacked by default:

    - DISTINCT string universe: the gram index, candidate join, and
      levenshtein verify run on |distinct strings| (sublinear growth on
      real name columns); id expansion is two plain equi-joins whose
      fan-out equals the true output size, so nothing is wasted;
    - length-banded candidate join: (gram, length) equi-key instead of
      gram-then-filter — hot grams stop pairing across incompatible
      lengths at the shuffle (see fuzzy_pairs_exhaustive);
    - q=3 grams: trigram posting lists are far sparser than bigram on
      natural text (931 distinct bigrams vs ~10k trigrams on the probe
      corpus), shrinking the hot-gram candidate volume superlinearly;
      the short-string branch threshold grows to q·(k+1) = 6 chars —
      still a tiny distinct universe.

    Result-identical to the exhaustive twin for any (k, q) — both are
    lossless candidate schemes over the same exact verify (proven
    against brute force + hypothesis in tests/test_fuzzy.py /
    test_properties.py). Use `fuzzy_pairs_exhaustive` only as the
    scaling probe / small-input baseline."""
    lu = left.select(F.col(str_col).alias("__nl")).distinct()
    ru = right.select(F.col(str_col).alias("__nr")).distinct()
    name_pairs = fuzzy_pairs_exhaustive(
        lu.select(F.col("__nl").alias("__kl"), F.col("__nl").alias(str_col)),
        ru.select(F.col("__nr").alias("__kr"), F.col("__nr").alias(str_col)),
        str_col,
        "__kl",
        "__kr",
        k=k,
        q=q,
        length_banded=True,
    )
    lx = left.select(F.col(left_id), F.col(str_col).alias("__kl"))
    rx = right.select(F.col(right_id), F.col(str_col).alias("__kr"))
    return (
        name_pairs.join(lx, "__kl")
        .join(rx, "__kr")
        .select(left_id, right_id, "dist")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    str_col: str = "name",
    left_id: str = "id_l",
    right_id: str = "id_r",
    k: int = 1,
    q: int = 3,
) -> DataFrame:
    """fuzzy_pairs plus both matched strings, for human-readable output:
    (left_id, right_id, left str as `s_l`, right str as `s_r`, dist)."""
    pairs = fuzzy_pairs(left, right, str_col, left_id, right_id, k=k, q=q)
    ln = left.select(F.col(left_id), F.col(str_col).alias("s_l"))
    rn = right.select(F.col(right_id), F.col(str_col).alias("s_r"))
    return pairs.join(ln, left_id).join(rn, right_id).select(
        left_id, right_id, "s_l", "s_r", "dist"
    )


def fuzzy_pairs_distinct(
    left: DataFrame,
    right: DataFrame,
    str_col: str = "name",
    left_id: str = "id_l",
    right_id: str = "id_r",
    k: int = 1,
    q: int = 2,
) -> DataFrame:
    """Round-7..9 name for the distinct-universe lever. Since round 10
    the lever IS `fuzzy_pairs`' default path (plus banding); this alias
    stays for API stability and keeps its historical q=2 default."""
    return fuzzy_pairs(left, right, str_col, left_id, right_id, k=k, q=q)


def jaro_winkler_micro(a: str, b: str) -> int:
    """Jaro-Winkler similarity in EXACT integer micro-units (Winkler
    1990, public literature; p=0.1, prefix ≤ 4, no boost threshold —
    the same convention as DuckDB's jaro_winkler_similarity, verified
    in tests). The whole computation is integer rational arithmetic:

        jaro = (m·m·l2 + m·m·l1 + (m−t)·l1·l2) / (3·l1·l2·m)
        jw   = (10·num + L·(den−num)) / (10·den)

    so ⌊jw·10⁶⌋ is exact — no float anywhere, hence deterministic and
    hash-gate-safe wherever it is used as a verify criterion."""
    if a == b:
        return 1_000_000
    l1, l2 = len(a), len(b)
    if not l1 or not l2:
        return 0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(a):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and b[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    num = m * m * l2 + m * m * l1 + (m - t) * l1 * l2
    den = 3 * l1 * l2 * m
    pl = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        pl += 1
    return (1_000_000 * (10 * num + pl * (den - num))) // (10 * den)


def with_jaro_winkler(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    out_col: str = "jw_micro",
) -> DataFrame:
    """Score CANDIDATE pairs with exact-integer Jaro-Winkler via an
    Arrow-batched pandas UDF — the ER scorer that complements the
    levenshtein verify tier (JW rewards shared prefixes; edit distance
    punishes all edits equally). Per-row Python on short strings is the
    honest cost model here: JW's greedy matching loop is inherently
    sequential per pair, and the input is the banded candidate stream
    (fuzzy_pairs*), never a corpus cross product — so the stage is
    O(candidates · |s|²) with Arrow doing the transport.

    Deliberately NOT exposed as an oracle-gated query: DuckDB's builtin
    jaro_winkler_similarity returns a float whose last-ulp position vs
    the exact rational is engine-internal, so a floor/round to any grid
    can straddle at values that land exactly on it — the hash gate
    would be flaky by construction. Cross-engine agreement is instead
    pinned in tests (|builtin − exact| < 2e-6 over the convention
    suite); production use is operator-level scoring of fuzzy_pairs
    candidates (see docs/EXAMPLES.md)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _jw(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                0 if x is None or y is None else jaro_winkler_micro(x, y)
                for x, y in zip(sa, sb)
            ],
            dtype="int64",
        )

    return pairs.withColumn(out_col, _jw(F.col(a_col), F.col(b_col)))
