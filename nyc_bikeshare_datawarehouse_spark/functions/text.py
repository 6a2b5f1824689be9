"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are JVM-side built-ins (split/regexp/aggregate/
transform) — no Python in the row path, so these run inside whole-stage
codegen and scale linearly. The only non-built-in surface is language ID,
which is a deterministic n-gram heuristic expressed with built-ins too.

Ops: tokenization + token counting, quality scoring (length/punct/stopword
ratios), language ID heuristic, document fingerprinting (token-set and
shingle fingerprints, the exact-dedup and near-dup keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny embedded stopword lists per language for the heuristic language ID.
#: Public knowledge (most-frequent function words).
_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "das", "und", "in", "von", "zu", "mit", "ist", "den"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que", "pour", "dans"],
}

#: BPE-ish token pattern: word pieces, numbers, or single non-space symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text_col: str | Column, sep: str = " ") -> Column:
    """Whitespace tokenization, empty tokens removed."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, sep), lambda t: t != "")


def bpe_ish_tokens(text_col: str | Column) -> Column:
    """Regex token split approximating a BPE pre-tokenizer: letter runs,
    digit runs, and individual symbols (public GPT-2-style pre-tokenize
    shape, radically simplified)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0))


def token_count(text_col: str | Column) -> Column:
    """Whitespace token count (JVM-side, codegen'd)."""
    return F.size(tokens(text_col))


def with_quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics — the standard pre-training filters:

    - n_chars / n_tokens / avg_token_len
    - distinct_token_ratio (low => repetitive/spam)
    - punct_ratio, digit_ratio, upper_ratio
    - stopword_ratio (very low => likely non-linguistic content)
    """
    t = tokens(text_col)
    n_tok = F.size(t)
    n_chars = F.length(F.col(text_col))
    en_stop = F.array(*[F.lit(s) for s in _STOPWORDS["en"]])
    n_stop = F.size(F.filter(t, lambda tok: F.array_contains(en_stop, F.lower(tok))))
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_token_len",
            F.round(
                F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
                / F.greatest(n_tok, F.lit(1)),
                2,
            ),
        )
        .withColumn(
            "distinct_token_ratio",
            F.round(F.size(F.array_distinct(t)).cast("double") / F.greatest(n_tok, F.lit(1)), 4),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                (n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))).cast("double")
                / F.greatest(n_chars, F.lit(1)),
                4,
            ),
        )
        .withColumn(
            "digit_ratio",
            F.round(
                (n_chars - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))).cast("double")
                / F.greatest(n_chars, F.lit(1)),
                4,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(n_stop.cast("double") / F.greatest(n_tok, F.lit(1)), 4),
        )
    )


def language_id(text_col: str | Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits.

    Pure built-ins (one pass over the token array per language); at 100 TB
    this stays JVM-side. Returns the best language code or 'und' when no
    list scores a hit."""
    t = tokens(text_col)
    scores = []
    for lang, words in _STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(t, lambda tok: F.array_contains(arr, F.lower(tok))))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_set_fingerprint(text_col: str | Column) -> Column:
    """Order-invariant document fingerprint: md5 of the sorted distinct
    token set. Catches shuffled/reordered duplicates that raw-text hashing
    misses; one expression, no shuffle until the groupBy that uses it."""
    t = tokens(text_col)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(t)), " "))


def shingles(text_col: str | Column, n: int = 3) -> Column:
    """n-gram (word shingle) array — the unit for MinHash/Jaccard near-dup.

    Built from a sliding window over the token array with `transform` +
    `slice` (pure built-ins, no UDF)."""
    t = tokens(text_col)
    count = F.greatest(F.size(t) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(1)))
    return F.when(
        F.size(t) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " ")),
    ).otherwise(F.array(F.array_join(t, " ")))


def rolling_hash_fingerprint(text_col: str | Column, n: int = 3) -> Column:
    """Shingle-level fingerprint: min of the shingle hashes ("min-sampling"
    one-permutation sketch). A cheap single-value document signature whose
    equality implies high shingle overlap probability."""
    return F.array_min(F.transform(shingles(text_col, n), lambda s: F.xxhash64(s)))
