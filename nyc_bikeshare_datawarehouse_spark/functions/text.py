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


def with_token_budget(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    priority_col: str | None = None,
    stratum_col: str | None = None,
) -> DataFrame:
    """Token-budget curation: keep documents, in deterministic priority
    order, until a token budget is exhausted — the standard "take the best
    N billion tokens" selection step of a pre-training data pipeline
    (reference analog: the corpus-trimming stage of scripts/etl.py).

    Order within a stratum is (priority DESC, id ASC) — unique, so the
    running total is well-defined; a document is kept iff the cumulative
    token count INCLUDING it stays within budget (a doc larger than the
    remaining budget is skipped along with everything after it, keeping
    the kept set prefix-closed and engine-reproducible).

    Scale: the cumulative sum is a window partitioned by `stratum_col`
    (language/source/shard) — one shuffle on the stratum key, each
    stratum's prefix sum computed independently. The unstratified form
    degenerates to a single-partition window; at 100 TB always pass a
    stratum (per-language budgets are what pipelines want anyway).
    """
    from pyspark.sql import Window

    parts = [stratum_col] if stratum_col else []
    order = ([F.desc(priority_col)] if priority_col else []) + [F.asc(id_col)]
    w = (
        Window.partitionBy(*parts)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = token_count(text_col)
    out_cols = [id_col] + ([stratum_col] if stratum_col else [])
    return (
        df.select(*out_cols, *([priority_col] if priority_col else []),
                  n_tok.cast("int").alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .select(*out_cols, "n_tokens", "cum_tokens")
    )


def concat_chunk_spans(
    df: DataFrame,
    context_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing, span view: documents are laid
    end-to-end in deterministic order (id ASC within a stratum) and the
    token stream is sliced into fixed `context_len` windows — the standard
    GPT-style packing step. Returns, per document, its token offsets and
    the chunk ids it lands in (a doc may straddle a chunk boundary):
    start_offset / first_chunk / last_chunk / n_chunks.

    Everything is a prefix sum + integer arithmetic — no tokenized text
    moves through the shuffle, only (id, n_tokens). Same scale shape as
    `with_token_budget`: one window partitioned by the stratum key.
    Empty documents are dropped (they occupy no span).
    """
    from pyspark.sql import Window

    parts = [stratum_col] if stratum_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cols = [id_col] + ([stratum_col] if stratum_col else [])
    end = F.sum("n_tokens").over(w).cast("long")
    return (
        df.select(*out_cols, token_count(text_col).cast("int").alias("n_tokens"))
        .filter(F.col("n_tokens") >= 1)
        .withColumn("start_offset", end - F.col("n_tokens"))
        # integer division (`div`), not double division + cast: offsets are
        # exact longs and must stay exact past 2^53 tokens
        .withColumn("first_chunk", F.expr(f"start_offset div {int(context_len)}"))
        .withColumn(
            "last_chunk",
            F.expr(f"(start_offset + n_tokens - 1) div {int(context_len)}"),
        )
        .withColumn("n_chunks", (F.col("last_chunk") - F.col("first_chunk") + 1))
        .select(
            *out_cols, "n_tokens", "start_offset", "first_chunk", "last_chunk",
            "n_chunks",
        )
    )


def length_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Power-of-two histogram of document token counts — the length-
    distribution profile a packing/curation pipeline reads first. Bucket
    b holds docs with n_tokens in [2^(b-1), 2^b); computed as the binary
    bit-length of n_tokens (exact integer arithmetic — no float log2,
    whose .9999 edge cases differ between engines).

    Pure two-level aggregation: map-side partial agg, one exchange on the
    ~60 distinct buckets; scans only the text column."""
    n_tok = token_count(text_col)
    # bit-length of the already-selected n_tokens column — the expression
    # must not re-derive token_count(text): text is dropped by the first
    # select, so referencing it here is an unresolved column.
    bucket = F.length(F.conv(F.col("n_tokens").cast("string"), 10, 2)).cast("int")
    return (
        df.select(n_tok.cast("int").alias("n_tokens"))
        .filter(F.col("n_tokens") >= 1)
        .select(bucket.alias("bit_bucket"), "n_tokens")
        .groupBy("bit_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .orderBy("bit_bucket")
    )
