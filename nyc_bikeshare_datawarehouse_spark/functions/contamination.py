"""Train/eval decontamination — the n-gram-overlap check every serious
pre-training pipeline runs before shipping a corpus (public method:
GPT-3/PaLM-style 13-gram collision scan, here parameterized).

Scale shape: the eval suite is tiny relative to the training corpus
(benchmarks are ~10^6 n-grams; the corpus is ~10^12), so the eval n-gram
index is BROADCAST — the 100 TB train side never shuffles. Each train
partition probes the in-memory eval index, emits only colliding
(train_id, eval_id, ngram) rows, and the per-pair aggregation shuffles
just those collisions (collision volume, not corpus volume). When the
eval side is too big to broadcast, pass `broadcast_eval=False` and the
join becomes a plain hash join on the n-gram key — still shuffling only
(id, ngram-hash) postings, never document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nyc_bikeshare_datawarehouse_spark.functions.text import shingles, token_count


def ngram_postings(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_id: str = "doc_id",
) -> DataFrame:
    """Distinct (id, n-gram) postings. Documents shorter than n tokens
    contribute nothing (mirrors the `len(tokens) >= n` oracle filter —
    `shingles`' short-doc fallback would emit the whole text as one
    pseudo-shingle, which a cross-engine oracle can't reproduce cleanly)."""
    return (
        df.filter(token_count(text_col) >= n)
        .select(
            F.col(id_col).alias(out_id),
            F.explode(F.array_distinct(shingles(text_col, n))).alias("ngram"),
        )
    )


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per (train_id, eval_id) pair: how many distinct n-grams they share,
    and what fraction of the eval doc's n-grams that covers
    (`overlap_frac`, floor-truncated to 4 decimals for engine parity).

    Only pairs with `shared_ngrams >= min_shared` survive — at scale the
    1-shared tail is collision noise and dominates the output size."""
    tr = ngram_postings(train, n, text_col, id_col, out_id="train_id")
    ev = ngram_postings(eval_df, n, text_col, id_col, out_id="eval_id")
    ev_sizes = ev.groupBy("eval_id").agg(F.count(F.lit(1)).alias("eval_ngrams"))
    ev_side = F.broadcast(ev) if broadcast_eval else ev
    pairs = (
        tr.join(ev_side, "ngram")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )
    sizes_side = F.broadcast(ev_sizes) if broadcast_eval else ev_sizes
    return pairs.join(sizes_side, "eval_id").select(
        "train_id",
        "eval_id",
        "shared_ngrams",
        (F.floor(F.col("shared_ngrams") / F.col("eval_ngrams") * 10000) / 10000).alias(
            "overlap_frac"
        ),
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 2,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Drop every train document sharing >= `min_shared` distinct n-grams
    with ANY eval document (left-anti against the contaminated id set).
    Returns the clean train frame with its original columns — the shuffle
    carries only contaminated ids. The contaminated-id set is only
    force-broadcast when `broadcast_eval=True`; callers set it False
    precisely because the eval side is large, which makes the hit set
    potentially large too, so there Catalyst/AQE picks the anti-join
    strategy (sort-merge or runtime broadcast) from actual sizes."""
    contaminated = (
        ngram_overlap(
            train, eval_df, n, text_col, id_col,
            min_shared=min_shared, broadcast_eval=broadcast_eval,
        )
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    anti_side = F.broadcast(contaminated) if broadcast_eval else contaminated
    return train.join(anti_side, id_col, "left_anti")
