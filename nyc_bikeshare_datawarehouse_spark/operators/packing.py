"""Greedy sequence packing — docs into fixed-token-budget training rows.

The last mile of a pretraining data pipeline: the exported corpus is
consumed as fixed-length token sequences, and packing multiple short
documents into one sequence (instead of one padded sequence per doc)
is what keeps the padding waste down (T5 / instruction-tuning style
"packing without splitting"; the split-across-boundaries alternative is
`functions.text.chunk_spans`). Reference analog: the corpus-export step
of scripts/etl.py (which writes row-per-record and leaves batching to
the trainer).

Semantics (deterministic, engine-replayable):
- documents are assigned to shards by portable md5 hash (same basis as
  operators/sampling.py — replayable in any SQL engine);
- within a shard, documents are processed in ascending id order and
  folded greedily: a document joins the open sequence iff its token
  count still fits the budget, else it opens the next sequence;
- a document longer than the budget occupies its own (overflowing)
  sequence — packing never splits a document.

Scale shape: the shuffle carries (shard, doc_id, n_tokens) — two longs
and an int, never the text. The sequential fold runs per shard inside
`applyInPandas` (the legitimate grouped-Pandas case: a running-capacity
reset is not expressible as a window function), so parallelism = shard
count; at 100 TB you size n_shards well above the executor-core count
and each shard's fold is a single in-memory pass over its (id, tokens)
pairs. The DuckDB oracle replays the same fold as a recursive CTE
(plans/oracles.py q_sequence_pack).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from nyc_bikeshare_datawarehouse_spark.functions.text import token_count

PACK_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("seq_id", T.LongType()),
        T.StructField("offset", T.LongType()),
    ]
)


def _portable_shard(id_col: str, n_shards: int) -> F.Column:
    """md5-derived shard id (first 8 hex chars mod n_shards) — identical
    in any SQL engine, same construction as sampling._bucket."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    ).cast("int")


def _pack_one_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    seq_len = int(pdf["__seq_len"].iloc[0])
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    seq_ids, offsets = [], []
    seq_id, cum = 1, 0
    for tc in pdf["n_tokens"]:
        tc = int(tc)
        if cum > 0 and cum + tc > seq_len:
            seq_id += 1
            cum = 0
        seq_ids.append(seq_id)
        offsets.append(cum)
        cum += tc
    return pd.DataFrame(
        {
            "shard": pdf["shard"].astype("int32"),
            "doc_id": pdf["doc_id"],
            "n_tokens": pdf["n_tokens"].astype("int32"),
            "seq_id": seq_ids,
            "offset": offsets,
        }
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document to (shard, seq_id, offset) under a greedy
    no-split pack with a `seq_len`-token budget. Returns one row per
    document: (shard, doc_id, n_tokens, seq_id, offset); seq_id is
    1-based per shard, offset is the document's token offset within its
    sequence.

    Token counts come from whitespace `token_count(text_col)` by
    default; pass `tokens_col` to pack under a PRECOMPUTED count
    instead — the tokenizer-apply path (q_tokenizer_apply), where the
    budget is measured in learned BPE tokens, not whitespace words."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    n_tokens = (
        F.col(tokens_col) if tokens_col is not None else token_count(text_col)
    )
    base = df.select(
        _portable_shard(id_col, n_shards).alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        n_tokens.cast("int").alias("n_tokens"),
        F.lit(seq_len).alias("__seq_len"),
    )
    return base.groupBy("shard").applyInPandas(_pack_one_shard, schema=PACK_SCHEMA)


def pack_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-sequence fill report over `pack_sequences` output: docs per
    sequence, filled tokens, waste vs the budget (negative waste marks
    the oversized singleton sequences). One groupBy on (shard, seq_id) —
    output is O(#sequences)."""
    return (
        packed.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("fill_tokens"),
        )
        .withColumn("waste_tokens", F.lit(seq_len) - F.col("fill_tokens"))
    )
