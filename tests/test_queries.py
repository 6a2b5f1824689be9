"""Query-inventory tests at sf0.001: every declared query must analyze and
execute; targeted semantic assertions on a few.

The heavy correctness gate is the DuckDB differential harness
(tools/check_correctness.py, driver t2) — these tests are the fast guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as contract
from nyc_bikeshare_datawarehouse_spark.plans.queries import QUERIES


def test_contract_shape():
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
    # every rows-only query is one of the declared non-SQL-expressible ops
    assert set(qs) - set(oracles) == {
        "q_near_dup_minhash", "q_simhash_near_dup",
        # q_ann_ivf left this set in r12: the deterministic quantizer's
        # lattice proved fully oracle-replayable (exact fold mirroring)
        "q_text_pipeline",
        # approx sketches: deterministic but engine-specific estimates
        "q_approx_distinct", "q_approx_percentiles",
        # applyInPandas eigendecomposition: no SQL engine replays eigvalsh
        "q_pca_variance",
        # iterative seeded KMeans fit + persisted-layout lifecycle: no SQL form
        "q_ann_ivf_partitioned",
        # 2-D DCT perceptual hash: no SQL engine replays the DCT; the hash
        # math is pinned against a pure-Python replay instead
        "q_phash_neardup",
        # WAV container parse + frame-energy walk: no SQL form; feature and
        # fingerprint math pinned against pure-Python replays instead
        "q_audio_features", "q_audio_neardup",
        # cross-modal CC over DCT-pHash + audio-fingerprint + xxhash-minhash
        # edges (r13): every edge family is engine-hash; the portable-edge
        # twin q_multimodal_dedup carries the hash check for the composition
        "q_multimodal_dedup_engine",
    }


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"r_name", "o_year", "o_month", "revenue", "n_items"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_executes(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns  # analysis succeeded
    n = df.count()     # execution succeeded
    assert n >= 0


def test_topk_is_ordered(spark, sf_dir):
    rows = QUERIES["q_topk"](spark, sf_dir).collect()
    vals = [r["total_spent"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert len(rows) == 10


def test_sessionize_session_count_sane(spark, sf_dir):
    rows = QUERIES["q_sessionize"](spark, sf_dir).collect()
    from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events


def test_cosine_topk_probe_first(spark, sf_dir):
    rows = QUERIES["q_cosine_topk"](spark, sf_dir).collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["cosine_sim"] == 1.0


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    # the 100 TB substitution documented in q_agg_monthly: HLL sketch must
    # stay within a few % of exact at default rsd
    from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
    ).first()
    # rsd is a relative STANDARD DEVIATION, not a bound — allow ~4 sigma
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.04


def test_hybrid_rrf_arithmetic_and_fusion(spark, sf_dir):
    # rrf must equal the integer contribution formula applied to the
    # returned ranks, results must be rrf-descending, and a doc present
    # in BOTH lists at rank r must outscore one present in a single list
    # at the same rank (the point of fusion)
    rows = QUERIES["q_hybrid_search_rrf"](spark, sf_dir).collect()
    assert rows, "fusion must return results"

    def contrib(rank):
        return 10**9 // (60 + rank) if rank is not None else 0

    for r in rows:
        assert r["rrf"] == contrib(r["lex_rank"]) + contrib(r["sem_rank"])
    rrfs = [r["rrf"] for r in rows]
    assert rrfs == sorted(rrfs, reverse=True)
    both = [r for r in rows if r["lex_rank"] is not None and r["sem_rank"] is not None]
    # the point of fusion on this corpus (deterministic): the winner is
    # supported by BOTH retrievers, and both-list docs dominate the top-20
    assert rows[0]["lex_rank"] is not None and rows[0]["sem_rank"] is not None
    assert len(both) > len(rows) // 2


def test_seasonal_decompose_additive_identity(spark, sf_dir):
    """observed = trend + seasonal + residual must hold EXACTLY (all
    integer centi-cents), and the centered 7-day window must drop the
    3 edge days on each side of every series."""
    rows = QUERIES["q_seasonal_decompose"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["obs_cc"] == r["trend_cc"] + r["seasonal_cc"] + r["residual_cc"]
    import collections

    by_type = collections.Counter(r["event_type"] for r in rows)
    days = {r["day"] for r in rows}
    # 30-day corpus span -> 24 interior days per series
    assert all(c == len(days) for c in by_type.values())
