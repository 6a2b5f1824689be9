"""Bench-membership contracts — the frozen subtotals are POSITIONAL.

`legacy_extended` sums EXTENDED up to the round-9 marker and
`legacy_heavy` sums HEAVY[:16] (the round-11 membership): inserting or
reordering a member ABOVE either cut silently corrupts the cross-round
comparable without failing anything — these pins make that a loud test
failure instead. Appending below the cuts stays free.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench

#: the exact round-11 HEAVY membership legacy_heavy is frozen over
LEGACY_HEAVY_R11 = [
    "q_text_pipeline",
    "q_ngram_jaccard",
    "q_dedup_pipeline",
    "q_dedup_clusters",
    "q_dedup_clusters_pruned",
    "q_near_dup_minhash",
    "q_embed_near_dup",
    "q_embed_dedup_pipeline",
    "q_jaccard_prefix",
    "q_incremental_dedup",
    "q_incremental_dedup_pruned",
    "q_simhash_portable",
    "q_ngram_containment",
    "q_containment_pruned",
    "q_fuzzy_join",
    "q_entity_resolution",
]


def test_legacy_heavy_prefix_frozen():
    assert bench.HEAVY[:16] == LEGACY_HEAVY_R11
    # new members go BELOW the frozen prefix, never inside it
    assert len(bench.HEAVY) >= 16


def test_legacy_extended_cut_is_stable():
    # everything ABOVE the round-9 marker is the frozen r08 membership;
    # its size must never change (appends go below the marker)
    assert bench.EXTENDED.index("q_entity_resolution_distinct") == 78


def test_every_bench_member_is_a_declared_query():
    from nyc_bikeshare_datawarehouse_spark.plans.queries import QUERIES

    for name in bench.HEADLINE + bench.HEAVY + bench.EXTENDED:
        assert name in QUERIES, name


def test_no_duplicate_members_across_tiers():
    all_members = bench.HEADLINE + bench.HEAVY + bench.EXTENDED
    assert len(all_members) == len(set(all_members))
