"""Interval overlap join, PSI drift, containment, bigram logprob units."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.functions import dedup, drift, text
from nyc_bikeshare_datawarehouse_spark.operators.interval import (
    concurrent_interval_counts,
    interval_overlap_join,
)

from conftest import rows_set


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


class TestIntervalOverlap:
    def test_pairs_match_brute_force(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(0), _ts(2)), (2, _ts(5), _ts(5, 30)), (3, _ts(10), _ts(23))],
            ["lid", "session_start", "session_end"],
        )
        right = spark.createDataFrame(
            [(10, _ts(1), _ts(3)), (11, _ts(4), _ts(5)), (12, _ts(6), _ts(7)),
             (13, _ts(22), _ts(23)), (14, _ts(2, 1), _ts(3, 59))],
            ["rid", "session_start", "session_end"],
        )
        got = interval_overlap_join(left, right, "lid", "rid", bin_seconds=3600)
        brute = (
            left.crossJoin(
                right.select(
                    "rid",
                    F.col("session_start").alias("rs"),
                    F.col("session_end").alias("re"),
                )
            )
            .filter(
                (F.col("session_start") <= F.col("re"))
                & (F.col("rs") <= F.col("session_end"))
            )
            .select("lid", "rid")
        )
        assert rows_set(got) == rows_set(brute)
        # boundary: touching endpoints (closed intervals) DO overlap
        assert (2, 11) in {(r["lid"], r["rid"]) for r in got.collect()}

    def test_bin_width_does_not_change_result(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(0), _ts(9)), (2, _ts(3), _ts(4))],
            ["lid", "session_start", "session_end"],
        )
        right = spark.createDataFrame(
            [(7, _ts(8, 30), _ts(8, 45)), (8, _ts(2), _ts(3))],
            ["rid", "session_start", "session_end"],
        )
        a = interval_overlap_join(left, right, "lid", "rid", bin_seconds=60)
        b = interval_overlap_join(left, right, "lid", "rid", bin_seconds=86400)
        assert rows_set(a) == rows_set(b)

    def test_concurrent_counts_keep_zero_degree(self, spark):
        iv = spark.createDataFrame(
            [("u1", 1, _ts(0), _ts(1)), ("u2", 1, _ts(0, 30), _ts(2)),
             ("u3", 1, _ts(12), _ts(13)), ("u1", 2, _ts(12, 30), _ts(12, 45))],
            ["user_id", "session_id", "session_start", "session_end"],
        )
        got = concurrent_interval_counts(
            iv, "user_id", ["session_id"], bin_seconds=3600
        )
        deg = {(r["user_id"], r["session_id"]): r["n_concurrent"] for r in got.collect()}
        assert deg == {("u1", 1): 1, ("u2", 1): 1, ("u3", 1): 1, ("u1", 2): 1}

    def test_same_entity_never_pairs(self, spark):
        iv = spark.createDataFrame(
            [("u1", 1, _ts(0), _ts(5)), ("u1", 2, _ts(1), _ts(2))],
            ["user_id", "session_id", "session_start", "session_end"],
        )
        got = concurrent_interval_counts(iv, "user_id", ["session_id"])
        assert {r["n_concurrent"] for r in got.collect()} == {0}


class TestPsi:
    def test_identical_slices_score_zero(self, spark):
        df = spark.createDataFrame(
            [(i, float(i % 17)) for i in range(200)], ["event_id", "value"]
        )
        out = drift.psi_table(df, df, "value", n_bins=10, tiebreak_col="event_id")
        rows = out.collect()
        assert len(rows) == 10
        assert sum(r["ref_n"] for r in rows) == 200
        assert all(r["ref_n"] == r["cur_n"] for r in rows)
        # identical smoothed fractions -> every contribution is exactly -0.0/0.0
        assert all(abs(r["psi_contrib"]) == 0.0 for r in rows)

    def test_shifted_distribution_scores_positive(self, spark):
        ref = spark.createDataFrame(
            [(i, float(i % 100)) for i in range(500)], ["event_id", "value"]
        )
        cur = spark.createDataFrame(
            [(i, float(i % 100) + 60.0) for i in range(500)], ["event_id", "value"]
        )
        out = drift.psi_table(ref, cur, "value", n_bins=10, tiebreak_col="event_id")
        psi = sum(r["psi_contrib"] for r in out.collect())
        assert psi > 0.25  # rule-of-thumb "shifted"

    def test_empty_current_bins_are_smoothed_not_inf(self, spark):
        ref = spark.createDataFrame(
            [(i, float(i)) for i in range(100)], ["event_id", "value"]
        )
        cur = spark.createDataFrame(
            [(i, 1000.0 + i) for i in range(50)], ["event_id", "value"]
        )
        rows = drift.psi_table(ref, cur, "value", tiebreak_col="event_id").collect()
        assert all(math.isfinite(r["psi_contrib"]) for r in rows)
        # everything in cur lands in the top bin
        top = [r for r in rows if r["bin"] == 9][0]
        assert top["cur_n"] == 50


class TestContainment:
    def test_subset_doc_scores_one(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a b c d e f g h"),
                (2, "c d e f"),          # bigrams are a subset of doc 1's
                (3, "x y z w"),
            ],
            ["doc_id", "text"],
        )
        got = dedup.ngram_containment_pairs(docs, min_containment=0.9)
        rows = {(r["id_a"], r["id_b"]): r["containment"] for r in got.collect()}
        assert rows == {(1, 2): 1.0}

    def test_df_pruning_shares_dfreq_and_prunes_hot_shingles(self, spark):
        # one boilerplate bigram in EVERY doc: unpruned, all pairs are
        # candidates through that hot posting list; pruned at df>cutoff,
        # only the true sub-document duplicate survives — and passing the
        # precomputed dfreq frame must give the identical result to
        # letting the function recompute it (the shared-calibration path
        # q_containment_pruned rides)
        rows = [(i, f"stop word uniq{i} tail{i}") for i in range(10)]
        rows += [(100, "stop word same same2"), (101, "stop word same same2")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert dedup.ngram_containment_pairs(df, min_containment=0.1).count() == 66
        inline = dedup.ngram_containment_pairs(
            df, min_containment=0.1, max_doc_count=5
        )
        shared = dedup.ngram_containment_pairs(
            df, min_containment=0.1, max_doc_count=5,
            dfreq=dedup.shingle_dfreq(df),
        )
        want = [(100, 101, 1.0)]
        assert [(r["id_a"], r["id_b"], r["containment"])
                for r in inline.collect()] == want
        assert [(r["id_a"], r["id_b"], r["containment"])
                for r in shared.collect()] == want
        # dfreq without a pruning parameter is a contract error
        import pytest

        with pytest.raises(ValueError, match="ignored"):
            dedup.ngram_containment_pairs(df, dfreq=dedup.shingle_dfreq(df))

    def test_containment_geq_jaccard(self, spark, sf_dir):
        from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table

        d = load_table(spark, sf_dir, "documents").limit(100)
        c = dedup.ngram_containment_pairs(d, min_containment=0.0)
        j = dedup.ngram_jaccard_pairs(d, min_jaccard=0.0)
        merged = c.join(j, ["id_a", "id_b"]).collect()
        assert len(merged) > 0
        assert all(r["containment"] >= r["jaccard"] for r in merged)


class TestBigramLogprob:
    def test_repeated_bigram_doc_outscores_shuffled(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "the cat sat on the mat"),
                (3, "the cat sat on the mat"),
                (4, "mat the on sat cat the"),  # same unigrams, alien bigrams
            ],
            ["doc_id", "text"],
        )
        rows = {r["doc_id"]: r for r in text.bigram_logprob(docs).collect()}
        assert rows[1]["n_bigrams"] == 5
        assert rows[1]["avg_logprob"] == rows[2]["avg_logprob"]
        assert rows[4]["avg_logprob"] < rows[1]["avg_logprob"]

    def test_short_docs_are_excluded(self, spark):
        docs = spark.createDataFrame(
            [(1, "single"), (2, ""), (3, "two tokens")], ["doc_id", "text"]
        )
        rows = text.bigram_logprob(docs).collect()
        assert {r["doc_id"] for r in rows} == {3}


class TestKs:
    def test_two_phase_cumsum_matches_single_window(self, spark):
        from pyspark.sql import Window
        from nyc_bikeshare_datawarehouse_spark.operators.windows import (
            two_phase_cumsum,
        )

        # v unique: ROWS-frame cumsum over a non-total order is tie-
        # ambiguous (the KS caller always feeds grouped-distinct values)
        df = spark.createDataFrame(
            [(float(i) + 0.25 * (i % 3), i % 5, (i * 7) % 11)
             for i in range(300)],
            ["v", "a", "b"],
        )
        got = two_phase_cumsum(
            df, F.floor(F.col("v") / 7), [F.col("v")], [("a", "ca"), ("b", "cb")]
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        want = df.withColumn("ca", F.sum("a").over(w).cast("long")).withColumn(
            "cb", F.sum("b").over(w).cast("long")
        )
        assert rows_set(got.select("v", "ca", "cb")) == rows_set(
            want.select("v", "ca", "cb")
        )

    def test_ks_identical_slices_is_zero(self, spark):
        df = spark.createDataFrame(
            [(float(i % 13),) for i in range(100)], ["value"]
        )
        row = drift.ks_stat(df, df, "value").collect()[0]
        assert row["gap_num"] == 0
        assert row["ks_stat"] == 0.0
        assert row["ks_value"] == 0.0  # smallest value on full tie

    def test_ks_hand_computed(self, spark):
        # ref = {1,2,3,4}, cur = {3,4,5,6}: max |F_r - F_c| = |2/4 - 0/4| = 0.5 at v=2
        ref = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], ["value"])
        cur = spark.createDataFrame([(3.0,), (4.0,), (5.0,), (6.0,)], ["value"])
        row = drift.ks_stat(ref, cur, "value").collect()[0]
        assert row["ks_value"] == 2.0
        assert row["gap_num"] == 8  # |2*4 - 0*4|
        assert row["ks_stat"] == 0.5

    def test_ks_disjoint_slices_is_one(self, spark):
        ref = spark.createDataFrame([(float(i),) for i in range(10)], ["value"])
        cur = spark.createDataFrame([(100.0 + i,) for i in range(10)], ["value"])
        row = drift.ks_stat(ref, cur, "value").collect()[0]
        assert row["ks_stat"] == 1.0


class TestEntityResolution:
    def test_handcrafted_clusters_and_golden(self, spark):
        from nyc_bikeshare_datawarehouse_spark.functions import dedup, fuzzy

        recs = spark.createDataFrame(
            [(1, "acme corp"), (2, "acme c0rp"), (3, "acme corps"),
             (4, "globex inc"), (5, "globex inc")],
            ["rec_id", "name"],
        )
        a = recs.select(F.col("rec_id").alias("id_a"), "name")
        b = recs.select(F.col("rec_id").alias("id_b"), "name")
        edges = fuzzy.fuzzy_pairs(a, b, "name", "id_a", "id_b", k=1, q=2).filter(
            F.col("id_a") < F.col("id_b")
        )
        clusters = dedup.cluster_duplicates(
            edges.select("id_a", "id_b"), recs.select("rec_id"), "rec_id"
        )
        got = {(r["rec_id"], r["cluster_id"]) for r in clusters.collect()}
        # 1-2 and 1-3 within distance 1 (transitively 2-3 at distance 2)
        assert got == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)}


class TestContainmentPackIds:
    def test_packed_equals_unpacked(self, spark, sf_dir):
        from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table

        d = load_table(spark, sf_dir, "documents").limit(150)
        a = dedup.ngram_containment_pairs(d, min_containment=0.5, pack_ids=False)
        b = dedup.ngram_containment_pairs(d, min_containment=0.5, pack_ids=True)
        assert rows_set(a) == rows_set(b)

    def test_packed_rejects_out_of_range_ids(self, spark):
        import pytest
        from pyspark.errors import PySparkRuntimeError
        from py4j.protocol import Py4JJavaError

        docs = spark.createDataFrame(
            [(1 << 40, "a b c d"), (2, "a b c d")], ["doc_id", "text"]
        )
        with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)):
            dedup.ngram_containment_pairs(
                docs, min_containment=0.1, pack_ids=True
            ).collect()


class TestPsiFromHistograms:
    def test_identical_sketches_zero_and_streamed_state_usable(self, spark, tmp_path):
        from nyc_bikeshare_datawarehouse_spark.functions.sketches import (
            histogram_sketch,
        )

        df = spark.createDataFrame(
            [(float(i % 64),) for i in range(512)], ["value"]
        )
        sk = histogram_sketch(df, "value", lo=0, hi=64, n_bins=64)
        rows = drift.psi_from_histograms(sk, sk, n_bins=64).collect()
        assert len(rows) == 64
        assert all(abs(r["psi_contrib"]) == 0.0 for r in rows)
        assert sum(r["ref_n"] for r in rows) == 512

    def test_shifted_sketches_positive_psi(self, spark):
        from nyc_bikeshare_datawarehouse_spark.functions.sketches import (
            histogram_sketch,
        )

        ref = spark.createDataFrame([(float(i % 32),) for i in range(512)], ["value"])
        cur = spark.createDataFrame(
            [(32.0 + float(i % 32),) for i in range(512)], ["value"]
        )
        rs = histogram_sketch(ref, "value", lo=0, hi=64, n_bins=64)
        cs = histogram_sketch(cur, "value", lo=0, hi=64, n_bins=64)
        psi = sum(
            r["psi_contrib"]
            for r in drift.psi_from_histograms(rs, cs, n_bins=64).collect()
        )
        assert psi > 0.25

    def test_merged_daily_sketches_equal_full_slice(self, spark):
        # the rollup claim: PSI(merge(day sketches), cur) == PSI(full ref, cur)
        from nyc_bikeshare_datawarehouse_spark.functions.sketches import (
            histogram_merge,
            histogram_sketch,
        )

        day1 = spark.createDataFrame([(float(i % 40),) for i in range(200)], ["value"])
        day2 = spark.createDataFrame([(float(i % 64),) for i in range(300)], ["value"])
        full = day1.unionByName(day2)
        cur = spark.createDataFrame([(float((i * 7) % 64),) for i in range(250)], ["value"])
        merged = histogram_merge(
            histogram_sketch(day1, "value", 0, 64, 64),
            histogram_sketch(day2, "value", 0, 64, 64),
        )
        cs = histogram_sketch(cur, "value", 0, 64, 64)
        a = {r["bin"]: r["psi_contrib"]
             for r in drift.psi_from_histograms(merged, cs, 64).collect()}
        b = {r["bin"]: r["psi_contrib"]
             for r in drift.psi_from_histograms(
                 histogram_sketch(full, "value", 0, 64, 64), cs, 64).collect()}
        assert a == b


class TestChi2Independence:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "r string, c string")
        out = drift.chi2_independence(df, "r", "c").collect()
        return out

    def test_independent_table_is_zero(self, spark):
        # 2x2 with o == rt*ct/g exactly in every cell -> chi2 == 0
        rows = (
            [("a", "x")] * 2 + [("a", "y")] * 4
            + [("b", "x")] * 3 + [("b", "y")] * 6
        )
        out = self._run(spark, rows)
        assert all(r["contrib_micro"] == 0 for r in out)
        assert out[0]["chi2_micro"] == 0
        assert out[0]["dof"] == 1

    def test_zero_cells_materialized_and_counted(self, spark):
        rows = [("a", "x")] * 5 + [("b", "y")] * 5  # diagonal: max dependence
        out = {(r["row_key"], r["col_key"]): r for r in self._run(spark, rows)}
        assert set(out) == {("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")}
        assert out[("a", "y")]["o"] == 0
        # chi2 of a perfectly dependent 2x2 with n=10 is 10
        assert out[("a", "x")]["chi2_micro"] == 10_000_000

    def test_matches_textbook_replay(self, spark):
        import random

        rng = random.Random(31)
        rows = [
            (f"r{rng.randint(0, 3)}", f"c{rng.randint(0, 2)}")
            for _ in range(300)
        ]
        out = self._run(spark, rows)
        # pure-Python replay with the same quantization
        import collections

        o = collections.Counter(rows)
        rt = collections.Counter(r for r, _ in rows)
        ct = collections.Counter(c for _, c in rows)
        g = len(rows)
        total = 0
        for rk in rt:
            for ck in ct:
                num = float(o.get((rk, ck), 0)) * float(g) - float(
                    rt[rk]
                ) * float(ct[ck])
                contrib = math.floor(
                    num * num / (float(g) * float(rt[rk]) * float(ct[ck]))
                    * 1000000.0
                )
                total += contrib
        got = {(r["row_key"], r["col_key"]): r for r in out}
        assert got[("r0", "c0")]["chi2_micro"] == total
        assert got[("r0", "c0")]["dof"] == (len(rt) - 1) * (len(ct) - 1)

    def test_null_categories_excluded(self, spark):
        """A NULL key must not poison the marginals: it would miss the
        grid equi-join while still counting in rt/ct."""
        rows = [("a", "x"), ("a", "y"), (None, "x"), ("b", None), ("b", "y")]
        df = spark.createDataFrame(rows, "r string, c string")
        out = drift.chi2_independence(df, "r", "c").collect()
        keys = {(r["row_key"], r["col_key"]) for r in out}
        assert keys == {("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")}
        # g over the surviving population only
        assert sum(r["o"] for r in out) == 3
