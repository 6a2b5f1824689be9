"""Unit tests: series / unpivot / sessionize / window helpers.

Covers the reference's semantic edge cases (SURVEY §5.2, §8): stop-
exclusive series, whitespace-tolerant flag decode, positional-union-free
reshaping, deterministic ids.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.series import timestamp_series
from nyc_bikeshare_datawarehouse_spark.operators.sessionize import session_stats, sessionize
from nyc_bikeshare_datawarehouse_spark.operators.unpivot import (
    decode_onehot_flags,
    pivot_flags,
    unpivot,
)
from nyc_bikeshare_datawarehouse_spark.operators.windows import deterministic_id, top_k

from conftest import rows_set


class TestSeries:
    def test_stop_exclusive_reference_2020(self, spark):
        # etl.py:184 semantics: 2020-01-01 .. 2020-12-31 EXCLUSIVE = 8,760
        # hourly rows; 2020-12-31 00:00 itself must be absent (SURVEY §8.2)
        s = timestamp_series(spark, "2020-01-01", "2020-12-31", 3600)
        assert s.count() == 8760
        last = s.agg(F.max("ts")).first()[0]
        assert str(last) == "2020-12-30 23:00:00"

    def test_step_seconds(self, spark):
        s = timestamp_series(spark, "2020-01-01 00:00:00", "2020-01-01 01:00:00", 900)
        assert [str(r["ts"]) for r in s.orderBy("ts").collect()] == [
            "2020-01-01 00:00:00",
            "2020-01-01 00:15:00",
            "2020-01-01 00:30:00",
            "2020-01-01 00:45:00",
        ]


class TestUnpivot:
    def test_wide_to_long(self, spark):
        df = spark.createDataFrame([(1, 10.0, 20.0)], "id int, a double, b double")
        long = unpivot(df, ["id"], ["a", "b"], "name", "value")
        assert rows_set(long) == [(1, "a", 10.0), (1, "b", 20.0)]

    def test_flag_decode_whitespace_and_id(self, spark):
        # etl.py:114-115: flags count only when trim(v)=="1"; id = last 2
        # chars of the column name as int
        df = spark.createDataFrame(
            [("d1", " 1 ", None, "1"), ("d2", "0", "1", "")],
            "dt string, WT01 string, WT08 string, WT11 string",
        )
        out = decode_onehot_flags(df, "dt", ["WT01", "WT08", "WT11"], "dt", "wt")
        assert rows_set(out) == [("d1", 1), ("d1", 11), ("d2", 8)]

    def test_pivot_unpivot_roundtrip(self, spark):
        # pivot ∘ unpivot = identity on one-hot flags (SURVEY §5.2)
        bridge = spark.createDataFrame(
            [("d1", 1), ("d1", 8), ("d2", 8)], "dt string, wt int"
        )
        wide = pivot_flags(bridge, "dt", "wt", [1, 8])
        back = (
            unpivot(wide, ["dt"], ["1", "8"], "wt", "flag")
            .filter(F.col("flag") == 1)
            .select("dt", F.col("wt").cast("int").alias("wt"))
        )
        assert rows_set(back) == rows_set(bridge)


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:10:00", 2),
             (1, "2024-01-01 01:10:00", 3), (2, "2024-01-01 00:00:00", 4)],
            "user_id int, ts string, event_id int",
        ).withColumn("ts", F.to_timestamp("ts"))
        s = sessionize(df, "user_id", "ts", 1800, order_tiebreak="event_id")
        got = {(r["user_id"], r["event_id"]): r["session_id"] for r in s.collect()}
        assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1}

    def test_exact_boundary_is_same_session(self, spark):
        # gap == threshold does NOT open a session (strict >)
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:30:00", 2)],
            "user_id int, ts string, event_id int",
        ).withColumn("ts", F.to_timestamp("ts"))
        s = sessionize(df, "user_id", "ts", 1800, order_tiebreak="event_id")
        assert {r["session_id"] for r in s.collect()} == {1}

    def test_session_stats(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1), (1, "2024-01-01 02:00:00", 2)],
            "user_id int, ts string, event_id int",
        ).withColumn("ts", F.to_timestamp("ts"))
        stats = session_stats(sessionize(df, "user_id", "ts", 1800, order_tiebreak="event_id"))
        assert stats.count() == 2
        assert all(r["n_events"] == 1 for r in stats.collect())

    def test_builtin_session_window_boundary_is_inclusive(self, spark):
        # the boundary case: an event at exactly last + gap MERGES into
        # the open session in Spark's built-in, matching sessionize's
        # `> gap` new-session test — pinned so the shared `>` oracle
        # (plans/oracles.py q_session_window_batch) stays justified by
        # observed engine behavior
        from nyc_bikeshare_datawarehouse_spark.operators.sessionize import (
            session_window_batch,
        )

        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:30:00", 2)],
            "user_id int, ts string, event_id int",
        ).withColumn("ts", F.to_timestamp("ts"))
        built_in = session_window_batch(df, "user_id", "ts", "30 minutes")
        assert built_in.count() == 1  # inclusive boundary: one session
        lagcum = sessionize(df, "user_id", "ts", 1800, order_tiebreak="event_id")
        assert {r["session_id"] for r in lagcum.collect()} == {1}  # same

    def test_builtin_session_window_matches_lagcumsum(self, spark):
        # the two forms agree row for row, including a just-under-gap
        # pair and an exact-boundary pair
        from nyc_bikeshare_datawarehouse_spark.operators.sessionize import (
            session_window_batch,
        )

        df = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", 1),
                (1, "2024-01-01 00:10:00", 2),
                (1, "2024-01-01 01:10:00", 3),
                (2, "2024-01-01 00:00:00", 4),
                (2, "2024-01-01 00:29:59", 5),
                (3, "2024-01-01 00:00:00", 6),
                (3, "2024-01-01 00:30:00", 7),  # exact boundary: merges
            ],
            "user_id int, ts string, event_id int",
        ).withColumn("ts", F.to_timestamp("ts"))
        built_in = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in session_window_batch(df, "user_id", "ts", "30 minutes").collect()
        }
        stats = session_stats(
            sessionize(df, "user_id", "ts", 1800, order_tiebreak="event_id")
        )
        lagcum = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in stats.collect()
        }
        assert built_in == lagcum


class TestWindows:
    def test_top_k_deterministic(self, spark):
        df = spark.createDataFrame([(i % 3, i) for i in range(30)], "k int, v int")
        out = top_k(df, [F.desc("k"), F.col("v")], 4)
        assert [tuple(r) for r in out.collect()] == [(2, 2), (2, 5), (2, 8), (2, 11)]

    def test_deterministic_id_stable(self, spark):
        df = spark.createDataFrame([("b",), ("a",), ("c",)], "x string")
        a = rows_set(deterministic_id(df, ["x"], "id"))
        b = rows_set(deterministic_id(df.repartition(3), ["x"], "id"))
        # same ids regardless of physical partitioning (unlike
        # monotonically_increasing_id, etl.py:91)
        assert a == b == [("a", 1), ("b", 2), ("c", 3)]

    def test_two_phase_global_rank_matches_builtin(self, spark):
        from pyspark.sql import Window

        from nyc_bikeshare_datawarehouse_spark.operators.windows import two_phase_global_rank

        # 37 rows (not divisible by anything nice), ties in v, many buckets
        df = spark.createDataFrame(
            [(i, (i * 37) % 11) for i in range(37)], "id long, v long"
        ).repartition(5)
        order = [F.desc("v"), F.col("id")]
        ranked = two_phase_global_rank(df, -F.col("v"), order, rn_col="rn", total_col="n")
        got = {r["id"]: (r["rn"], r["n"]) for r in ranked.collect()}
        w = Window.orderBy(*order)
        expected = {
            r["id"]: r["rn"] for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
        }
        assert {k: v[0] for k, v in got.items()} == expected
        assert all(v[1] == 37 for v in got.values())

    def test_two_phase_global_rank_single_bucket_degenerate(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.windows import two_phase_global_rank

        df = spark.createDataFrame([(i,) for i in range(5)], "id long")
        ranked = two_phase_global_rank(df, F.lit(0), [F.col("id")], rn_col="rn", total_col="n")
        assert rows_set(ranked.select("id", "rn")) == [(i, i + 1) for i in range(5)]

    def test_two_phase_ntile_matches_builtin(self, spark):
        from pyspark.sql import Window

        from nyc_bikeshare_datawarehouse_spark.operators.windows import two_phase_ntile

        # every remainder regime: N not divisible by n (uneven head
        # tiles), N divisible (q exact), and N < n (q = 0 edge — the
        # division-by-q branch must never evaluate)
        for n_rows, n_tiles in [(37, 5), (40, 8), (3, 7), (64, 64), (100, 1)]:
            df = spark.createDataFrame(
                [((i * 29) % n_rows, i) for i in range(n_rows)], "v long, id long"
            ).repartition(4)
            got = {
                r["id"]: r["tile"]
                for r in two_phase_ntile(
                    df, n_tiles, F.floor(F.col("v") / 7), [F.col("v"), F.col("id")]
                ).collect()
            }
            w = Window.orderBy("v", "id")
            expected = {
                r["id"]: r["t"]
                for r in df.select("id", F.ntile(n_tiles).over(w).alias("t")).collect()
            }
            assert got == expected, (n_rows, n_tiles)


class TestDescFreqBuckets:
    def test_monotone_and_rank_matches_sequential(self, spark):
        from pyspark.sql import Window

        from nyc_bikeshare_datawarehouse_spark.operators.windows import (
            desc_freq_buckets,
            two_phase_cumsum,
        )

        # Zipf-shaped ties: ~half the tokens share count 1 (the case no
        # count-only bucket can balance), plus multi-bucket spans, plus
        # non-ASCII and short tokens to exercise the char-key clamps
        rows = []
        for i in range(200):
            tok = f"{chr(97 + (i * 7) % 26)}{chr(97 + (i * 13) % 26)}tok{i}"
            rows.append((tok, 1))
        for i in range(60):
            rows.append((f"mid{i:03d}", 5))
        for i, tok in enumerate(["the", "of", "a", "é-accent", "Z", ""]):
            rows.append((tok, 1000 - i))
        df = spark.createDataFrame(rows, "token string, n long").repartition(7)

        b = desc_freq_buckets(df, "n", "token", n_buckets=16)
        got = b.select("token", "n", "__fbucket").collect()
        ordered = sorted(got, key=lambda r: (-r["n"], r["token"]))
        buckets = [r["__fbucket"] for r in ordered]
        # THE contract: monotone non-decreasing along (n DESC, token ASC)
        assert buckets == sorted(buckets)
        # balance: the 200-row count=1 group must actually spread
        assert len({r["__fbucket"] for r in ordered if r["n"] == 1}) >= 4

        ranked = two_phase_cumsum(
            b.withColumn("__one", F.lit(1)),
            F.col("__fbucket"),
            [F.desc("n"), F.col("token")],
            values=[("__one", "rn"), ("n", "cum_n")],
            materialize=False,
        )
        got_rn = {
            r["token"]: (r["rn"], r["cum_n"])
            for r in ranked.select("token", "rn", "cum_n").collect()
        }
        w = Window.orderBy(F.desc("n"), "token")
        expected = {
            r["token"]: (r["rn"], r["cum_n"])
            for r in df.select(
                "token",
                F.row_number().over(w).alias("rn"),
                F.sum("n")
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .alias("cum_n"),
            ).collect()
        }
        assert got_rn == expected


class TestLeakageSafeSplit:
    def test_no_cluster_straddles_splits_and_full_coverage(self, spark, sf_dir):
        from nyc_bikeshare_datawarehouse_spark.plans.queries import QUERIES
        from nyc_bikeshare_datawarehouse_spark.sources.readers import load_table

        out = QUERIES["q_leakage_safe_split"](spark, sf_dir)
        # THE property: a cluster maps to exactly one split — no near-dup
        # pair can straddle train/test
        straddles = (
            out.groupBy("cluster_id")
            .agg(F.countDistinct("split").alias("k"))
            .filter("k > 1")
            .count()
        )
        assert straddles == 0
        # total coverage: every document assigned exactly once
        n_docs = load_table(spark, sf_dir, "documents").count()
        assert out.count() == n_docs
        assert out.select("doc_id").distinct().count() == n_docs
        # leak_risk marks exactly the multi-member clusters
        risky = out.filter("leak_risk").select("cluster_id").distinct()
        multi = (
            out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n"))
            .filter("n > 1").select("cluster_id")
        )
        assert risky.exceptAll(multi).count() == 0
        assert multi.exceptAll(risky).count() == 0


class TestExactQuantiles:
    def test_matches_sorted_ranks_with_forced_recursion(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_rank_values,
        )

        # 5000 values with 5-way ties; n_buckets=8 + max_slice=50 force
        # 3+ narrowing rounds and tie-heavy bucket edges
        vals = [(i * 37 % 1000) * 0.5 for i in range(5000)]
        df = spark.createDataFrame([(v,) for v in vals], "value double").repartition(7)
        ranks = [1, 2500, 2501, 4999, 5000]
        got = exact_rank_values(df, "value", ranks, n_buckets=8, max_slice=50)
        s = sorted(vals)
        assert got == {r: s[r - 1] for r in ranks}

    def test_all_tied_column_short_circuits(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_rank_values,
        )

        df = spark.createDataFrame([(3.5,)] * 100, "value double")
        got = exact_rank_values(df, "value", [1, 50, 100], n_buckets=4, max_slice=10)
        assert got == {1: 3.5, 50: 3.5, 100: 3.5}

    def test_grouped_median_matches_per_group_sort(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_group_quantile,
        )

        # 3 groups, wildly different sizes/ranges + ties; max_slice=20 and
        # n_buckets=4 force several SHARED narrowing rounds where groups
        # resolve at different depths
        rows = (
            [("a", float((i * 13) % 97)) for i in range(500)]
            + [("b", float((i * 7) % 11) * 100.0) for i in range(81)]
            + [("c", 42.0)] * 30  # all tied -> lo==hi short circuit
        )
        df = spark.createDataFrame(rows, "g string, v double").repartition(5)
        got = {r["g"]: (r["n"], r["rank"], r["value"])
               for r in exact_group_quantile(
                   df, "g", "v", q_bp=5000, n_buckets=4, max_slice=20
               ).collect()}
        from collections import defaultdict
        byg = defaultdict(list)
        for g, v in rows:
            byg[g].append(v)
        for g, vs in byg.items():
            n = len(vs)
            rank = max(1, (5000 * n + 9999) // 10000)
            assert got[g] == (n, rank, sorted(vs)[rank - 1]), g

    def test_quantiles_frame_rank_rule_and_nulls(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_quantiles_frame,
        )

        # 10 non-null values 1..10 plus nulls (excluded); ceil(q*N) ranks
        rows = [(float(i),) for i in range(1, 11)] + [(None,), (None,)]
        df = spark.createDataFrame(rows, "value double")
        got = {r["q"]: (r["rank"], r["value"])
               for r in exact_quantiles_frame(df, "value", [0.25, 0.5, 0.9, 1.0],
                                              n_buckets=4, max_slice=3).collect()}
        assert got == {0.25: (3, 3.0), 0.5: (5, 5.0), 0.9: (9, 9.0), 1.0: (10, 10.0)}

    def test_nan_excluded_like_null(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_group_quantile,
            exact_rank_values,
        )

        # NaN is not NULL: unguarded it survives isNotNull, max() returns
        # NaN, width goes NaN, every row buckets NULL -> AssertionError.
        rows = [(float(i),) for i in range(1, 101)] + [(float("nan"),)] * 5 + [(None,)]
        df = spark.createDataFrame(rows, "value double").repartition(3)
        got = exact_rank_values(df, "value", [1, 50, 100], n_buckets=4, max_slice=10)
        assert got == {1: 1.0, 50: 50.0, 100: 100.0}

        gdf = spark.createDataFrame(
            [("a", v) for (v,) in rows], "g string, v double"
        )
        row = exact_group_quantile(gdf, "g", "v", q_bp=5000, n_buckets=4,
                                   max_slice=10).head()
        assert (row["n"], row["rank"], row["value"]) == (100, 50, 50.0)

    def test_empty_ranks_rejected(self, spark):
        import pytest

        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_rank_values,
        )

        df = spark.createDataFrame([(1.0,)], "value double")
        with pytest.raises(ValueError, match="non-empty"):
            exact_rank_values(df, "value", [])
        with pytest.raises(ValueError, match="non-empty"):
            exact_rank_values(df, "value", quantiles_bp=[])

    def test_grouped_bp_validated_and_deduped(self, spark):
        import pytest

        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_group_quantiles,
        )

        df = spark.createDataFrame(
            [("a", float(v)) for v in range(1, 11)], "g string, v double"
        )
        # out-of-range bps would derive rank > n (never resolves) or a
        # silent clamp — both rejected up front
        with pytest.raises(ValueError, match=r"\[1, 10000\]"):
            exact_group_quantiles(df, "g", "v", quantiles_bp=(5000, 10001))
        with pytest.raises(ValueError, match=r"\[1, 10000\]"):
            exact_group_quantiles(df, "g", "v", quantiles_bp=(0,))
        with pytest.raises(ValueError, match="non-empty"):
            exact_group_quantiles(df, "g", "v", quantiles_bp=())
        # duplicates collapse to one output row per distinct bp
        rows = exact_group_quantiles(
            df, "g", "v", quantiles_bp=(5000, 5000, 2500), n_buckets=4
        ).collect()
        assert sorted((r["q_bp"], r["value"]) for r in rows) == [
            (2500, 3.0), (5000, 5.0),
        ]


class TestPacking:
    def _docs(self, spark, rows):
        # text with exactly n tokens, ids chosen by the caller
        return spark.createDataFrame(
            [(i, " ".join(["w"] * n)) for i, n in rows],
            "doc_id long, text string",
        )

    def test_greedy_pack_hand_computed(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.packing import pack_sequences

        # single shard (n_shards=1) so the fold order is just doc_id:
        # budget 10; docs of 4,6 fill seq 1 EXACTLY (boundary: cum+tc ==
        # seq_len fits), 7 opens seq 2, 12 is oversized -> its own seq 3,
        # 2 opens seq 4
        df = self._docs(spark, [(1, 4), (2, 6), (3, 7), (4, 12), (5, 2)])
        got = {
            r["doc_id"]: (r["seq_id"], r["offset"], r["n_tokens"])
            for r in pack_sequences(df, seq_len=10, n_shards=1).collect()
        }
        assert got == {
            1: (1, 0, 4),
            2: (1, 4, 6),
            3: (2, 0, 7),
            4: (3, 0, 12),
            5: (4, 0, 2),
        }

    def test_pack_never_splits_and_respects_budget(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.packing import (
            pack_sequences,
            pack_stats,
        )

        df = self._docs(spark, [(i, 3 + (i * 7) % 40) for i in range(100)])
        packed = pack_sequences(df, seq_len=64, n_shards=4)
        stats = pack_stats(packed, seq_len=64).collect()
        for r in stats:
            # a sequence overflows ONLY as an oversized singleton
            assert r["fill_tokens"] <= 64 or r["n_docs"] == 1
        # every doc appears exactly once (packing is a partition of docs)
        assert packed.count() == 100
        assert packed.select("doc_id").distinct().count() == 100
        # offsets are consistent: within a sequence, offset = running sum
        rows = sorted(
            packed.collect(), key=lambda r: (r["shard"], r["seq_id"], r["doc_id"])
        )
        cum, key = 0, None
        for r in rows:
            k = (r["shard"], r["seq_id"])
            if k != key:
                key, cum = k, 0
            assert r["offset"] == cum
            cum += r["n_tokens"]

    def test_pack_validates_seq_len(self, spark):
        import pytest

        from nyc_bikeshare_datawarehouse_spark.operators.packing import pack_sequences

        with pytest.raises(ValueError, match="seq_len"):
            pack_sequences(self._docs(spark, [(1, 3)]), seq_len=0)


class TestGroupQuantileJobBatching:
    def test_many_terminal_groups_resolve_in_constant_jobs(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_group_quantile,
        )

        # 200 groups x 40 rows: every group is terminal in round one.
        # Before the round-10 batching this cost one TakeOrdered JOB per
        # group (200+ driver round-trips); now all terminals of a round
        # share one windowed job. Pin via the Spark job-count delta.
        rows = [(f"g{i:03d}", float((i * 7 + j * 13) % 97))
                for i in range(200) for j in range(40)]
        df = spark.createDataFrame(rows, "g string, v double").repartition(4)
        sc = spark.sparkContext
        sc.setJobGroup("gq_batch_pin", "terminal batching job count")
        try:
            out = exact_group_quantile(df, "g", "v", q_bp=5000, max_slice=64)
            n_out = out.count()
        finally:
            n_jobs = len(sc.statusTracker().getJobIdsForGroup("gq_batch_pin"))
            sc.setJobGroup("", "")
        assert n_out == 200
        # stats agg + one batched terminal + result count + slack: far
        # below the 200+ jobs of the per-group TakeOrdered form
        assert n_jobs <= 10, n_jobs

        # correctness spot-check against a local sort
        import collections
        byg = collections.defaultdict(list)
        for g, v in rows:
            byg[g].append(v)
        got = {r["g"]: r["value"] for r in out.collect()}
        for g, vs in byg.items():
            rank = max(1, (5000 * len(vs) + 9999) // 10000)
            assert got[g] == sorted(vs)[rank - 1], g


class TestGroupMultiQuantiles:
    def test_matches_per_group_sort_with_forced_splits(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_group_quantiles,
        )

        # 3 groups of very different sizes/ranges + ties; max_slice=20 and
        # n_buckets=4 force several rounds where the p25/p50/p75 ranks
        # diverge into separate work-groups at different depths
        rows = (
            [("a", float((i * 13) % 97)) for i in range(500)]
            + [("b", float((i * 7) % 11) * 100.0) for i in range(81)]
            + [("c", 42.0)] * 30  # all tied -> lo==hi short circuit
        )
        df = spark.createDataFrame(rows, "g string, v double").repartition(5)
        got = {(r["g"], r["q_bp"]): (r["n"], r["rank"], r["value"])
               for r in exact_group_quantiles(
                   df, "g", "v", quantiles_bp=(2500, 5000, 7500, 9900),
                   n_buckets=4, max_slice=20,
               ).collect()}
        from collections import defaultdict
        byg = defaultdict(list)
        for g, v in rows:
            byg[g].append(v)
        for g, vs in byg.items():
            n, svs = len(vs), sorted(vs)
            for bp in (2500, 5000, 7500, 9900):
                rank = max(1, (bp * n + 9999) // 10000)
                assert got[(g, bp)] == (n, rank, svs[rank - 1]), (g, bp)

    def test_single_bp_agrees_with_exact_group_quantile(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_group_quantile,
            exact_group_quantiles,
        )

        rows = [(f"g{i % 4}", float((i * 31) % 211)) for i in range(400)]
        df = spark.createDataFrame(rows, "g string, v double")
        multi = {r["g"]: (r["n"], r["rank"], r["value"])
                 for r in exact_group_quantiles(
                     df, "g", "v", quantiles_bp=(5000,), n_buckets=8,
                     max_slice=30,
                 ).collect()}
        single = {r["g"]: (r["n"], r["rank"], r["value"])
                  for r in exact_group_quantile(
                      df, "g", "v", q_bp=5000, n_buckets=8, max_slice=30
                  ).collect()}
        assert multi == single

    def test_duplicate_rank_from_close_bps_in_tiny_group(self, spark):
        from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
            exact_group_quantiles,
        )

        # n=3: p25 and p50 both map to rank ceil(..)=1 and 2 — the
        # rank-dedup inside a work-group must still emit one row per bp
        df = spark.createDataFrame(
            [("x", 10.0), ("x", 20.0), ("x", 30.0)], "g string, v double"
        )
        got = {r["q_bp"]: (r["rank"], r["value"])
               for r in exact_group_quantiles(
                   df, "g", "v", quantiles_bp=(2500, 5000, 7500)
               ).collect()}
        assert got == {2500: (1, 10.0), 5000: (2, 20.0), 7500: (3, 30.0)}


class TestRollingMedian:
    def test_lower_median_rule_hand_computed(self, spark):
        from nyc_bikeshare_datawarehouse_spark.plans.queries import q_rolling_median
        import datetime

        # one user, values 10,50,20,40,30 at 1-min steps: frames grow
        # 1..5 rows; lower median = element at ceil(n/2)
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i, base + datetime.timedelta(minutes=i), 7, t, "x", "{}")
            for i, t in enumerate([10.0, 50.0, 20.0, 40.0, 30.0])
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, value double, "
            "event_type string, props string",
        )
        import tempfile, os
        d = tempfile.mkdtemp()
        # q_rolling_median loads via load_table: write a mini events table
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = [(r["rolling_med"], r["n_in_frame"]) for r in
               q_rolling_median(spark, d).collect()]
        # frames: [10] [10,50] [10,20,50] [10,20,40,50] [10,20,30,40,50]
        assert got == [(10.0, 1), (10.0, 2), (20.0, 3), (20.0, 4), (30.0, 5)]

    def test_all_null_frame_yields_null_median(self, spark):
        from nyc_bikeshare_datawarehouse_spark.plans.queries import q_rolling_median
        import datetime
        import os
        import tempfile

        base = datetime.datetime(2024, 1, 1)
        rows = [
            (0, base, 7, None, "x", "{}"),                                  # frame all-null
            (1, base + datetime.timedelta(minutes=1), 7, 5.0, "x", "{}"),   # frame {5.0}
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, value double, "
            "event_type string, props string",
        )
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = [(r["rolling_med"], r["n_in_frame"]) for r in
               q_rolling_median(spark, d).collect()]
        assert got == [(None, 0), (5.0, 1)]
