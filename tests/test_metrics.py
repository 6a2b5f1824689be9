"""Evaluation-metrics family (functions/metrics.py) — every statistic is
pinned against an independent pure-Python replay (brute-force pair
counting for AUC, textbook Welch formulas, sklearn-free confusion
counts), so the Spark implementation and the DuckDB oracle are two of
THREE independent witnesses."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.functions import metrics


def brute_auc(pairs):
    """Probability a positive outscores a negative, ties 0.5 — the
    definition, O(n_pos·n_neg)."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


class TestRocAuc:
    @pytest.fixture()
    def scored(self, spark):
        # deterministic scores with heavy ties across two labels
        rows = [(i, (i * 7) % 13, (i * 3) % 4 == 0, i % 5 == 0) for i in range(200)]
        return spark.createDataFrame(rows, "id long, s long, y1 boolean, y2 boolean")

    def test_matches_brute_force_pair_counting(self, spark, scored):
        out = {
            r["label"]: r
            for r in metrics.roc_auc(
                scored, F.col("s"), [("y1", F.col("y1")), ("y2", F.col("y2"))]
            ).collect()
        }
        rows = scored.collect()
        for lbl in ("y1", "y2"):
            expect = brute_auc([(r["s"], r[lbl]) for r in rows])
            assert out[lbl]["auc"] == pytest.approx(expect, abs=1e-12)
            assert out[lbl]["n_pos"] == sum(1 for r in rows if r[lbl])
            # 2U is integral even with ties
            assert out[lbl]["u2"] == round(
                expect * 2 * out[lbl]["n_pos"] * out[lbl]["n_neg"]
            )

    def test_perfect_and_inverted_separation(self, spark):
        df = spark.createDataFrame(
            [(s, s >= 10) for s in range(20)], "s long, y boolean"
        )
        out = metrics.roc_auc(df, F.col("s"), [("y", F.col("y"))]).collect()[0]
        assert out["auc"] == 1.0
        inv = metrics.roc_auc(df, -F.col("s"), [("y", F.col("y"))]).collect()[0]
        assert inv["auc"] == 0.0

    def test_all_ties_is_half(self, spark):
        df = spark.createDataFrame([(1, i % 2 == 0) for i in range(10)],
                                   "s long, y boolean")
        out = metrics.roc_auc(df, F.col("s"), [("y", F.col("y"))]).collect()[0]
        assert out["auc"] == 0.5

    def test_empty_class_is_null(self, spark):
        df = spark.createDataFrame([(i, True) for i in range(5)],
                                   "s long, y boolean")
        out = metrics.roc_auc(df, F.col("s"), [("y", F.col("y"))]).collect()[0]
        assert out["auc"] is None and out["n_neg"] == 0

    def test_bucket_width_does_not_change_result(self, spark, scored):
        a = metrics.roc_auc(scored, F.col("s"), [("y1", F.col("y1"))],
                            bucket_width=2).collect()[0]
        b = metrics.roc_auc(scored, F.col("s"), [("y1", F.col("y1"))],
                            bucket_width=10_000).collect()[0]
        assert a == b


class TestWelch:
    def test_matches_textbook_formulas(self, spark):
        a = [12, 15, 11, 18, 14, 16]
        b = [22, 19, 25, 21]
        df = spark.createDataFrame(
            [("A", v) for v in a] + [("B", v) for v in b], "g string, v long"
        )
        out = metrics.welch_ttest(df, F.col("g"), F.col("v")).collect()[0]

        def mv(xs):
            n = len(xs)
            m = sum(xs) / n
            var = sum((x - m) ** 2 for x in xs) / (n - 1)
            return n, m, var

        na, ma, va = mv(a)
        nb, mb, vb = mv(b)
        se2 = va / na + vb / nb
        t = (ma - mb) / math.sqrt(se2)
        dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        assert (out["n_a"], out["n_b"]) == (na, nb)
        assert out["mean_a"] == pytest.approx(ma, abs=1e-12)
        assert out["var_b"] == pytest.approx(vb, abs=1e-9)
        assert out["t_stat"] == pytest.approx(t, abs=1e-12)
        assert out["dof"] == pytest.approx(dof, abs=1e-9)

    def test_degenerate_group_yields_nulls_not_crash(self, spark):
        df = spark.createDataFrame([("A", 5), ("B", 7), ("B", 9)],
                                   "g string, v long")
        out = metrics.welch_ttest(df, F.col("g"), F.col("v")).collect()[0]
        assert out["n_a"] == 1 and out["mean_a"] == 5.0
        assert out["t_stat"] is None and out["var_a"] is None


class TestThresholdMetrics:
    def test_confusion_counts_and_f1(self, spark):
        rows = [(i, i >= 60) for i in range(100)]  # label: top 40
        df = spark.createDataFrame(rows, "s long, y boolean")
        out = {
            r["threshold"]: r
            for r in metrics.threshold_metrics(
                df, F.col("s"), F.col("y"), thresholds=(50, 60, 80)
            ).collect()
        }
        # threshold 60 is the perfect operating point
        assert out[60]["tp"] == 40 and out[60]["fp"] == 0 and out[60]["fn"] == 0
        assert out[60]["precision"] == 1.0 and out[60]["f1"] == 1.0
        # threshold 50: predicts 50 positives, 40 true -> p=0.8, r=1.0
        assert out[50]["tp"] == 40 and out[50]["fp"] == 10
        assert out[50]["precision"] == pytest.approx(0.8)
        assert out[50]["f1"] == pytest.approx(2 * 40 / (2 * 40 + 10 + 0))
        # threshold 80: fn appear
        assert out[80]["fn"] == 20 and out[80]["recall"] == pytest.approx(0.5)
        # counts always partition the corpus
        for r in out.values():
            assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 100

    def test_no_predicted_positives_null_precision(self, spark):
        df = spark.createDataFrame([(1, True), (2, False)], "s long, y boolean")
        out = metrics.threshold_metrics(
            df, F.col("s"), F.col("y"), thresholds=(99,)
        ).collect()[0]
        assert out["precision"] is None and out["recall"] == 0.0


def avg_ranks(xs):
    """Tie-averaged ranks, 1-based — the textbook definition."""
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def pearson(xs, ys):
    n = len(xs)
    mx = sum(xs) / n
    my = sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    dx = sum((a - mx) ** 2 for a in xs) ** 0.5
    dy = sum((b - my) ** 2 for b in ys) ** 0.5
    return num / (dx * dy) if dx > 0 and dy > 0 else None


class TestSpearman:
    def test_matches_rank_pearson_replay_with_ties(self, spark):
        rows = [("g", (i * 7) % 13, (i * 5) % 9) for i in range(120)]
        rows += [("h", i, (120 - i) if i % 3 else 40) for i in range(90)]
        df = spark.createDataFrame(rows, "g string, x long, y long")
        out = {
            r["g"]: r
            for r in metrics.spearman_corr(
                df, "g", F.col("x"), F.col("y")
            ).collect()
        }
        for g in ("g", "h"):
            xs = [x for gg, x, _ in rows if gg == g]
            ys = [y for gg, _, y in rows if gg == g]
            expect = pearson(avg_ranks(xs), avg_ranks(ys))
            assert out[g]["n"] == len(xs)
            assert out[g]["rho"] == pytest.approx(expect, abs=1e-12)

    def test_perfect_monotone_is_one(self, spark):
        df = spark.createDataFrame(
            [("g", i, i * i) for i in range(50)], "g string, x long, y long"
        )
        out = metrics.spearman_corr(df, "g", F.col("x"), F.col("y")).collect()[0]
        assert out["rho"] == pytest.approx(1.0)
        inv = metrics.spearman_corr(df, "g", F.col("x"), -F.col("y")).collect()[0]
        assert inv["rho"] == pytest.approx(-1.0)

    def test_constant_column_is_null(self, spark):
        df = spark.createDataFrame(
            [("g", i, 7) for i in range(10)], "g string, x long, y long"
        )
        out = metrics.spearman_corr(df, "g", F.col("x"), F.col("y")).collect()[0]
        assert out["rho"] is None


class TestCohensKappa:
    def test_matches_textbook(self, spark):
        # classic 2x2 example: po = 0.7, pe = 0.5 -> kappa = 0.4
        rows = (
            [(True, True)] * 30 + [(True, False)] * 20
            + [(False, True)] * 10 + [(False, False)] * 40
        )
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        out = metrics.cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
        assert (out["n11"], out["n10"], out["n01"], out["n00"]) == (30, 20, 10, 40)
        po, pe = 0.7, (0.5 * 0.4 + 0.5 * 0.6)
        assert out["po"] == pytest.approx(po)
        assert out["pe"] == pytest.approx(pe)
        assert out["kappa"] == pytest.approx((po - pe) / (1 - pe))

    def test_perfect_agreement_and_degenerate(self, spark):
        same = spark.createDataFrame(
            [(i % 2 == 0, i % 2 == 0) for i in range(10)], "a boolean, b boolean"
        )
        assert metrics.cohens_kappa(
            same, F.col("a"), F.col("b")
        ).collect()[0]["kappa"] == pytest.approx(1.0)
        # both raters constant -> pe = 1 -> NULL, not a crash
        const = spark.createDataFrame(
            [(True, True)] * 5, "a boolean, b boolean"
        )
        assert metrics.cohens_kappa(
            const, F.col("a"), F.col("b")
        ).collect()[0]["kappa"] is None


class TestPoissonBootstrap:
    def test_matches_pure_python_replay(self, spark):
        import hashlib

        rows = [(i, (i * 37) % 500 + 100) for i in range(300)]
        df = spark.createDataFrame(rows, "id long, x long")
        out = metrics.poisson_bootstrap_ci(
            df, F.col("id"), F.col("x"), n_replicates=16,
        ).collect()[0]

        ladder = metrics.POISSON1_CDF_BP

        def weight(i, rep):
            u = int(hashlib.md5(f"{i}:{rep}".encode()).hexdigest()[:8], 16) % 10000
            for k, bp in enumerate(ladder):
                if u < bp:
                    return k
            return len(ladder)

        means = []
        for rep in range(16):
            s = n_eff = 0
            for i, x in rows:
                wt = weight(i, rep)
                s += wt * x
                n_eff += wt
            means.append((s / n_eff, rep))
        means.sort()
        lo_rank = -(-250 * 16 // 10000)   # ceil -> 1
        hi_rank = -(-9750 * 16 // 10000)  # ceil -> 16
        assert out["n"] == 300
        assert out["point_mean"] == pytest.approx(
            sum(x for _, x in rows) / 300, abs=1e-12
        )
        assert out["ci_lo"] == pytest.approx(means[lo_rank - 1][0], abs=1e-12)
        assert out["ci_hi"] == pytest.approx(means[hi_rank - 1][0], abs=1e-12)
        assert out["ci_lo"] <= out["point_mean"] <= out["ci_hi"]

    def test_weights_are_poisson_shaped(self, spark):
        # the md5 draw is uniform, so weight frequencies over many draws
        # track the quantized Poisson(1) pmf (0: ~36.8%, 1: ~36.8%, ...)
        import hashlib

        ladder = metrics.POISSON1_CDF_BP
        counts = [0] * 8
        for i in range(4000):
            u = int(hashlib.md5(f"{i}:0".encode()).hexdigest()[:8], 16) % 10000
            k = next((k for k, bp in enumerate(ladder) if u < bp), 7)
            counts[k] += 1
        assert abs(counts[0] / 4000 - 0.3679) < 0.03
        assert abs(counts[1] / 4000 - 0.3679) < 0.03
        assert sum(counts) == 4000


class TestCalibrationBins:
    def test_bins_and_rates(self, spark):
        # scores 0..99, label true for score >= 50: bins of 25 give
        # rates 0, 0, 1, 1 and exact mean scores
        df = spark.createDataFrame(
            [(i, i >= 50) for i in range(100)], "s long, y boolean"
        )
        out = {
            r["bin_lo"]: r
            for r in metrics.calibration_bins(
                df, F.col("s"), F.col("y"), bin_width=25
            ).collect()
        }
        assert sorted(out) == [0, 25, 50, 75]
        assert [out[b]["pos_rate"] for b in (0, 25, 50, 75)] == [0.0, 0.0, 1.0, 1.0]
        assert out[25]["mean_score"] == pytest.approx((25 + 49) / 2)
        assert all(r["n"] == 25 for r in out.values())


def brute_kaplan_meier(durs):
    """Textbook KM replay: durs = [(dur, ev)]; returns
    {t: (n_risk, d, survival)} over event times, left-to-right product."""
    times = sorted({d for d, e in durs if e})
    out, s = {}, 1.0
    for t in times:
        n = sum(1 for d, _ in durs if d >= t)
        dth = sum(1 for d, e in durs if d == t and e)
        s = s * (1.0 - dth / n)
        out[t] = (n, dth, s)
    return out


class TestKaplanMeier:
    def test_hand_case(self, spark):
        durs = [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0)]
        df = spark.createDataFrame(durs, "dur long, ev int")
        got = {
            r["t"]: (r["n_risk"], r["d_events"], r["survival"])
            for r in metrics.kaplan_meier(df).collect()
        }
        assert set(got) == {1, 3}
        assert got[1] == (5, 1, 0.8)
        n, d, s = got[3]
        assert (n, d) == (3, 2)
        assert s == 0.8 * (1.0 - 2.0 / 3.0)  # bit-exact left fold

    def test_all_censored_empty_curve(self, spark):
        df = spark.createDataFrame([(5, 0), (7, 0)], "dur long, ev int")
        assert metrics.kaplan_meier(df).count() == 0

    def test_matches_textbook_replay_and_monotone(self, spark):
        import random

        rng = random.Random(77)
        durs = [(rng.randint(0, 20), rng.randint(0, 1)) for _ in range(200)]
        df = spark.createDataFrame(durs, "dur long, ev int")
        rows = sorted(metrics.kaplan_meier(df).collect(), key=lambda r: r["t"])
        ref = brute_kaplan_meier(durs)
        assert {r["t"] for r in rows} == set(ref)
        for r in rows:
            n, d, s = ref[r["t"]]
            assert (r["n_risk"], r["d_events"]) == (n, d)
            assert r["survival"] == pytest.approx(s, abs=1e-12)
        surv = [r["survival"] for r in rows]
        assert all(a >= b for a, b in zip(surv, surv[1:]))
        assert all(0.0 <= x <= 1.0 for x in surv)


def brute_pava(bins):
    """Textbook pool-adjacent-violators on (n, pos) bins; returns the
    fitted rate per bin as a float."""
    pools = [[n, p] for n, p in bins]  # [weight, positives]
    i = 0
    while i + 1 < len(pools):
        if pools[i][1] * pools[i + 1][0] > pools[i + 1][1] * pools[i][0]:
            pools[i][0] += pools[i + 1][0]
            pools[i][1] += pools[i + 1][1]
            del pools[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    out = []
    # re-expand pools to per-bin fits
    it = iter(bins)
    for w, p in pools:
        acc = 0
        while acc < w:
            n, _ = next(it)
            acc += n
            out.append(p / w)
    return out


def brute_minimax_micro(bins):
    """The micro-unit-quantized minimax form isotonic_fit computes —
    the exact replay, for bitwise comparison."""
    k = len(bins)
    cn = [0]
    cp = [0]
    for n, p in bins:
        cn.append(cn[-1] + n)
        cp.append(cp[-1] + p)

    def q(j, l):  # pooled rate of bins j..l (1-based), micro-units
        return ((cp[l] - cp[j - 1]) * 1_000_000) // (cn[l] - cn[j - 1])

    return [
        max(min(q(j, l) for l in range(i, k + 1)) for j in range(1, i + 1))
        for i in range(1, k + 1)
    ]


class TestIsotonicFit:
    def _fit(self, spark, bins):
        df = spark.createDataFrame(
            [(100 * i, n, p) for i, (n, p) in enumerate(bins)],
            "bin_lo long, n long, pos long",
        )
        rows = sorted(metrics.isotonic_fit(df).collect(), key=lambda r: r["bin_lo"])
        return [r["iso_micro"] for r in rows]

    def test_already_monotone_is_identity(self, spark):
        bins = [(10, 1), (10, 5), (10, 9)]
        assert self._fit(spark, bins) == [100000, 500000, 900000]

    def test_violation_pools_to_weighted_mean(self, spark):
        # rates 0.9 then 0.1 with equal weight pool to 0.5
        assert self._fit(spark, [(10, 9), (10, 1)]) == [500000, 500000]

    def test_matches_quantized_minimax_and_tracks_pava(self, spark):
        import random

        rng = random.Random(202)
        for _ in range(3):
            k = rng.randint(2, 9)
            bins = []
            for _ in range(k):
                n = rng.randint(1, 50)
                bins.append((n, rng.randint(0, n)))
            got = self._fit(spark, bins)
            assert got == brute_minimax_micro(bins)  # exact replay
            assert all(a <= b for a, b in zip(got, got[1:]))  # monotone
            ref = brute_pava(bins)
            for g, r in zip(got, ref):
                # quantize-before-compare can sit 1 micro-unit from
                # float PAVA at a pooled-rate boundary
                assert abs(g / 1_000_000 - r) < 2e-6
