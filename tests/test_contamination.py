"""Unit tests for the corpus-hygiene surface: train/eval decontamination,
repetition counters, and PII scrubbing — tiny hand-computed fixtures, so
every expected number is checkable by eye.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.functions import contamination, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_overlap_counts(spark):
    # train doc 1 shares exactly two distinct trigrams with eval doc 100:
    # "a b c" and "b c d"; train doc 2 shares one ("x y z"); doc 3 none.
    train = _docs(spark, [
        (1, "a b c d q"),
        (2, "p q r x y z"),
        (3, "m n o p q"),
    ])
    ev = _docs(spark, [(100, "a b c d"), (200, "w x y z")])
    got = {
        (r["train_id"], r["eval_id"]): (r["shared_ngrams"], r["overlap_frac"])
        for r in contamination.ngram_overlap(train, ev, n=3, min_shared=1).collect()
    }
    # eval 100 has trigrams {"a b c", "b c d"} (2), eval 200 {"w x y", "x y z"} (2)
    assert got[(1, 100)] == (2, 1.0)
    assert got[(2, 200)] == (1, 0.5)
    assert (3, 100) not in got and (3, 200) not in got


def test_ngram_overlap_min_shared_filters(spark):
    train = _docs(spark, [(1, "a b c d q"), (2, "p q r x y z")])
    ev = _docs(spark, [(100, "a b c d"), (200, "w x y z")])
    pairs = contamination.ngram_overlap(train, ev, n=3, min_shared=2).collect()
    assert {(r["train_id"], r["eval_id"]) for r in pairs} == {(1, 100)}


def test_decontaminate_drops_contaminated_only(spark):
    train = _docs(spark, [
        (1, "a b c d q"),      # 2 shared trigrams with eval -> dropped
        (2, "p q r x y z"),    # 1 shared -> kept at min_shared=2
        (3, "m n o p q"),      # 0 shared -> kept
    ])
    ev = _docs(spark, [(100, "a b c d"), (200, "w x y z")])
    kept = contamination.decontaminate(train, ev, n=3, min_shared=2)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    # original columns survive the anti-join
    assert kept.columns == ["doc_id", "text"]


def test_short_docs_emit_no_ngrams(spark):
    # 2-token doc has no trigrams: shingles' short-doc fallback must NOT
    # leak a whole-text pseudo-shingle into the postings
    df = _docs(spark, [(1, "a b"), (2, "a b c")])
    got = contamination.ngram_postings(df, n=3).collect()
    assert {r["doc_id"] for r in got} == {2}
    assert [r["ngram"] for r in got] == ["a b c"]


def test_repetition_stats_hand_computed(spark):
    # "a b a b a": bigrams = [a b, b a, a b, b a] -> 4 total, 2 distinct,
    # top count 2. "x y": 1 bigram. "z" alone: no bigrams -> dropped.
    df = _docs(spark, [(1, "a b a b a"), (2, "x y"), (3, "z")])
    got = {r["doc_id"]: r for r in text.repetition_stats(df, n=2).collect()}
    assert (got[1]["n_ngrams"], got[1]["distinct_ngrams"], got[1]["top_ngram_count"]) == (4, 2, 2)
    assert (got[2]["n_ngrams"], got[2]["distinct_ngrams"], got[2]["top_ngram_count"]) == (1, 1, 1)
    assert 3 not in got


def test_scrub_pii_counts_and_redacts(spark):
    df = _docs(spark, [
        (1, "write a@b.io and c.d+x@e.org now"),
        (2, "call 555-1234 twice: 555-1234"),
        (3, "clean text only"),
    ])
    got = {r["doc_id"]: r for r in text.scrub_pii(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (2, 0)
    assert got[1]["clean_text"] == "write [EMAIL] and [EMAIL] now"
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (0, 2)
    assert got[2]["clean_text"] == "call [PHONE] twice: [PHONE]"
    assert got[3]["clean_text"] == "clean text only"


def test_scrub_pii_email_digits_not_double_counted(spark):
    # the digit run inside an address must not also count as a phone
    df = _docs(spark, [(1, "mail me: abc123-4567@x.co")])
    r = text.scrub_pii(df).collect()[0]
    assert (r["n_emails"], r["n_phones"]) == (1, 0)
    assert r["clean_text"] == "mail me: [EMAIL]"


def test_eval_broadcast_plan(spark):
    # the 100 TB contract: with broadcast_eval=True the n-gram join must be
    # a BroadcastHashJoin — the train side never shuffles on the ngram key
    train = _docs(spark, [(i, "a b c d e f g") for i in range(10)])
    ev = _docs(spark, [(100, "a b c d")])
    df = contamination.ngram_overlap(train, ev, n=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(ngram" not in plan


def test_mad_outliers_hand_computed(spark):
    # group g: values [10,10,10,10,100] -> med=10, adev=[0,0,0,0,90],
    # mad=0 -> outlier iff adev > 0: only the 100
    df = spark.createDataFrame(
        [(1, "g", 10), (2, "g", 10), (3, "g", 10), (4, "g", 10), (5, "g", 100)],
        "id long, grp string, v int",
    )
    out = text.mad_outliers(df, "v", "grp", k=3.0).collect()
    assert [(r["id"], r["med"], r["mad"]) for r in out] == [(5, 10.0, 0.0)]


def test_mad_outliers_interpolated_median(spark):
    # even count: med interpolates to a .5 -> exact double on both engines
    df = spark.createDataFrame(
        [(1, "g", 1), (2, "g", 2), (3, "g", 3), (4, "g", 1000)],
        "id long, grp string, v int",
    )
    out = {r["id"]: r for r in text.mad_outliers(df, "v", "grp", k=3.0).collect()}
    # med=2.5, adevs=[1.5,0.5,0.5,997.5], mad=1.0 -> outlier iff adev>3
    assert set(out) == {4}
    assert out[4]["med"] == 2.5 and out[4]["mad"] == 1.0


def test_ngram_overlap_shuffle_join_path_equivalent(spark):
    # broadcast_eval=False (eval too big to broadcast) must produce the
    # identical pair list through the plain hash-join path
    train = _docs(spark, [(i, f"a b c d e f g{i}") for i in range(6)])
    ev = _docs(spark, [(100, "a b c d"), (200, "e f g1 h")])
    a = sorted(map(tuple, contamination.ngram_overlap(train, ev, n=3, broadcast_eval=True).collect()))
    b = sorted(map(tuple, contamination.ngram_overlap(train, ev, n=3, broadcast_eval=False).collect()))
    assert a == b and len(a) > 0


def test_unigram_logprob_hand_computed(spark):
    import math

    # corpus tokens: [a, a, a, b] -> p(a)=3/4, p(b)=1/4
    df = _docs(spark, [(1, "a a a"), (2, "b")])
    got = {r["doc_id"]: r for r in text.unigram_logprob(df).collect()}
    assert got[1]["n_tokens"] == 3
    assert got[1]["avg_logprob"] == round(math.log(3 / 4), 4)
    assert got[2]["n_tokens"] == 1
    assert got[2]["avg_logprob"] == round(math.log(1 / 4), 4)


def test_decontaminate_no_forced_broadcast_when_flag_off(spark):
    # broadcast_eval=False is chosen when the eval side (and so the hit
    # set) is large: the anti-join side must NOT be force-broadcast then —
    # result is identical, strategy is left to Catalyst/AQE.
    train = _docs(spark, [(1, "a b c d q"), (2, "p q r x y z"), (3, "m n o p q")])
    ev = _docs(spark, [(100, "a b c d"), (200, "w x y z")])
    kept = contamination.decontaminate(train, ev, n=3, min_shared=2, broadcast_eval=False)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint (strategy=broadcast)" not in plan
