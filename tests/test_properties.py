"""Property-based tests (hypothesis): sessionization and reshaping
invariants against pure-Python reference implementations.

Few examples per property (Spark round-trip per example is ~1 s); the
generators target the semantic edge cases: timestamp collisions, gap
boundaries, empty/singleton groups.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from nyc_bikeshare_datawarehouse_spark.operators.sessionize import sessionize
from nyc_bikeshare_datawarehouse_spark.operators.unpivot import unpivot

BASE = datetime.datetime(2024, 1, 1)

# offsets in seconds; duplicates allowed on purpose (ts collisions)
offsets = st.lists(st.integers(min_value=0, max_value=7200), min_size=1, max_size=12)


def py_sessionize(sorted_offsets: list[int], gap: int) -> list[int]:
    """Reference implementation: 1-based session ids over sorted events."""
    ids, cur = [], 0
    prev = None
    for off in sorted_offsets:
        if prev is None or off - prev > gap:
            cur += 1
        ids.append(cur)
        prev = off
    return ids


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(offsets=offsets, gap=st.sampled_from([60, 600, 1800]))
def test_sessionize_matches_reference(spark, offsets, gap):
    ordered = sorted(offsets)
    rows = [(1, BASE + datetime.timedelta(seconds=off), i) for i, off in enumerate(ordered)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    got = sessionize(df, "user_id", "ts", gap, order_tiebreak="event_id")
    by_event = {r["event_id"]: r["session_id"] for r in got.collect()}
    want = py_sessionize(ordered, gap)
    assert [by_event[i] for i in range(len(ordered))] == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 5), st.floats(allow_nan=False, allow_infinity=False, width=32)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_unpivot_preserves_cells(spark, vals):
    # unpivot emits exactly one (name, value) row per id x value-column cell
    df = spark.createDataFrame([(i, float(v), float(v) * 2) for i, v in vals], "id int, a double, b double")
    long = unpivot(df, ["id"], ["a", "b"], "name", "value")
    got = sorted(tuple(r) for r in long.collect())
    want = sorted(
        [(i, "a", float(v)) for i, v in vals] + [(i, "b", float(v) * 2) for i, v in vals]
    )
    assert got == want


def py_quantize(vec: list[float]) -> list[int]:
    import math

    mx = max(abs(x) for x in vec)
    if mx == 0:
        return [0] * len(vec)
    return [math.floor(x / mx * 127.0 + 0.5) for x in vec]


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vec=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
        min_size=1, max_size=16,
    )
)
def test_quantize_matches_reference(spark, vec):
    from nyc_bikeshare_datawarehouse_spark.functions.similarity import quantize_embeddings

    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    r = quantize_embeddings(df).collect()[0]
    # float32 storage rounds the input; reference must see the same values
    stored = [float(x) for x in df.collect()[0]["embedding"]]
    assert r["q"] == py_quantize(stored)
    assert all(-127 <= c <= 127 for c in r["q"])


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8).map(" ".join),
        min_size=1, max_size=8,
    )
)
def test_ngram_overlap_bounded_by_set_sizes(spark, texts):
    # shared_ngrams can never exceed either side's distinct-trigram count,
    # and overlap_frac is in (0, 1]
    from nyc_bikeshare_datawarehouse_spark.functions import contamination

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ev = docs.limit(1)
    sizes = {
        r["doc_id"]: r["n"]
        for r in contamination.ngram_postings(docs, n=3)
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in contamination.ngram_overlap(docs, ev, n=3).collect():
        assert r["shared_ngrams"] <= min(sizes[r["train_id"]], sizes[r["eval_id"]])
        assert 0 < r["overlap_frac"] <= 1.0


# ---------------------------------------------------------------- round 6

words = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=0, max_size=14
)


def py_duplicate_spans(docs: list[tuple[int, str]], n: int) -> set[tuple[int, int, int]]:
    """Reference: corpus-wide n-gram counts -> per-doc merged spans."""
    from collections import Counter

    grams: dict[int, list[tuple[int, str]]] = {}
    counts: Counter = Counter()
    for did, text in docs:
        toks = [t for t in text.split(" ") if t]
        if len(toks) < n:
            continue
        gs = [(i, " ".join(toks[i : i + n])) for i in range(len(toks) - n + 1)]
        grams[did] = gs
        counts.update(g for _, g in gs)
    out = set()
    for did, gs in grams.items():
        hits = sorted(i for i, g in gs if counts[g] >= 2)
        cur = None
        for i in hits:
            if cur is None or i > cur[1]:
                if cur:
                    out.add((did, cur[0], cur[1]))
                cur = [i, i + n]
            else:
                cur[1] = max(cur[1], i + n)
        if cur:
            out.add((did, cur[0], cur[1]))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(words, min_size=2, max_size=6), n=st.sampled_from([2, 3]))
def test_duplicate_spans_matches_reference(spark, texts, n):
    from nyc_bikeshare_datawarehouse_spark.functions import dedup

    docs = [(i, " ".join(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(df, gram_n=n).collect()
    }
    assert got == py_duplicate_spans(docs, n)


def py_zvalue(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)), min_size=1, max_size=8
    )
)
def test_zvalue_matches_reference_and_is_injective(spark, pts):
    from nyc_bikeshare_datawarehouse_spark.operators.layout import zvalue

    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zvalue([F.col("x"), F.col("y")], 10).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == py_zvalue([x, y], 10)
    assert len(set(got.values())) == len({(x, y) for x, y in got})


def py_mixture_copies(key: int, bp: int) -> int:
    import hashlib

    bucket = int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 10000
    return bp // 10000 + (1 if bucket < bp % 10000 else 0)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**6), st.sampled_from([0, 2500, 10000, 15000, 35000])),
        min_size=1,
        max_size=10,
        unique_by=lambda r: r[0],
    )
)
def test_mixture_upsample_matches_md5_model(spark, rows):
    from nyc_bikeshare_datawarehouse_spark.operators.sampling import mixture_upsample

    df = spark.createDataFrame(rows, "id long, weight_bp long")
    out = mixture_upsample(df, "id", "weight_bp").groupBy("id").count().collect()
    got = {r["id"]: r["count"] for r in out}
    for key, bp in rows:
        assert got.get(key, 0) == py_mixture_copies(key, bp)


# --- round 7: sequence packing and the BPE merge fold ---------------------

token_counts = st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=20)


def py_pack(counts: list[int], seq_len: int) -> list[tuple[int, int]]:
    """Reference greedy no-split pack over docs in order: (seq_id, offset)."""
    out, seq_id, cum = [], 1, 0
    for tc in counts:
        if cum > 0 and cum + tc > seq_len:
            seq_id += 1
            cum = 0
        out.append((seq_id, cum))
        cum += tc
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(counts=token_counts, seq_len=st.sampled_from([8, 16, 40]))
def test_pack_sequences_matches_reference(spark, counts, seq_len):
    from nyc_bikeshare_datawarehouse_spark.operators.packing import pack_sequences

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["seq_id"], r["offset"])
        for r in pack_sequences(df, seq_len=seq_len, n_shards=1).collect()
    }
    want = py_pack(counts, seq_len)
    assert [got[i] for i in range(len(counts))] == want


sym_lists = st.lists(st.sampled_from(["a", "b", "c", "ab"]), min_size=1, max_size=10)


def py_merge(s: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    syms=sym_lists,
    pair=st.sampled_from([("a", "a"), ("a", "b"), ("b", "a"), ("a", "ab"), ("ab", "b")]),
)
def test_bpe_merge_fold_matches_sequential_scan(spark, syms, pair):
    # the fold must equal the canonical left-to-right non-overlapping
    # scan for EVERY symbol sequence, including overlap runs and pairs
    # whose merged form collides with other symbols ('a'+'b' == 'ab')
    from nyc_bikeshare_datawarehouse_spark.functions import bpe

    df = spark.createDataFrame([(1, syms)], "id int, syms array<string>")
    got = list(bpe.apply_merge(df, pair[0], pair[1]).first()["syms"])
    assert got == py_merge(syms, pair[0], pair[1])


# ---- Ed-Join fuzzy pairs: losslessness vs python levenshtein ----------------

def _py_lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# small alphabet ON PURPOSE: maximizes shared/hot grams, ties in the df
# ordering, and accidental near-duplicates — the filter's hardest regime
fuzzy_names = st.lists(
    st.text(alphabet="abc", min_size=2, max_size=8), min_size=2, max_size=8
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(names=fuzzy_names, k=st.sampled_from([1, 2]), q=st.sampled_from([2, 3]),
       form=st.sampled_from(["default", "exhaustive", "exhaustive_banded"]))
def test_fuzzy_pairs_lossless_vs_python(spark, names, k, q, form):
    # duplicate names in the list exercise the default form's distinct-
    # universe collapse + id re-expansion; the exhaustive twins run with
    # and without the (gram, length) banded candidate key
    from nyc_bikeshare_datawarehouse_spark.functions.fuzzy import (
        fuzzy_pairs,
        fuzzy_pairs_exhaustive,
    )

    rows = [(i, s) for i, s in enumerate(names)]
    df = spark.createDataFrame(rows, "id int, name string")
    left = df.select(F.col("id").alias("id_l"), "name")
    right = df.select(F.col("id").alias("id_r"), "name")
    if form == "default":
        res = fuzzy_pairs(left, right, "name", "id_l", "id_r", k=k, q=q)
    else:
        res = fuzzy_pairs_exhaustive(
            left, right, "name", "id_l", "id_r", k=k, q=q,
            length_banded=(form == "exhaustive_banded"),
        )
    got = {(r["id_l"], r["id_r"]): r["dist"] for r in res.collect()}
    want = {
        (i, j): _py_lev(a, b)
        for i, a in rows
        for j, b in rows
        if _py_lev(a, b) <= k
    }
    assert got == want


# ---- interval overlap join: bin blocking vs brute force ---------------------

intervals_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5000),
              st.integers(min_value=0, max_value=3000)),
    min_size=1, max_size=10,
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=intervals_strategy, right=intervals_strategy,
       bin_seconds=st.sampled_from([60, 777, 3600]))
def test_interval_overlap_matches_brute_force(spark, left, right, bin_seconds):
    from nyc_bikeshare_datawarehouse_spark.operators.interval import (
        interval_overlap_join,
    )

    def frame(rows, idc):
        data = [
            (i, BASE + datetime.timedelta(seconds=s),
             BASE + datetime.timedelta(seconds=s + d))
            for i, (s, d) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data, f"{idc} int, session_start timestamp, session_end timestamp"
        )

    l, r = frame(left, "lid"), frame(right, "rid")
    got = {(x["lid"], x["rid"])
           for x in interval_overlap_join(l, r, "lid", "rid",
                                          bin_seconds=bin_seconds).collect()}
    want = {
        (i, j)
        for i, (s1, d1) in enumerate(left)
        for j, (s2, d2) in enumerate(right)
        if s1 <= s2 + d2 and s2 <= s1 + d1
    }
    assert got == want


# ---------------------------------------------------------------- graph

def py_pagerank(edges: list[tuple[str, str, int]], iters: int) -> dict[str, int]:
    from nyc_bikeshare_datawarehouse_spark.functions import graph as g

    outw: dict[str, int] = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    score = {n: g.UNIT for n in nodes}
    base = (g.UNIT // g.DAMP_DEN) * (g.DAMP_DEN - g.DAMP_NUM)
    for _ in range(iters):
        tot = {n: 0 for n in nodes}
        for s, d, w in edges:
            tot[d] += (score[s] * w) // outw[s]
        score = {n: base + (g.DAMP_NUM * tot[n]) // g.DAMP_DEN for n in nodes}
    return score


@given(
    raw=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(1, 9)),
        min_size=1, max_size=12,
    ),
    iters=st.sampled_from([1, 3, 7]),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_matches_reference_on_random_graphs(spark, raw, iters):
    from nyc_bikeshare_datawarehouse_spark.functions import graph as g

    # dedupe parallel edges (the engine takes a weighted edge LIST; the
    # reference folds duplicates identically, so keep them — but drop
    # self-loop-only graphs where outw exists and rank is still defined)
    edges = [(f"n{s}", f"n{d}", w) for s, d, w in raw]
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    got = {r["node"]: r["score_nano"] for r in g.pagerank(df, iters=iters).collect()}
    # reference must fold duplicate (src,dst) pairs the same way the
    # engine's groupBy would NOT (pagerank takes edges as-is): feed raw
    want = py_pagerank(edges, iters)
    assert got == want
    # conservation bound: total rank never exceeds |V| * UNIT
    assert sum(got.values()) <= len(want) * g.UNIT


def py_bfs(edges: list[tuple[str, str]], seeds: set[str], k: int) -> dict[str, int]:
    dist = {s: 0 for s in seeds}
    for _ in range(k):
        nxt = dict(dist)
        for s, d in edges:
            if s in dist and dist[s] + 1 < nxt.get(d, 1 << 30):
                nxt[d] = dist[s] + 1
        dist = nxt
    return dist


@given(
    raw=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=15
    ),
    k=st.sampled_from([1, 2, 4]),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bfs_matches_reference_on_random_graphs(spark, raw, k):
    from nyc_bikeshare_datawarehouse_spark.functions import graph as g

    edges = [(f"n{s}", f"n{d}") for s, d in raw]
    seeds = {edges[0][0]}
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
    got = {r["node"]: r["hops"] for r in g.bfs_hops(df, sdf, max_hops=k).collect()}
    assert got == py_bfs(edges, seeds, k)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=300,
    ),
    ranks=st.lists(st.integers(1, 300), min_size=1, max_size=4),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exact_rank_values_matches_sorted(spark, vals, ranks):
    from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
        exact_rank_values,
    )

    ranks = sorted({min(r, len(vals)) for r in ranks})
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    # tiny buckets/slice force the shared narrowing worklist on every run
    got = exact_rank_values(df, "v", ranks, n_buckets=4, max_slice=8)
    s = sorted(vals)
    assert got == {r: s[r - 1] for r in ranks}


@given(
    groups=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        ),
        min_size=1,
        max_size=200,
    ),
    bps=st.lists(st.integers(1, 10000), min_size=1, max_size=4),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_exact_group_quantiles_matches_per_group_sort(spark, groups, bps):
    # randomized groups, values and basis points through the work-group
    # machinery with tiny buckets/slice (forces splits, batched
    # terminals, and tied-slice short circuits on most runs)
    from nyc_bikeshare_datawarehouse_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    bps = sorted(set(bps))
    df = spark.createDataFrame(groups, "g string, v double")
    got = {(r["g"], r["q_bp"]): (r["n"], r["rank"], r["value"])
           for r in exact_group_quantiles(
               df, "g", "v", quantiles_bp=bps, n_buckets=4, max_slice=8
           ).collect()}
    from collections import defaultdict
    byg = defaultdict(list)
    for g, v in groups:
        byg[g].append(v)
    want = {}
    for g, vs in byg.items():
        n, svs = len(vs), sorted(vs)
        for bp in bps:
            rank = max(1, (bp * n + 9999) // 10000)
            want[(g, bp)] = (n, rank, svs[rank - 1])
    assert got == want


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=60,
    ),
    users=st.integers(1, 3),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rolling_median_matches_naive_replay(spark, vals, users):
    # random values spread round-robin over 1-3 users through the
    # bounded-frame window; naive replay = sorted(frame)[ceil(n/2)-1]
    import datetime as dt
    import math
    import os
    import tempfile

    from nyc_bikeshare_datawarehouse_spark.plans.queries import q_rolling_median

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), i % users, v, "x", "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, value double, "
        "event_type string, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r["event_id"]: (r["rolling_med"], r["n_in_frame"])
           for r in q_rolling_median(spark, d).collect()}
    per_user: dict[int, list[tuple[int, float]]] = {}
    for i, v in enumerate(vals):
        per_user.setdefault(i % users, []).append((i, v))
    want = {}
    for seq in per_user.values():
        for j, (eid, _) in enumerate(seq):
            frame = [v for _, v in seq[max(0, j - 4): j + 1]]
            want[eid] = (sorted(frame)[math.ceil(len(frame) / 2) - 1], len(frame))
    assert got == want


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=64),
            min_size=4,
            max_size=4,
        ).filter(lambda v: sum(x * x for x in v) > 1e-6),
        min_size=2,
        max_size=12,
    ),
    lam=st.sampled_from([0, 30, 70, 100]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mmr_select_matches_bruteforce_greedy(spark, vecs, lam):
    # the distributed shortlist+applyInPandas MMR must equal a direct
    # python greedy on the same integer micro-unit cosines
    import math

    from nyc_bikeshare_datawarehouse_spark.functions.similarity import mmr_select

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probe = df.filter(F.col("vec_id") == 0)
    k = min(5, len(vecs) - 1)
    got = [
        (r["rank"], r["id"], r["rel_u"], r["maxsim_u"], r["score_u"])
        for r in mmr_select(
            df.filter(F.col("vec_id") != 0), probe, k=k, shortlist=8, lam_pct=lam
        ).collect()
    ]

    def u(x):
        s = x * 1e6
        return int(math.floor(s + 0.5)) if s >= 0 else -int(math.floor(-s + 0.5))

    def cos_u(a, b):
        d = 0.0
        for x, y in zip(vecs[a], vecs[b]):
            d += x * y
        na = math.sqrt(sum(x * x for x in vecs[a]))
        nb = math.sqrt(sum(x * x for x in vecs[b]))
        return u(d / (na * nb))

    ids = [i for i, _ in rows if i != 0]
    rel = {i: cos_u(i, 0) for i in ids}
    short = sorted(ids, key=lambda i: (-rel[i], i))[:8]
    selected, want = [], []
    remaining = sorted(short)
    for rank in range(1, min(k, len(short)) + 1):
        best = None
        for c in remaining:
            ms = max((cos_u(c, s) for s in selected), default=0)
            score = lam * rel[c] - (100 - lam) * ms
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, ms, score)
        _, c, ms, score = best
        selected.append(c)
        remaining.remove(c)
        want.append((rank, c, rel[c], ms, score))
    assert got == want


# ---------------------------------------------------------------- metrics

auc_rows = st.lists(
    st.tuples(st.integers(min_value=-50, max_value=50), st.booleans()),
    min_size=2,
    max_size=60,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=auc_rows)
def test_roc_auc_matches_pair_probability(spark, rows):
    """AUC == P(pos score > neg score) + P(tie)/2, the definition —
    brute-force pair counting over arbitrary tie-heavy inputs."""
    from nyc_bikeshare_datawarehouse_spark.functions import metrics

    df = spark.createDataFrame(rows, "s long, y boolean")
    out = metrics.roc_auc(df, F.col("s"), [("y", F.col("y"))], bucket_width=7)
    got = out.collect()[0]["auc"]
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    if not pos or not neg:
        assert got is None
        return
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    assert got == wins / (len(pos) * len(neg))


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=auc_rows, shift=st.integers(min_value=1, max_value=9))
def test_roc_auc_invariant_under_monotone_transform(spark, rows, shift):
    """AUC is a rank statistic: any strictly increasing score transform
    (here affine + cubic, both order-preserving on longs) leaves it
    unchanged — the property that separates AUC from calibration-
    sensitive metrics."""
    from nyc_bikeshare_datawarehouse_spark.functions import metrics

    df = spark.createDataFrame(rows, "s long, y boolean")
    labels = [("y", F.col("y"))]
    base = metrics.roc_auc(df, F.col("s"), labels).collect()[0]["auc"]
    affine = metrics.roc_auc(
        df, F.col("s") * shift + 3, labels
    ).collect()[0]["auc"]
    cubic = metrics.roc_auc(
        df, F.col("s") * F.col("s") * F.col("s"), labels
    ).collect()[0]["auc"]
    assert affine == base
    assert cubic == base


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    a=st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=30),
    b=st.lists(st.integers(min_value=0, max_value=1000), min_size=2, max_size=30),
)
def test_welch_antisymmetric_and_matches_reference(spark, a, b):
    """t(A,B) == -t(B,A) with identical dof, and both match the textbook
    formulas — degenerate zero-variance pairs yield NULL/NaN-free rows
    or honest NULLs, never wrong numbers."""
    import math as m

    from nyc_bikeshare_datawarehouse_spark.functions import metrics

    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    fwd = metrics.welch_ttest(df, F.col("g"), F.col("v")).collect()[0]
    rev = metrics.welch_ttest(
        df, F.col("g"), F.col("v"), group_a="B", group_b="A"
    ).collect()[0]

    def mv(xs):
        n = len(xs)
        mean = sum(xs) / n
        return n, mean, sum((x - mean) ** 2 for x in xs) / (n - 1)

    na, ma, va = mv(a)
    nb, mb, vb = mv(b)
    se2 = va / na + vb / nb
    if se2 == 0:
        # both groups constant: t is 0/0 — the contract is an honest
        # NULL (ANSI mode would otherwise crash; hypothesis found it)
        assert fwd["t_stat"] is None and rev["t_stat"] is None
        return
    t = (ma - mb) / m.sqrt(se2)
    assert fwd["t_stat"] == pytest.approx(t, rel=1e-9)
    assert rev["t_stat"] == pytest.approx(-t, rel=1e-9)
    assert fwd["dof"] == pytest.approx(rev["dof"], rel=1e-9)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=20),
                  st.integers(min_value=0, max_value=20)),
        min_size=3, max_size=40,
    )
)
def test_spearman_matches_rank_pearson(spark, rows):
    from nyc_bikeshare_datawarehouse_spark.functions import metrics
    from tests.test_metrics import avg_ranks, pearson

    df = spark.createDataFrame([("g", x, y) for x, y in rows],
                               "g string, x long, y long")
    got = metrics.spearman_corr(df, "g", F.col("x"), F.col("y")).collect()[0]
    xs = [x for x, _ in rows]
    ys = [y for _, y in rows]
    want = pearson(avg_ranks(xs), avg_ranks(ys))
    if want is None:
        assert got["rho"] is None
    else:
        assert got["rho"] == pytest.approx(want, abs=1e-9)


_edges_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(raw=_edges_strategy)
def test_triangle_counts_match_brute_force(spark, raw):
    """Degree-oriented triangle counting == literal 3-subset enumeration
    on arbitrary small graphs (self-loops and duplicate/reversed edges
    included — the operator must canonicalize them away)."""
    import itertools

    from nyc_bikeshare_datawarehouse_spark.functions import graph

    df = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in raw], "src string, dst string"
    )
    got = {
        r["node"]: r["triangles"] for r in graph.triangle_counts(df).collect()
    }
    clean = {frozenset((a, b)) for a, b in raw if a != b}
    nodes = sorted({x for e in clean for x in e})
    want = {f"n{n}": 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if all(
            frozenset(p) in clean for p in ((a, b), (b, c), (a, c))
        ):
            for n in (a, b, c):
                want[f"n{n}"] += 1
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    raw=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7), st.integers(1, 9)),
        min_size=1,
        max_size=20,
    ),
    cap=st.sampled_from([5, 15, 40]),
)
def test_shortest_paths_match_dijkstra(spark, raw, cap):
    """Bellman-Ford fixpoint == Dijkstra under any cap, including caps
    that truncate the reachable set."""
    import heapq

    from nyc_bikeshare_datawarehouse_spark.functions import graph

    edges = [(f"n{a}", f"n{b}", w) for a, b, w in raw if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    seeds = spark.createDataFrame([(edges[0][0],)], "node string")
    got = {
        r["node"]: r["dist"]
        for r in graph.shortest_paths(df, seeds, cap=cap).collect()
    }
    adj: dict[str, list] = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    dist: dict[str, int] = {}
    heap = [(0, edges[0][0])]
    while heap:
        du, u = heapq.heappop(heap)
        if u in dist or du > cap:
            continue
        dist[u] = du
        for v, w in adj.get(u, []):
            if v not in dist:
                heapq.heappush(heap, (du + w, v))
    assert got == dist


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ops=st.lists(
        st.tuples(st.sampled_from(["append", "overwrite"]), st.integers(0, 3)),
        min_size=1,
        max_size=5,
    )
)
def test_versioned_snapshots_match_model(spark, tmp_path_factory, ops):
    """Model-based check of the manifest table format: any sequence of
    append/overwrite commits must read back, AS OF every version, the
    exact multiset a pure-Python model predicts — including empty
    commits (schema-only manifests)."""
    from nyc_bikeshare_datawarehouse_spark.sources import versioned

    base = str(tmp_path_factory.mktemp("vt") / "tbl")
    model: list[list[int]] = []
    nxt = 0
    for mode, n in ops:
        batch = list(range(nxt, nxt + n))
        nxt += n
        prev = model[-1] if (model and mode == "append") else []
        model.append(prev + batch)
        df = spark.createDataFrame([(i,) for i in batch], "id long") if batch \
            else spark.range(0).select(F.col("id"))
        v = versioned.write_snapshot(df, base, mode=mode)
        assert v == len(model)
    for v, want in enumerate(model, start=1):
        got = sorted(
            r["id"] for r in versioned.read_snapshot(spark, base, v).collect()
        )
        assert got == sorted(want), (v, got, want)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    raw=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 6), st.integers(1, 9)),
        min_size=1,
        max_size=15,
    ),
    iters=st.sampled_from([1, 4, 9]),
)
def test_absorption_probs_match_integer_replay(spark, raw, iters):
    """Value iteration == the pure-Python integer replay on arbitrary
    chains (nodes 0..5 transient, 6 relabeled CONV; a NULL sink added
    so both absorbing states exist), at several fixed horizons."""
    from nyc_bikeshare_datawarehouse_spark.functions import graph
    from tests.test_graph_selection import _absorption_reference

    def name(x):
        return "CONV" if x == 6 else f"s{x}"

    edges = [("FULL", name(a), name(b), w) for a, b, w in raw if name(a) != "CONV"]
    edges.append(("FULL", "s0", "NULL", 1))
    df = spark.createDataFrame(
        edges, "scenario string, src string, dst string, cnt long"
    )
    got = {
        (r["scenario"], r["node"]): r["p"]
        for r in graph.absorption_probs(df, iters=iters).collect()
    }
    assert got == _absorption_reference(edges, iters)


# tokens deliberately hostile: empty, single char, spaces, unicode above
# ASCII, shared prefixes — the char-key clamps and tie handling must keep
# the bucket sequence monotone for ANY string population
_bucket_tokens = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        min_size=0,
        max_size=6,
    ),
    min_size=1,
    max_size=40,
    unique=True,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tokens=_bucket_tokens, zipf=st.booleans())
def test_desc_freq_buckets_monotone_and_rank_exact(spark, tokens, zipf):
    from pyspark.sql import Window

    from nyc_bikeshare_datawarehouse_spark.operators.windows import (
        desc_freq_buckets,
        two_phase_cumsum,
    )

    rows = [
        (t, 1 if (zipf and i % 2 == 0) else (i % 5) + 1)
        for i, t in enumerate(tokens)
    ]
    df = spark.createDataFrame(rows, "token string, n long").repartition(3)
    b = desc_freq_buckets(df, "n", "token", n_buckets=4)
    got = b.select("token", "n", "__fbucket").collect()
    ordered = sorted(got, key=lambda r: (-r["n"], r["token"]))
    buckets = [r["__fbucket"] for r in ordered]
    assert buckets == sorted(buckets), (rows, buckets)

    ranked = two_phase_cumsum(
        b.withColumn("__one", F.lit(1)),
        F.col("__fbucket"),
        [F.desc("n"), F.col("token")],
        values=[("__one", "rn")],
        materialize=False,
    )
    got_rn = {r["token"]: r["rn"] for r in ranked.collect()}
    w = Window.orderBy(F.desc("n"), "token")
    want = {
        r["token"]: r["rn"]
        for r in df.select("token", F.row_number().over(w).alias("rn")).collect()
    }
    assert got_rn == want
