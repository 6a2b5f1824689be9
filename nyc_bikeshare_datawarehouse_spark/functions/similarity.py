"""Similarity search over embedding columns (`array<float>`).

Three tiers, all DataFrame-native:

1. `cosine_topk`  — brute-force exact top-k against one probe vector.
   Dot/norms via higher-order functions (`zip_with` + `aggregate`), fully
   JVM-side; top-k is TakeOrderedAndProject (per-partition heap, no global
   sort). Exact, O(N·d) — the correctness baseline.
2. `ivf_topk`     — IVF-style ANN: deterministic coarse centroids, assign
   each vector to its nearest centroid (one broadcast join), search only
   the probe's `nprobe` nearest cells. At 100 TB the table is written
   partitioned by cell id → partition pruning turns a full scan into a
   few-cells scan.
3. `cosine_near_dup_lsh` — random-hyperplane (signed random projection)
   LSH for embedding near-duplicate pairs: b-bit signatures from
   deterministic pseudo-random hyperplanes, banded bucket join; exact
   cosine verification only within buckets.

All pseudo-randomness is derived deterministically (hash-of-index), so
results are reproducible across runs and cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _vec(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (no UDF)."""
    return F.aggregate(
        F.zip_with(_vec(a), _vec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(F.aggregate(_vec(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    probe: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single probe vector.

    `probe` must be a 1-row frame with `vec_col`; it is crossJoin-broadcast
    so every partition scores locally, then TakeOrderedAndProject merges k
    rows — network cost is O(k), independent of table size."""
    p = F.broadcast(probe.select(F.col(vec_col).alias("__probe")))
    scored = df.crossJoin(p).select(
        F.col(id_col),
        F.round(cosine(vec_col, "__probe"), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def _bit_mask(b: int) -> int:
    """Signed-64-bit mask for bit b (bit 63 is the sign bit = min long)."""
    return -(1 << 63) if b == 63 else (1 << b)


def _deterministic_hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Pseudo-random unit-free hyperplanes from a fixed integer hash — same
    on every run/executor, no RNG state."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            # xorshift-style integer mix of (p, d); public-domain technique.
            h = (p * 2654435761 + d * 40503 + 12345) & 0xFFFFFFFF
            h ^= h >> 13
            h = (h * 1274126177) & 0xFFFFFFFF
            h ^= h >> 16
            row.append((h / 0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


def srp_signature(vec_col, dim: int, n_planes: int = 16) -> Column:
    """Signed-random-projection signature as an int (bit b = sign of
    ⟨v, plane_b⟩), deterministic.

    Built as ONE nested higher-order expression over a 2-D plane literal
    (transform-with-index + inner zip_with/aggregate), not n_planes
    separate aggregates — keeps the codegen tree small and compilation
    O(1) in n_planes."""
    planes = F.array(*[
        F.array(*[F.lit(x) for x in row]) for row in _deterministic_hyperplanes(dim, n_planes)
    ])
    # bit masks as literals (shift functions take Python ints, not lambda
    # variables); bit 63 would need min-long, but n_planes <= 62 in practice
    masks = F.array(*[F.lit(_bit_mask(b)).cast("long") for b in range(n_planes)])
    v = _vec(vec_col)
    bits = F.zip_with(
        planes,
        masks,
        lambda p, mask: F.when(
            F.aggregate(F.zip_with(v, p, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
            > 0,
            mask,
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc.bitwiseOR(b))


def cosine_near_dup_lsh(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    min_cosine: float = 0.9,
) -> DataFrame:
    """Embedding near-duplicate pairs: SRP-LSH buckets, then exact cosine
    verify inside buckets only. Join key is (band, chunk) — small ints —
    so the shuffle is tiny; the expensive exact cosine runs only on
    candidate pairs."""
    width = n_planes // bands
    # explode(array(...)) barrier: stops CollapseProject from inlining the
    # signature expression into every band chunk (see dedup._materialized)
    sig = df.select(
        id_col, vec_col, F.explode(F.array(srp_signature(vec_col, dim, n_planes))).alias("sig")
    )
    chunks = sig.select(
        id_col,
        vec_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("sig"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("chunk"),
                )
                for b in range(bands)
            ])
        ).alias("bc"),
    ).select(id_col, vec_col, "bc.band", "bc.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(b, on=["band", "chunk"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("__va"),
            F.col(f"b.{vec_col}").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= min_cosine)
    )


def ivf_fit_kmeans(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
):
    """Train a real IVF coarse quantizer with seeded KMeans (pyspark.ml,
    import-gated): returns (assigned_df with a `cell` column, centers as
    a list of lists). This is the production replacement for ivf_topk's
    first-K-vectors quantizer — fit once, persist the centers, write the
    corpus `partitionBy("cell")`, and queries prune to nprobe cells.

    Deterministic given the seed. Raises ImportError where pyspark.ml is
    unavailable (callers fall back to the deterministic quantizer)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    feats = df.select(id_col, vec_col, array_to_vector(_vec(vec_col)).alias("__features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter, featuresCol="__features").fit(feats)
    assigned = model.transform(feats).select(
        id_col, vec_col, F.col(model.getPredictionCol()).alias("cell")
    )
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centers


def ivf_topk(
    df: DataFrame,
    probe: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: centroids = the first `n_cells` vectors by id
    (deterministic coarse quantizer — at scale replace with a KMeans fit
    persisted once). Assign rows to nearest centroid, search the probe's
    `nprobe` nearest cells only.

    Scale path: write the corpus `partitionBy("cell")`; the cell filter
    then becomes partition pruning and a query touches nprobe/n_cells of
    the data."""
    cents = F.broadcast(
        df.orderBy(id_col).limit(n_cells)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
    )
    assigned = (
        df.crossJoin(cents)
        .withColumn("d", dot(vec_col, "cent_vec") / (l2_norm(vec_col) * l2_norm("cent_vec")))
        .withColumn(
            "best",
            F.max(F.struct(F.col("d"), F.col("cent_id"))).over(Window.partitionBy(id_col)),
        )
        .filter((F.col("best.cent_id") == F.col("cent_id")))
        .select(id_col, vec_col, F.col("cent_id").alias("cell"))
    )
    probe_cells = (
        probe.select(F.col(vec_col).alias("__probe"))
        .crossJoin(cents)
        .withColumn("d", dot("__probe", "cent_vec") / (l2_norm("__probe") * l2_norm("cent_vec")))
        .orderBy(F.desc("d"))
        .limit(nprobe)
        .select(F.col("cent_id").alias("cell"))
    )
    p = F.broadcast(probe.select(F.col(vec_col).alias("__probe")))
    candidates = assigned.join(F.broadcast(probe_cells), "cell")
    return (
        candidates.crossJoin(p)
        .select(F.col(id_col), F.round(cosine(vec_col, "__probe"), 6).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )
