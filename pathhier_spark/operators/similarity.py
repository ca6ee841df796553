"""Similarity search over embedding columns.

The reference computes cosine-similarity matrices with sklearn inside its
per-pair alignment loop (pathhier/pathway_aligner.py:490, sklearn
cosine_similarity). At corpus scale that becomes: brute-force top-k as the
correctness baseline, and an LSH-bucketed (random hyperplane) variant as the
scale path — candidates only compare within a bucket, turning the O(N*M)
cross join into bucket-local joins.

All dot products are native higher-order functions (F.zip_with +
F.aggregate) — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "embedding",
    k: int = 10,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score every pair, window top-k per query. The corpus side never
    shuffles until the final per-query top-k (which AQE coalesces).
    Output: (q_id, c_id, cos DOUBLE, nn_rank INT)."""
    q = queries.select(F.col(query_id), F.col(vec_col).alias("qv"))
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("cv"))
    scored = q.crossJoin(c).select(
        query_id, corpus_id, cosine_expr(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
    )


def _empty_topk(queries: DataFrame, corpus: DataFrame,
                query_id: str, corpus_id: str) -> DataFrame:
    """Typed empty (q_id, c_id, cos, nn_rank) result — the approximate-top-k
    operators infer vector dims / init centroids from the corpus, which is
    impossible (and semantically moot) when it is empty."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(query_id, queries.schema[query_id].dataType, True),
            T.StructField(corpus_id, corpus.schema[corpus_id].dataType, True),
            T.StructField("cos", T.DoubleType(), True),
            T.StructField("nn_rank", T.IntegerType(), True),
        ]
    )
    return corpus.sparkSession.createDataFrame([], schema)


_QUANT = 1_000_000  # embedding quantization scale for engine-portable sign(dot)


def md5_hyperplanes(dim: int, n_planes: int, band: int) -> list[list[int]]:
    """SRP planes with INTEGER coefficients in [-1000, 1000], each component
    derived from md5('plane:<band>:<p>:<i>') — the same engine-portable
    hex32 trick powering the simhash/fingerprint/OOV oracles, so the banded
    bucket assignment is exactly reproducible in DuckDB SQL (q24's oracle).

    Why integers: sign(v . p) is invariant under positive scaling, so
    unnormalized uniform-integer planes partition directions like unit
    Gaussians do for hashing purposes; and with the vector quantized to
    int64 (floor(x * 1e6)) the dot product is pure integer arithmetic —
    bit-exact across engines, immune to float summation-order flips of
    sign(dot) at the bucket boundary."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"plane:{band}:{p}:{i}".encode()).hexdigest()[:8], 16)
            % 2001
            - 1000
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def _quantized(vec: Column) -> Column:
    """floor(x * 1e6) as long — floor on both engines (DuckDB's ::bigint
    ROUNDS while Spark's ANSI cast truncates, so neither raw cast is
    portable)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * _QUANT))


def _banded_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes_per_band: list[list[list[int]]],
) -> DataFrame:
    """One (id, band, bucket) row per band: bucket = sign-random-projection
    bit pattern under that band's independent integer plane set (see
    md5_hyperplanes). Single quantization of the vector column — the band
    structs are computed in one pass and exploded (same shape as
    dedup.lsh_candidate_pairs). All-integer dots: bit-exact, JVM-side."""
    zero = F.lit(0).cast("long")
    qdf = df.withColumn("_qv", _quantized(F.col(vec_col)))
    band_structs = []
    for b, planes in enumerate(planes_per_band):
        bucket = zero
        for i, p in enumerate(planes):
            plane = F.array(*[F.lit(int(x)).cast("long") for x in p])
            dot = F.aggregate(
                F.zip_with(F.col("_qv"), plane, lambda x, y: x * y),
                zero,
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(
                dot >= 0, F.lit(1 << i).cast("long")
            ).otherwise(zero)
        band_structs.append(
            F.struct(F.lit(b).alias("band"), bucket.alias("bucket"))
        )
    return qdf.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 4,
    n_bands: int = 8,
    dim: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k with OR-amplified sign-random-projection LSH:
    n_bands independent md5-derived plane sets (md5_hyperplanes — fully
    deterministic and DuckDB-reproducible, so q24 carries a full value
    oracle); a corpus vector is a candidate for a
    query if they collide in ANY band (union of band buckets), then exact
    cosine re-ranks the candidates. Single-probe SRP loses recall as the
    corpus grows; banding restores it the same way the MinHash-LSH dedup
    does (candidate probability 1-(1-p^n_planes)^n_bands).

    Shuffle shape with broadcast_queries=True (the small-query-set regime):
    the banded query table (n_queries x n_bands rows, 3 narrow columns)
    broadcasts; the corpus's banded rows never shuffle before the bucket
    join. Only the deduped candidate id-pairs shuffle for the vector join +
    per-query top-k window. For query sets too large to broadcast (e.g. the
    self-join all-pairs ANN shape), pass broadcast_queries=False: both
    banded sides shuffle on (band, bucket) — uniform keys by construction of
    the random projections."""
    if dim is None:
        row = corpus.select(vec_col).first()
        if row is None:
            return _empty_topk(queries, corpus, query_id, corpus_id)
        dim = len(row[0])
    planes_per_band = [md5_hyperplanes(dim, n_planes, b) for b in range(n_bands)]
    q = queries.select(F.col(query_id), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("cv"))
    qb = _banded_buckets(q, query_id, "qv", planes_per_band)
    cb = _banded_buckets(c, corpus_id, "cv", planes_per_band)
    if broadcast_queries:
        qb = F.broadcast(qb)
    cands = (
        qb.join(cb, ["band", "bucket"])
        .select(query_id, corpus_id)
        .distinct()
    )
    qv = F.broadcast(q) if broadcast_queries else q
    scored = (
        cands.join(qv, query_id)
        .join(c, corpus_id)
        .select(query_id, corpus_id, cosine_expr(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path next to
    lsh_bucket_topk: partition the corpus into n_centroids Voronoi cells via
    a small distributed k-means, then compare each query only against its
    n_probe nearest cells.

    Shuffle shape at scale: the corpus is scanned map-side to assign cells
    (centroids are a broadcast literal — n_centroids x dim doubles), k-means
    iterations are one groupBy(cell) mean each, and the probe join is a
    cell-key equi-join feeding the exact re-rank. Centroid count is the
    recall/cost dial: cells ~ sqrt(N) at production scale.

    Deterministic: centroids init from the corpus rows with the smallest
    xxhash64(id, seed) (a seeded sample), Lloyd updates are means."""
    import math

    def _dot(a, b_lit):
        return dot_expr(F.col(a), F.array(*[F.lit(float(x)) for x in b_lit]))

    def _norm_lit(v):
        return math.sqrt(sum(x * x for x in v)) or 1.0

    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("cv"))
    # seeded deterministic init: n_centroids corpus vectors by hash order
    init_rows = (
        c.withColumn("h", F.xxhash64(F.col(corpus_id), F.lit(seed)))
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    if not init_rows:
        return _empty_topk(queries, corpus, query_id, corpus_id)
    centroids = [list(map(float, r["cv"])) for r in init_rows]

    def assign_expr(vec_alias, cents):
        # argmin squared-L2 == argmax (dot - |c|^2/2); struct array_max picks
        # the best (score, -cid) deterministically
        scored = [
            F.struct(
                (_dot(vec_alias, cv) - F.lit(_norm_lit(cv) ** 2 / 2.0)).alias("s"),
                F.lit(-i).alias("negcid"),
            )
            for i, cv in enumerate(cents)
        ]
        best = F.array_max(F.array(*scored))
        return (-best["negcid"]).cast("int")

    for _ in range(kmeans_iters):
        assigned = c.withColumn("cell", assign_expr("cv", centroids))
        means = (
            assigned.select("cell", F.posexplode("cv").alias("d", "v"))
            .groupBy("cell", "d")
            .agg(F.avg("v").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("d"), F.col("m")))),
                    lambda s: s["m"],
                ).alias("mv"),
            )
            .collect()
        )
        new_cents = list(centroids)
        for r in means:
            new_cents[r["cell"]] = [float(x) for x in r["mv"]]
        centroids = new_cents

    corpus_cells = c.withColumn("cell", assign_expr("cv", centroids))

    q = queries.select(F.col(query_id), F.col(vec_col).alias("qv"))
    # top-n_probe cells per query: explode per-centroid scores, window
    probe_scores = [
        F.struct(
            (_dot("qv", cv) / F.lit(_norm_lit(cv))).alias("s"),
            F.lit(i).alias("cell"),
        )
        for i, cv in enumerate(centroids)
    ]
    q_cells = q.select(
        query_id, "qv",
        F.explode(
            F.slice(F.reverse(F.array_sort(F.array(*probe_scores))), 1, n_probe)
        ).alias("pc"),
    ).select(query_id, "qv", F.col("pc.cell").alias("cell"))

    scored = (
        F.broadcast(q_cells)
        .join(corpus_cells, "cell")
        .select(query_id, corpus_id, cosine_expr(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
    )
