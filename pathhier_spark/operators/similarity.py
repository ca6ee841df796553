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


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine with PRECOMPUTED per-vector norms — bit-identical to
    cosine_expr (the norm fold and the na*nb multiply are the same
    expressions, just evaluated on the vector table instead of the pair
    table), but each vector's norm fold runs ONCE instead of once per
    candidate pair: at k pairs per vector this removes 2/3 of the fold
    work in every pairwise verification (measured 3x on q52's verify)."""
    denom = na * nb
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
    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("_qn"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("_cn"),
    )
    scored = q.crossJoin(c).select(
        query_id,
        corpus_id,
        cosine_from_norms(
            F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")
        ).alias("cos"),
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
    md5_hyperplanes). Single quantization of the vector column. All-integer
    dots: bit-exact, JVM-side.

    The planes ride in as ONE broadcast row of array<array<array<bigint>>>
    crossJoined onto the vectors, with the per-band/per-plane structure
    unrolled by indexed higher-order functions — the same regime ivf_topk
    uses past its literal-plan limit. Inlining the coefficients as column
    literals instead (the original form) costs n_bands x n_planes x dim
    expression nodes: at the default 8x4x64 that was ~2k literal exprs and
    ~5 s of pure plan-construction time per call, dwarfing the actual
    execution on small inputs and bloating the plan at any size. Values
    are identical either way (bucket = sum of 2^i over non-negative plane
    dots), so the q24/q52 oracles pin the equivalence."""
    spark = df.sparkSession
    # the shared pow2 weight array assumes a UNIFORM plane count per band;
    # a ragged spec would silently read past it (element_at -> NULL bucket,
    # whose candidate pairs vanish from the equi-join) — refuse instead
    if len({len(band) for band in planes_per_band}) > 1:
        raise ValueError(
            "planes_per_band must have the same plane count in every band"
        )
    planes_nested = [
        [[int(x) for x in plane] for plane in band] for band in planes_per_band
    ]
    planes_df = spark.createDataFrame(
        [(planes_nested,)], "_planes array<array<array<bigint>>>"
    )
    zero = F.lit(0).cast("long")
    n_planes = len(planes_per_band[0]) if planes_per_band else 0
    # bit weights as a tiny literal array so the bucket fold needs no
    # column-valued shift amount (F.shiftleft takes only a Python int)
    pow2 = F.array(*[F.lit(1 << i).cast("long") for i in range(n_planes)])
    qdf = df.withColumn("_qv", _quantized(F.col(vec_col))).crossJoin(
        F.broadcast(planes_df)
    )

    def dot(plane):
        return F.aggregate(
            F.zip_with(F.col("_qv"), plane, lambda x, y: x * y),
            zero,
            lambda acc, x: acc + x,
        )

    bands = F.transform(
        F.col("_planes"),
        lambda band_planes, b: F.struct(
            b.cast("int").alias("band"),
            F.aggregate(
                F.transform(
                    band_planes,
                    lambda plane, i: F.when(
                        dot(plane) >= 0, F.element_at(pow2, i + 1)
                    ).otherwise(zero),
                ),
                zero,
                lambda acc, x: acc + x,
            ).alias("bucket"),
        ),
    )
    return qdf.select(
        F.col(id_col), F.explode(bands).alias("bb")
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
    qn = q.withColumn("_qn", norm_expr(F.col("qv")))
    cn = c.withColumn("_cn", norm_expr(F.col("cv")))
    qv = F.broadcast(qn) if broadcast_queries else qn
    scored = (
        cands.join(qv, query_id)
        .join(cn, corpus_id)
        .select(
            query_id,
            corpus_id,
            cosine_from_norms(
                F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
    )


def _sqdist_l2(vec, cent):
    """All-integer squared L2 over quantized vectors — see ivf_topk's
    magnitude bound (|x| <= ~30 at 768 dims keeps the sum under 2^63)."""
    return F.aggregate(
        F.zip_with(vec, cent, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _fit_kmeans(c, id_col, n_centroids, kmeans_iters, literal_plan_limit):
    """Shared deterministic k-means used by ivf_topk and semantic_dedup.
    `c` must carry `_qv` (int64-quantized vectors). Init = the n_centroids
    rows with the smallest md5('ivf:' || id) (engine-portable); Lloyd
    updates are floor(sum/count) per dimension, so centroids stay integral
    and cell assignment is an all-integer argmin (no float boundary flips).
    Returns (centroids, nearest_cells) where nearest_cells(df, qcol, cents,
    n_keep, out_cols) appends the n_keep L2-nearest `cell` ids (ties ->
    lowest cell id) map-side — inline literals for small models, one
    broadcast array row past literal_plan_limit expression nodes. Returns
    None on an empty corpus."""
    spark = c.sparkSession
    init_rows = (
        c.select(
            id_col,
            "_qv",
            F.md5(
                F.concat(F.lit("ivf:"), F.col(id_col).cast("string"))
            ).alias("_h"),
        )
        .orderBy("_h", id_col)
        .limit(n_centroids)
        .collect()
    )
    if not init_rows:
        return None
    centroids = [[int(x) for x in r["_qv"]] for r in init_rows]
    dim = len(centroids[0])
    use_literal = len(centroids) * dim <= literal_plan_limit

    def nearest_cells(df, qcol, cents, n_keep, out_cols):
        if use_literal:
            arr = F.array(
                *[
                    F.struct(
                        _sqdist_l2(
                            F.col(qcol),
                            F.array(*[F.lit(int(x)).cast("long") for x in cv]),
                        ).alias("d"),
                        F.lit(i).cast("int").alias("cell"),
                    )
                    for i, cv in enumerate(cents)
                ]
            )
            src = df
        else:
            cents_df = spark.createDataFrame(
                [(cents,)], "cents array<array<bigint>>"
            )
            src = df.crossJoin(F.broadcast(cents_df))
            arr = F.transform(
                F.col("cents"),
                lambda cv, i: F.struct(
                    _sqdist_l2(F.col(qcol), cv).alias("d"),
                    i.cast("int").alias("cell"),
                ),
            )
        picked = F.slice(F.array_sort(arr), 1, n_keep)
        return src.select(*out_cols, F.explode(picked).alias("_pc")).select(
            *out_cols, F.col("_pc.cell").alias("cell")
        )

    for _ in range(kmeans_iters):
        assigned = nearest_cells(c, "_qv", centroids, 1, ["_qv"])
        means = (
            assigned.select("cell", F.posexplode("_qv").alias("d", "v"))
            .groupBy("cell", "d")
            .agg(F.floor(F.sum("v") / F.count("v")).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("d"), F.col("m")))),
                    lambda s: s["m"],
                ).alias("mv"),
            )
            .collect()
        )
        new_cents = list(centroids)  # cells that lost all points keep theirs
        for r in means:
            new_cents[r["cell"]] = [int(x) for x in r["mv"]]
        centroids = new_cents

    return centroids, nearest_cells


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
    literal_plan_limit: int = 256,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path next to
    lsh_bucket_topk: partition the corpus into n_centroids Voronoi cells via
    a small distributed k-means, then compare each query only against its
    n_probe nearest cells (L2-nearest, the standard IVF probe metric).

    Engine-portable by construction (q36's full DuckDB value oracle): init
    centroids are the n_centroids corpus vectors with the smallest
    md5('ivf:' || id) (deterministic, reproducible in any engine with md5);
    vectors quantize to int64 (floor(x*1e6), same trick as the q24 LSH
    planes), so cell assignment = argmin of an all-integer squared-L2 — no
    float summation-order flips at Voronoi boundaries — and Lloyd updates
    are floor(sum/count) per dimension, which keeps centroids integral.
    Input-magnitude bound (int64): the squared-L2 sums (2*|x|*1e6)^2 over
    dims, so sum_dims((2*|x|*1e6)^2) must stay < 2^63 — i.e.
    |x| <= sqrt(2^63 / dims) / 2e6, ~= 38 at 768 dims, ~= 30 with margin
    (NOT ~1e3: a single squared-diff term at |x|=1e3 is already 4e18 and
    Spark would wrap silently while the DuckDB oracle raises). Unit-norm
    or bounded-feature embeddings (the intended domain, |x| <= 1) sit
    ~30x under the bound; rescale larger inputs before calling. Lloyd's
    per-cell per-dim component sums are the looser constraint
    (rows_per_cell * |x| * 1e6 < 2^63). The final re-rank is exact double
    cosine on the ORIGINAL vectors, identical to brute_force_topk.

    Shuffle shape at scale: corpus cell-assignment is map-side — centroids
    ride either inline literals (tiny models) or ONE broadcast row carrying
    array<array<bigint>> crossJoined in; n_centroids*dim >
    literal_plan_limit switches automatically — identical output, asserted
    in tests. The default limit is 256 expression nodes: measured at 16
    centroids x 64 dims (1024 nodes), plan construction + codegen of the
    literal form already cost ~3x the broadcast form's total runtime — the
    literal path only wins for genuinely tiny models. K-means iterations are one
    groupBy(cell, dim) partial-agg each; the probe join is a cell equi-join
    feeding the exact re-rank. Centroid count is the recall/cost dial:
    cells ~ sqrt(N) at production scale."""
    c = (
        corpus.select(F.col(corpus_id), F.col(vec_col).alias("cv"))
        .withColumn("_qv", _quantized(F.col("cv")))
    )
    fitted = _fit_kmeans(
        c, corpus_id, n_centroids, kmeans_iters, literal_plan_limit
    )
    if fitted is None:
        return _empty_topk(queries, corpus, query_id, corpus_id)
    centroids, nearest_cells = fitted

    corpus_cells = nearest_cells(c, "_qv", centroids, 1, [corpus_id, "cv"])

    q = (
        queries.select(F.col(query_id), F.col(vec_col).alias("qv"))
        .withColumn("_qq", _quantized(F.col("qv")))
    )
    q_cells = nearest_cells(q, "_qq", centroids, n_probe, [query_id, "qv"])

    scored = (
        F.broadcast(q_cells.withColumn("_qn", norm_expr(F.col("qv"))))
        .join(corpus_cells.withColumn("_cn", norm_expr(F.col("cv"))), "cell")
        .select(
            query_id,
            corpus_id,
            cosine_from_norms(
                F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
    )


def semantic_dedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 16,
    kmeans_iters: int = 2,
    literal_plan_limit: int = 256,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication over an
    embedding column — cluster the corpus with k-means, then inside each
    cluster drop every member that is cosine-near (>= threshold) a kept
    member, keeping, per the paper, the example FARTHEST from its cluster
    centroid (most marginal = most informative). The pairwise-transitive
    greedy of the paper is replaced by its deterministic one-pass
    equivalent: x is dropped iff SOME same-cell y with cos(x,y) >=
    threshold out-ranks it (larger centroid distance; ties -> smaller id)
    — an EXISTS semi-join, no iteration, same keep-the-farthest policy.

    Output: (id, cell, cdist_fp, is_dropped) for every corpus row, where
    cdist_fp is the all-integer quantized squared-L2 to the row's centroid
    (the ranking key — engine-exact, no float argmin flips).

    Scale shape: clustering is the shared _fit_kmeans (map-side assignment,
    one combiner agg per Lloyd round); the quadratic pairwise stays INSIDE
    a cell, so with cells ~ sqrt(N) (the paper's regime) total compare work
    is ~N^1.5 spread evenly across cells — never a corpus-wide cross join.
    The exists-check is a cell-local self-join, shuffle keyed by cell; the
    exact cosine uses the same left-to-right fold both engines replay."""
    c = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("cv"))
        .withColumn("_qv", _quantized(F.col("cv")))
    )
    fitted = _fit_kmeans(
        c, id_col, n_centroids, kmeans_iters, literal_plan_limit
    )
    if fitted is None:
        # empty-corpus schema keeps the id column's REAL type (string ids
        # would otherwise come back long and break downstream unions)
        id_type = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [],
            f"{id_col} {id_type}, cell int, cdist_fp long, is_dropped boolean",
        )
    centroids, nearest_cells = fitted
    assigned = nearest_cells(c, "_qv", centroids, 1, [id_col, "cv", "_qv"])
    cents_df = corpus.sparkSession.createDataFrame(
        [(i, cv) for i, cv in enumerate(centroids)],
        "cell int, cvec array<bigint>",
    )
    # materialize the assignment ONCE: `ranked` feeds both self-join sides
    # and the final join-back, and its plan (map-side argmin over
    # n_centroids literal distance expressions) is expensive to recompute —
    # the same eager-localCheckpoint move as the CC/PageRank loops
    ranked = (
        assigned.join(F.broadcast(cents_df), "cell")
        .select(
            "cell",
            F.col(id_col),
            "cv",
            _sqdist_l2(F.col("_qv"), F.col("cvec")).alias("cdist_fp"),
            # per-vector norm computed ONCE here (inside the checkpoint),
            # so the cell-local pairwise check below never re-folds it
            norm_expr(F.col("cv")).alias("_cn"),
        )
        .localCheckpoint(eager=True)
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (
                (F.col("b.cdist_fp") > F.col("a.cdist_fp"))
                | (
                    (F.col("b.cdist_fp") == F.col("a.cdist_fp"))
                    & (F.col("b." + id_col) < F.col("a." + id_col))
                )
            )
            & (
                cosine_from_norms(
                    F.col("a.cv"),
                    F.col("b.cv"),
                    F.col("a._cn"),
                    F.col("b._cn"),
                )
                >= F.lit(threshold)
            ),
            "left_semi",
        )
        .select(F.col("a." + id_col).alias("_dropped_id"))
    )
    return (
        ranked.join(
            dropped,
            ranked[id_col] == dropped["_dropped_id"],
            "left_outer",
        )
        .select(
            F.col(id_col),
            "cell",
            "cdist_fp",
            F.col("_dropped_id").isNotNull().alias("is_dropped"),
        )
    )


def label_medoids(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Exact 1-medoid per label — the cluster EXEMPLAR, not the centroid
    (q13): the member minimizing the sum of squared L2 distances to its
    label-mates, i.e. an actual document you can show, dedup against, or
    ship as the canonical representative (keep_best picks by external
    quality; the medoid is the geometrically central choice).

    Exactness: vectors are int64-quantized (floor(x·1e6), the
    similarity-module convention) and every pairwise distance is the
    all-integer _sqdist_l2 fold — no float ever aggregates, so the
    argmin is engine-portable. Ties break on the lower id. Overflow
    bound: total_sqdist ≤ members·dims·(2·|x|·1e6)² must stay < 2^63 —
    at unit-norm 64-dim vectors that is ~36k members per label; larger
    clusters need a coarser quantization scale or per-label sampling.

    Scale shape: the pairwise join is equi ON LABEL — per-label work is
    quadratic in that label's member count, the honest cost of an exact
    medoid; for web-scale clusters run it per near-dup component (small
    by construction) or downsample per label first. The argmin window
    partitions BY LABEL, never SinglePartition. Singleton labels keep
    their only member with total_sqdist 0.
    Output: (label, medoid_id, n_members, total_sqdist)."""
    base = df.where(
        F.col(id_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(vec_col).isNotNull()
    ).select(
        F.col(label_col).alias("l"),
        F.col(id_col).alias("i"),
        _quantized(F.col(vec_col)).alias("_qv"),
    )
    a, b = base.alias("a"), base.alias("b")
    sums = (
        a.join(
            b,
            (F.col("a.l") == F.col("b.l")) & (F.col("a.i") != F.col("b.i")),
        )
        .select(
            F.col("a.l").alias("l"),
            F.col("a.i").alias("i"),
            _sqdist_l2(F.col("a._qv"), F.col("b._qv")).alias("d"),
        )
        .groupBy("l", "i")
        .agg(F.sum("d").cast("long").alias("total"))
    )
    scored = base.select("l", "i").join(sums, ["l", "i"], "left").select(
        "l", "i", F.coalesce(F.col("total"), F.lit(0)).cast("long").alias("total")
    )
    w = Window.partitionBy("l").orderBy("total", "i")
    members = base.groupBy("l").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .join(members, "l")
        .select(
            F.col("l").alias(label_col),
            F.col("i").alias("medoid_id"),
            "n_members",
            F.col("total").alias("total_sqdist"),
        )
    )


def dbscan_2d(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps_q: int = 20_000,
    min_pts: int = 4,
) -> DataFrame:
    """Exact DBSCAN over the first two embedding dimensions — DENSITY
    clustering, the shape k-means/IVF (q36) and threshold near-dup CC
    (q31) cannot find: clusters of arbitrary shape separated by sparse
    regions, with an explicit noise class. Coordinates are int64-
    quantized (floor(x·1e6)); eps is `eps_q` quantized units, so every
    distance test (dx²+dy² ≤ eps_q²) is exact integer arithmetic.

    The radius search is a GRID-BUCKETED spatial join — the new plan
    shape here: cell side = eps, so any in-range partner lies in the
    3×3 cell neighborhood; one side explodes its 9 probe cells and the
    join is pure equi on (cx, cy) with the exact integer distance as a
    post-filter (the q48 bin-bucketing argument in 2-D). Per-cell work
    is bounded by local point density — never all-pairs.

    DBSCAN roles, determinism-hardened: core = |N_eps| ≥ min_pts
    (self included, standard); clusters = connected components over
    core-core in-range edges (reusing canonicalize.connected_components
    on zero-padded ids so the min-label is numeric order); border
    points join the MINIMUM-labeled core neighbor's cluster (textbook
    DBSCAN is first-found order-dependent — min-label is the
    deterministic refinement, documented divergence); the rest is
    noise. Output: (id, role, cluster) with cluster NULL for noise."""
    from pathhier_spark.operators.canonicalize import connected_components

    pts = df.where(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("i"),
        F.floor(F.element_at(F.col(vec_col), 1).cast("double") * 1e6)
        .cast("long")
        .alias("qx"),
        F.floor(F.element_at(F.col(vec_col), 2).cast("double") * 1e6)
        .cast("long")
        .alias("qy"),
    )
    cell = lambda c: F.floor(c / F.lit(int(eps_q))).cast("long")  # noqa: E731
    base = pts.select(
        "i", "qx", "qy", cell(F.col("qx")).alias("cx"), cell(F.col("qy")).alias("cy")
    ).localCheckpoint(eager=False)
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = base.select(
        F.col("i").alias("ai"),
        F.col("qx").alias("ax"),
        F.col("qy").alias("ay"),
        F.explode(offs).alias("o"),
        "cx",
        "cy",
    ).select(
        "ai",
        "ax",
        "ay",
        (F.col("cx") + F.col("o.dx")).alias("pcx"),
        (F.col("cy") + F.col("o.dy")).alias("pcy"),
    )
    near = (
        probe.join(
            base.select(
                F.col("i").alias("bi"),
                F.col("qx").alias("bx"),
                F.col("qy").alias("by"),
                F.col("cx").alias("bcx"),
                F.col("cy").alias("bcy"),
            ),
            (F.col("pcx") == F.col("bcx")) & (F.col("pcy") == F.col("bcy")),
        )
        .where(
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            <= F.lit(int(eps_q) * int(eps_q))
        )
        .select("ai", "bi")
        .localCheckpoint(eager=False)
    )
    counts = near.groupBy("ai").agg(F.count(F.lit(1)).alias("nb"))
    core = counts.where(F.col("nb") >= min_pts).select(
        F.col("ai").alias("i")
    ).localCheckpoint(eager=False)
    # CC runs directly on the int64 ids: the star operators are
    # type-generic and the min-label over longs equals the min over the
    # zero-padded strings previously used — narrower shuffle keys, no
    # lpad/cast passes
    core_edges = (
        near.join(core.select(F.col("i").alias("ai")), "ai")
        .join(core.select(F.col("i").alias("bi")), "bi")
        .select(F.col("ai").alias("pa"), F.col("bi").alias("pb"))
    )
    comp = connected_components(
        core_edges.union(
            core.select(F.col("i").alias("pa"), F.col("i").alias("pb"))
        ),
        a="pa",
        b="pb",
    ).select(
        F.col("node").alias("i"),
        F.col("component").alias("cluster"),
    )
    core_out = comp.join(core, "i").select(
        "i", F.lit("core").alias("role"), "cluster"
    )
    noncore = pts.select("i").join(core, "i", "left_anti")
    border = (
        noncore.join(near.select(F.col("ai").alias("i"), "bi"), "i")
        .join(comp.select(F.col("i").alias("bi"), "cluster"), "bi")
        .groupBy("i")
        .agg(F.min("cluster").alias("cluster"))
        .select("i", F.lit("border").alias("role"), "cluster")
    )
    noise = (
        noncore.join(border.select("i"), "i", "left_anti")
        .select("i", F.lit("noise").alias("role"), F.lit(None).cast("long").alias("cluster"))
    )
    return core_out.union(border).union(noise).withColumnRenamed("i", id_col)


def hard_negatives(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining — for every labeled vector, the NEAREST
    vector of a DIFFERENT label: the contrastive/metric-learning
    training signal q122's hash-corruption negatives cannot give
    (random negatives are easy; the nearest wrong-label point is the
    one the model actually confuses), and the per-anchor dual of the
    label medoid (q203: most central same-label; this: closest
    other-label).

    Exactness: quantized int64 squared L2 (_sqdist_l2 — the q203
    bound applies) with the argmin on (distance, id) — fully integer,
    engine-portable. The pairwise cross-label join is the honest
    exact form, quadratic in corpus size — at web scale run it
    blocked per LSH/IVF cell (q24/q36 machinery) exactly as the
    near-dup family does, keeping this as the in-cell verifier.
    Anchors with no other-label point (single-label corpus) are
    REPORTED with NULLs. Output: (id, label, neg_id, neg_label,
    sqdist)."""
    base = df.where(
        F.col(id_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("i"),
        F.col(label_col).alias("l"),
        _quantized(F.col(vec_col)).alias("_qv"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(b, F.col("a.l") != F.col("b.l")).select(
        F.col("a.i").alias("i"),
        F.col("a.l").alias("l"),
        F.col("b.i").alias("ni"),
        F.col("b.l").alias("nl"),
        _sqdist_l2(F.col("a._qv"), F.col("b._qv")).alias("d"),
    )
    w = Window.partitionBy("i").orderBy("d", "ni")
    best = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("i", "ni", "nl", "d")
    )
    return base.select("i", "l").join(best, "i", "left").select(
        F.col("i").alias(id_col),
        F.col("l").alias(label_col),
        F.col("ni").alias("neg_id"),
        F.col("nl").alias("neg_label"),
        F.col("d").alias("sqdist"),
    )
