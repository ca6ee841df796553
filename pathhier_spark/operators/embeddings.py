"""BOW embedding averaging (M5) — pathhier/pathway_aligner.py:299-340.

Per entity: the mean over its alias tokens of a broadcast token->vector
table; OOV tokens get a deterministic pseudo-random vector in (-1, 1)
derived from a hash of (token) — the reference uses random.uniform (unseeded,
pathway_aligner.py:323-338); we seed per-token so runs are reproducible
(SURVEY.md §7.3 divergence note).

Implementation is a broadcast join + posexplode + per-dimension mean — all
JVM-side; the OOV vector is a column expression over md5 (engine-portable:
DuckDB recomputes the identical components for the oracle check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oov_vector(token_col, dim: int):
    """Deterministic pseudo-random vector in (-1,1): component i derives
    from the first 8 hex chars of md5(token:i) read as a 32-bit int. Pure
    column expression; only evaluated for the (small) OOV vocabulary."""
    comps = []
    for i in range(dim):
        h = F.conv(
            F.substring(F.md5(F.concat(token_col, F.lit(f":{i}"))), 1, 8), 16, 10
        ).cast("long")
        comps.append((h % 2_000_000) / 1_000_000.0 - 1.0)
    return F.array(*comps)


def entity_bow_embeddings(
    entity_tokens: DataFrame,
    token_vectors: DataFrame,
    *,
    id_col: str = "ent_id",
    tokens_col: str = "tokens",
    vec_col: str = "vector",
    dim: int | None = None,
) -> DataFrame:
    """entity_tokens(id, tokens ARRAY<STRING>); token_vectors(token,
    vector ARRAY<DOUBLE>) — broadcast. Output: (id, embedding ARRAY<DOUBLE>)
    = mean over tokens of vector-or-OOV."""
    if dim is None:
        dim = len(token_vectors.select(vec_col).first()[0])
    exploded = entity_tokens.select(
        F.col(id_col), F.explode(F.col(tokens_col)).alias("token")
    )
    joined = exploded.join(F.broadcast(token_vectors), "token", "left").select(
        id_col,
        F.coalesce(F.col(vec_col), oov_vector(F.col("token"), dim)).alias("v"),
    )
    per_dim = joined.select(
        id_col, F.posexplode("v").alias("dim", "val")
    ).groupBy(id_col, "dim").agg(F.avg("val").alias("m"))
    return (
        per_dim.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("m")))
                ),
                lambda s: s["m"],
            ).alias("embedding")
        )
    )


def jl_signs(out_dim: int, in_dim: int) -> list[list[int]]:
    """Achlioptas-style +-1 Johnson-Lindenstrauss sign matrix, every entry
    derived from md5('jl:<j>:<i>') — the engine-portable hex32 trick the
    SRP planes use (similarity.md5_hyperplanes), so the projection is
    exactly reproducible in DuckDB SQL. Rows are output dims."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[:8], 16) % 2
            == 0
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_project(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int,
    out_dim: int = 16,
) -> DataFrame:
    """Johnson-Lindenstrauss compression of an embedding column: project
    `in_dim`-dim float vectors onto `out_dim` deterministic +-1 sign rows
    (jl_signs) in EXACT integer arithmetic — quantize to int64
    (floor(x * 1e6), the q24 discipline), then each output component is an
    integer signed sum, bit-exact across engines, partitionings, and
    retries. JL guarantees pairwise distances/cosines survive within
    (1 +- eps) at out_dim = O(log n / eps^2); q101 measures the actual
    distortion rather than citing it.

    The compression stage a 10^12-scale ANN pipeline runs FIRST: shrink
    768-dim float32 vectors ~10-50x before LSH/IVF bucketing so every
    downstream shuffle (bucket join, centroid assign, verify) moves
    short integer arrays instead of wide floats. Map-only: the sign
    matrix rides in as one broadcast nested-array row (the IVF
    broadcast-centroid regime — never out_dim*in_dim inline literals);
    no shuffle, whole-stage codegen end to end.

    Overflow headroom: |component| <= in_dim * max|x| * 1e6 — at 768 dims
    that bounds |x| < ~12e3, far past any normalized embedding.
    Output: (id_col, proj: array<bigint> length out_dim)."""
    spark = df.sparkSession
    signs = jl_signs(out_dim, in_dim)
    mat = spark.createDataFrame(
        [(signs,)], "jl_mat: array<array<bigint>>"
    )
    q = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * 1_000_000)
    )
    proj = F.transform(
        F.col("jl_mat"),
        lambda row: F.aggregate(
            F.zip_with(F.col("_qv"), row, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return (
        df.crossJoin(F.broadcast(mat))
        .withColumn("_qv", q)
        .select(F.col(id_col), proj.alias("proj"))
    )
