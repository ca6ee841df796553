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
