"""Similarity search: brute-force cosine top-k + LSH-bucketed variant."""

import math

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.similarity import (
    brute_force_topk,
    cosine_expr,
    lsh_bucket_topk,
)


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb) if na and nb else 0.0


def test_cosine_expr_matches_python(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    rows = emb.collect()
    a = rows[0]["embedding"]
    df = spark.createDataFrame(
        [(list(map(float, a)), list(map(float, r["embedding"]))) for r in rows],
        "va array<double>, vb array<double>",
    )
    got = [r[0] for r in df.select(cosine_expr(F.col("va"), F.col("vb"))).collect()]
    want = [_cos(a, r["embedding"]) for r in rows]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-6)


def test_brute_force_topk_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    got = brute_force_topk(queries, corpus, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["nn_rank"], r["c_id"], r["cos"]))
    all_rows = emb.collect()
    vecs = {r["vec_id"]: r["embedding"] for r in all_rows}
    for q in (0, 1, 2):
        want = sorted(
            ((c, _cos(vecs[q], v)) for c, v in vecs.items()),
            key=lambda t: (-t[1], t[0]),
        )[:5]
        got_ids = [c for _, c, _ in sorted(by_q[q])]
        assert got_ids == [c for c, _ in want]
        # self is always rank 1 with cos ~1
        assert got_ids[0] == q


def test_lsh_banded_recall(spark, sf_dir):
    """OR-amplified banding (24 bands x 4 planes) must reach recall >= 0.9 vs
    exact brute force — the VERDICT r1 bar for the ANN scale path (measured:
    0.99 at sf0.001, 0.98 at sf0.01; 8 bands was 0.73)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    exact = brute_force_topk(queries, corpus, k=5)
    approx = lsh_bucket_topk(queries, corpus, k=5, n_planes=4, n_bands=24)
    e = {(r["q_id"], r["c_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"banded LSH recall {recall:.3f} < 0.9"
    # every query finds itself (same bucket in every band by construction)
    assert all((q, q) in a for q in range(20))


def test_lsh_single_band_still_works(spark, sf_dir):
    """n_bands=1 degenerates to single-probe SRP (the old behavior)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    a = {
        (r["q_id"], r["c_id"])
        for r in lsh_bucket_topk(queries, corpus, k=5, n_planes=4, n_bands=1).collect()
    }
    assert all((q, q) in a for q in range(5))


def test_ivf_recall_clustered(spark):
    """IVF on its actual use case — clusterable embeddings (10 tight
    clusters): recall vs brute force >= 0.9 probing only 4 of 16 cells.
    (The driver's synthetic embeddings are near-uniform random — max
    pairwise cosine ~0.5, IVF's worst case by construction — so the
    clustered corpus is the meaningful recall fixture; the uniform one
    gets a looser sanity bound below.)"""
    import numpy as np

    from pathhier_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(42)
    centers = rng.randn(10, 64) * 3.0
    rows = []
    for i in range(500):
        v = centers[i % 10] + rng.randn(64) * 0.3
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    exact = {(r["q_id"], r["c_id"]) for r in brute_force_topk(queries, corpus, k=5).collect()}
    approx = ivf_topk(queries, corpus, k=5, n_centroids=16, n_probe=4)
    a = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    recall = len(exact & a) / len(exact)
    assert recall >= 0.9, f"IVF recall on clustered data {recall:.3f} < 0.9"
    assert all((q, q) in a for q in range(20))
    # deterministic across runs
    a2 = {
        (r["q_id"], r["c_id"])
        for r in ivf_topk(queries, corpus, k=5, n_centroids=16, n_probe=4).collect()
    }
    assert a2 == a


def test_ivf_uniform_sanity(spark, sf_dir):
    """On the near-uniform driver embeddings, IVF with probe=half-the-cells
    still finds a usable share of true neighbors and always finds self."""
    from pathhier_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    exact = {(r["q_id"], r["c_id"]) for r in brute_force_topk(queries, corpus, k=5).collect()}
    a = {
        (r["q_id"], r["c_id"])
        for r in ivf_topk(queries, corpus, k=5, n_centroids=16, n_probe=8).collect()
    }
    recall = len(exact & a) / len(exact)
    assert recall >= 0.6, f"IVF uniform-data recall {recall:.3f} < 0.6"
    assert all((q, q) in a for q in range(20))


def test_ivf_literal_vs_broadcast_identical(spark):
    """The two cell-assignment regimes — inline centroid literals (small
    models) and the one-broadcast-row array<array<bigint>> crossJoin (large
    models, where a 4096x768 literal plan would be ~3M expression nodes) —
    must produce identical output. 256 centroids forces real multi-cell
    structure; literal_plan_limit=0 forces the broadcast path."""
    import numpy as np

    from pathhier_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(600)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), "embedding")
    kw = dict(k=5, n_centroids=256, n_probe=16)
    lit = sorted(
        map(tuple, ivf_topk(queries, corpus, literal_plan_limit=10**9, **kw).collect())
    )
    bc = sorted(
        map(tuple, ivf_topk(queries, corpus, literal_plan_limit=0, **kw).collect())
    )
    assert lit == bc and len(lit) > 0


def test_semantic_dedup_keeps_one_farthest_per_near_dup_group(spark):
    """Clustered corpus at the production threshold 0.95: each group of
    near-identical vectors must collapse to exactly ONE survivor, and the
    survivor is the member FARTHEST from its centroid (the SemDeDup keep
    policy), with ties broken to the smaller id."""
    import hashlib

    from pathhier_spark.operators.similarity import semantic_dedup

    def h(s, lo=-1000, hi=1000):
        return lo + int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % (
            hi - lo + 1
        )

    dim, groups, members = 16, 6, 4
    rows = []
    for g in range(groups):
        base = [h(f"base:{g}:{i}") / 1000.0 for i in range(dim)]
        for m in range(members):
            # tiny deterministic perturbation: cos(member, base) ~ 1
            vec = [
                x + h(f"eps:{g}:{m}:{i}", -5, 5) / 10000.0
                for i, x in enumerate(base)
            ]
            rows.append((g * 100 + m, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, id_col="vec_id", threshold=0.95, n_centroids=4, kmeans_iters=2
    ).collect()
    assert len(out) == groups * members
    by_id = {r["vec_id"]: r for r in out}
    for g in range(groups):
        grp = [by_id[g * 100 + m] for m in range(members)]
        kept = [r for r in grp if not r["is_dropped"]]
        assert len(kept) == 1, f"group {g}: {grp}"
        # survivor out-ranks every dropped member: larger centroid distance,
        # ties to the smaller id
        k = kept[0]
        for r in grp:
            if r["vec_id"] != k["vec_id"]:
                assert (k["cdist_fp"], -k["vec_id"]) > (
                    r["cdist_fp"],
                    -r["vec_id"],
                )


def test_semantic_dedup_empty_corpus(spark):
    from pathhier_spark.operators.similarity import semantic_dedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semantic_dedup(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "cell", "cdist_fp", "is_dropped",
    ]


# --- embedding dimension health profile (q154, round 5) ---

def test_embedding_profile_hand_case(spark, tmp_path):
    from pathhier_spark.queries import q154_embedding_profile

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.5, 0.0]),
            (2, [1.0, -0.5, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    p = str(tmp_path / "embeddings.parquet")
    emb.write.parquet(p)
    # q154 reads <sf_dir>/embeddings.parquet
    rows = q154_embedding_profile(spark, str(tmp_path)).collect()
    got = {r["dim"]: (r["mean_v"], r["var_v"], r["min_q"], r["max_q"])
           for r in rows}
    # dim 0: constant 1.0 -> collapsed (var 0)
    assert got[0] == (1.0, 0.0, 1000000, 1000000)
    # dim 1: +-0.5 -> mean 0, var 0.25
    assert got[1] == (0.0, 0.25, -500000, 500000)
    # dim 2: all zero
    assert got[2] == (0.0, 0.0, 0, 0)


def test_label_medoids_hand_computed(spark):
    from pathhier_spark.operators.similarity import label_medoids

    rows = [
        # label 1 on a line: 0, 1, 10 -> middle point (id 2) minimizes
        # summed squared distance (82 vs 101 vs 181) at quant scale 1e6
        (1, 1, [0.0, 0.0]), (2, 1, [1.0, 0.0]), (3, 1, [10.0, 0.0]),
        # singleton label keeps its member with total 0
        (9, 2, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    got = {
        r["label"]: (r["medoid_id"], r["n_members"], r["total_sqdist"])
        for r in label_medoids(df).collect()
    }
    q = 1_000_000
    assert got[1] == (2, 3, (1 * q) ** 2 + (9 * q) ** 2)
    assert got[2] == (9, 1, 0)


def test_label_medoids_tie_breaks_low_id(spark):
    from pathhier_spark.operators.similarity import label_medoids

    df = spark.createDataFrame(
        [(7, 1, [0.0]), (3, 1, [2.0]), (5, 1, [1.0])],
        "vec_id long, label int, embedding array<float>",
    )
    # symmetric pair 0.0/2.0 around 1.0: medoid is the middle (id 5)
    out = label_medoids(df).collect()
    assert out[0]["medoid_id"] == 5


def test_dbscan_2d_roles_and_min_label(spark):
    from pathhier_spark.operators.similarity import dbscan_2d

    # eps = 0.02 (20000 quantized), minPts = 4.
    # ids 1-5: tight clique -> all core, one cluster labeled min id 1.
    # id 6 at (0.0215, 0): within eps of ONLY core id 5 (0.002, 0)
    #   (self + 1 neighbor = 2 < 4) -> border, inherits cluster 1 —
    #   and sits in the NEXT grid cell, exercising the 3x3 probe.
    # id 7 far away -> noise.
    rows = [
        (1, [0.0, 0.0]), (2, [0.001, 0.0]), (3, [0.0, 0.001]),
        (4, [0.001, 0.001]), (5, [0.002, 0.0]),
        (6, [0.0215, 0.0]),
        (7, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["role"], r["cluster"])
        for r in dbscan_2d(df, eps_q=20_000, min_pts=4).collect()
    }
    for i in (1, 2, 3, 4, 5):
        assert got[i] == ("core", 1), (i, got[i])
    assert got[6] == ("border", 1)
    assert got[7] == ("noise", None)


def test_hard_negatives_geometry_and_null_report(spark):
    from pathhier_spark.operators.similarity import hard_negatives

    rows = [
        # label 1 cluster near origin; label 2 point at x=1; far label 2
        (1, 1, [0.0, 0.0]), (2, 1, [0.1, 0.0]),
        (3, 2, [1.0, 0.0]), (4, 2, [5.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    got = {
        r["vec_id"]: (r["neg_id"], r["neg_label"])
        for r in hard_negatives(df).collect()
    }
    assert got[1] == (3, 2)   # nearest wrong-label, not the far one
    assert got[2] == (3, 2)
    assert got[3] == (2, 1)   # symmetric direction picks the closer anchor
    assert got[4] == (2, 1)   # 4's nearest wrong-label is 2 (4.9 < 5.0)
