"""Dedup family: exact, minhash+LSH, simhash, ngram-jaccard, cosine near-dup."""

import pytest
from pyspark.sql import functions as F

from pathhier_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tomorrow")),  # near dup of 0
        (3, "completely different content about spark query engines and joins"),
        (4, "another unrelated document mentioning databases and storage"),
        (5, base),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).orderBy("doc_id").collect()
    ids = [r["doc_id"] for r in out]
    assert ids == [0, 2, 3, 4]
    assert [r["dup_count"] for r in out if r["doc_id"] == 0] == [3]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = minhash_dedup(docs, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # all pairs among {0,1,5} (identical) plus near-dup 2 with each
    assert {(0, 1), (0, 5), (1, 5)} <= got
    assert (0, 2) in got or (1, 2) in got  # near-dup found by LSH
    assert not any(3 in p or 4 in p for p in got)


def test_minhash_signature_shape_and_determinism(spark, docs):
    s1 = minhash_signatures(docs, num_hashes=16)
    s2 = minhash_signatures(docs, num_hashes=16)
    r1 = {r["doc_id"]: r["sig"] for r in s1.collect()}
    r2 = {r["doc_id"]: r["sig"] for r in s2.collect()}
    assert r1 == r2
    assert all(len(v) == 16 for v in r1.values())
    assert r1[0] == r1[1] == r1[5]  # identical docs -> identical signatures


def test_ngram_jaccard_direct(spark, docs):
    pairs = spark.createDataFrame([(0, 1), (0, 3)], "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): r["jacc"]
        for r in ngram_jaccard_pairs(docs, pairs, threshold=0.0).collect()
    }
    assert out[(0, 1)] == pytest.approx(1.0)
    assert out[(0, 3)] == pytest.approx(0.0)


def test_simhash_similarity(spark, docs):
    out = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert out[0] == out[1] == out[5]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(out[0], out[2]) < hamming(out[0], out[3])


def test_embedding_neardup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),  # near dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(df).collect()}
    assert got == {(0, 1)}


def test_lsh_bucket_cap(spark):
    # 60 identical docs -> one giant bucket; cap drops it entirely
    rows = [(i, "same same same same text") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df, num_hashes=32)
    pairs = lsh_candidate_pairs(sigs, max_bucket_size=50)
    assert pairs.count() == 0


def test_segment_dedup_first_occurrence_wins(spark):
    """Cross-document segment dedup: a segment repeated across (and within)
    documents survives only at its first (doc_id, pos) occurrence; documents
    reassemble from surviving segments in order."""
    from pathhier_spark.operators.dedup import segment_dedup

    boiler = "a b c d"  # 4-token segment (seg_tokens=4)
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} unique one two three"),     # segs: boiler, 'unique one two three'
            (2, f"{boiler} other words here now"),     # boiler dropped
            (3, f"fresh text pad pad {boiler}"),       # boiler dropped (later doc)
            (4, f"{boiler} {boiler}"),                 # second copy within doc dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs, seg_tokens=4).collect()}
    assert out[1]["text_dedup"] == f"{boiler} unique one two three"
    assert out[1]["n_dropped"] == 0
    assert out[2]["text_dedup"] == "other words here now"
    assert out[2]["n_dropped"] == 1
    assert out[3]["text_dedup"] == "fresh text pad pad"
    assert out[4]["text_dedup"] == "" and out[4]["n_dropped"] == 2


def test_exact_dedup_physical_duplicate_rows(spark):
    """Physically duplicated (id, text) rows — e.g. a replayed ingest —
    still yield exactly ONE output row per content hash."""
    rows = [(1, "same text"), (1, "same text"), (2, "same text"), (3, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dedup(df).collect()
    assert len(out) == 2
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["dup_count"] == 3 and by_id[3]["dup_count"] == 1


def test_exact_dedup_null_ids_and_complex_types(spark):
    """All-NULL-id hash groups still emit their winner (NULL-safe join),
    mixed groups pick the min non-null id (matching SQL min), and
    unorderable column types (maps) pass through untouched."""
    rows = [
        (None, "ghost text", {"k": "a"}),
        (None, "ghost text", {"k": "a"}),
        (None, "mixed text", {"k": "b"}),
        (7, "mixed text", {"k": "c"}),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, meta map<string,string>"
    )
    out = {r["text"]: r for r in exact_dedup(df).collect()}
    assert out["ghost text"]["doc_id"] is None
    assert out["ghost text"]["dup_count"] == 2
    assert out["mixed text"]["doc_id"] == 7
    assert out["mixed text"]["dup_count"] == 2


def test_line_dedup_keep_first(spark):
    """C4 line dedup: byte-identical lines survive only at their first
    (doc_id, pos) corpus-wide occurrence — including intra-document
    repeats — and documents reassemble from surviving lines in order.
    Comparison is byte-exact (no lowercasing): 'Hot' != 'hot'."""
    from pathhier_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "hot line\nbody one\nhot line"),
            (2, "hot line\nbody two"),
            (3, "Hot Line\nbody three\nbody three"),
            (4, "only body"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert out[1]["text_dedup"] == "hot line\nbody one"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (2, 1)
    assert out[2]["text_dedup"] == "body two"
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 1)
    # case-sensitive: 'Hot Line' is distinct; intra-doc repeat dropped
    assert out[3]["text_dedup"] == "Hot Line\nbody three"
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (2, 1)
    assert out[4]["text_dedup"] == "only body"
    assert (out[4]["n_kept"], out[4]["n_dropped"]) == (1, 0)


def test_embedding_neardup_bucketed_matches_brute(spark):
    """VERDICT r4 #4: the by-name near-dup entry point needs a
    non-quadratic path. The bucketed (banded SRP-LSH) form must agree with
    the brute crossJoin form: precision is structurally 1.0 (exact cosine
    filters candidates), and at threshold 0.95 with the default 4x8
    banding the candidate probability at the boundary is >= 0.9998, so on
    a clustered corpus recall is 1.0 — asserted as set equality."""
    import math
    import random

    from pathhier_spark.operators.dedup import (
        embedding_neardup_bucketed,
        embedding_neardup_pairs,
    )

    rng = random.Random(7)
    dim = 16
    rows = []
    vid = 0
    for c in range(6):  # 6 cluster centers, 5 tight members each
        center = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in center))
        center = [x / n for x in center]
        for _ in range(5):
            v = [x + rng.gauss(0, 0.02) for x in center]
            rows.append((vid, v))
            vid += 1
    for _ in range(20):  # background noise vectors
        rows.append((vid, [rng.gauss(0, 1) for _ in range(dim)]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.95).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_bucketed(emb, threshold=0.95).collect()
    }
    assert len(brute) >= 30  # the clusters actually produced near-dups
    assert bucketed == brute  # precision AND recall 1.0 on this corpus


def test_embedding_neardup_bucketed_empty_input(spark):
    from pathhier_spark.operators.dedup import embedding_neardup_bucketed

    emb = spark.createDataFrame([], "vec_id int, embedding array<double>")
    out = embedding_neardup_bucketed(emb)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "cos"]


def test_embedding_neardup_bucketed_low_threshold_recall(spark, sf_dir):
    """The q52 gate runs at threshold 0.35 — a LOW-threshold regime where
    SRP banding separates poorly (boundary candidate probability ~0.71
    with the default 4x8 banding, vs >=0.9998 at the intended 0.95). Pin
    the honest contract on the real driver corpus: strict subset of the
    brute row set (precision 1.0) with measured recall ~0.74, bounded
    here at >= 0.65."""
    import os

    from pathhier_spark.operators.dedup import (
        embedding_neardup_bucketed,
        embedding_neardup_pairs,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.35).collect()
    }
    buck = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_bucketed(emb, threshold=0.35).collect()
    }
    assert buck <= brute  # precision exactly 1.0
    assert len(buck) / len(brute) >= 0.65  # measured 0.743 at sf0.001


# --- two-sided MinHash LSH cross-join (q125, round 5) ---

def test_minhash_cross_join_finds_mutations(spark):
    from pathhier_spark.operators.dedup import minhash_cross_join

    base = "the quick brown fox jumps over the lazy dog in the park today"
    left = spark.createDataFrame(
        [(1, base), (2, "completely unrelated words about other topics here now")],
        "doc_id long, text string",
    )
    right = spark.createDataFrame(
        [(101, base + " tonight"), (102, "nothing shared with any left text at all whatsoever")],
        "doc_id long, text string",
    )
    got = [tuple(r) for r in
           minhash_cross_join(left, right, threshold=0.3).collect()]
    assert len(got) == 1 and got[0][:2] == (1, 101)
    assert 0.5 < got[0][2] < 1.0


def test_minhash_cross_join_combined_bucket_cap(spark):
    from pathhier_spark.operators.dedup import minhash_cross_join

    # 30 identical docs per side: every bucket holds 60 > cap 50 ->
    # the boilerplate cluster is dropped ENTIRELY (the guard fires on the
    # combined left+right population, not per side)
    txt = "same boilerplate text repeated on both sides of the corpus pair"
    left = spark.createDataFrame(
        [(i, txt) for i in range(30)], "doc_id long, text string"
    )
    right = spark.createDataFrame(
        [(100 + i, txt) for i in range(30)], "doc_id long, text string"
    )
    assert minhash_cross_join(left, right).count() == 0
    # per-side population (30) would have passed a per-side cap — raise
    # the cap and the pairs flood back
    assert minhash_cross_join(left, right, max_bucket_size=60).count() == 900


# --- quality-argmax canonical selection (q131, round 5) ---

def test_keep_best_argmax_is_portable_two_phase(spark):
    """The q131 keep rule: per cluster, max quality then min doc_id among
    the maxers — verified on a hand case including a quality TIE."""
    from pyspark.sql import functions as F

    m = spark.createDataFrame(
        [(1, 10, 0.5), (1, 11, 0.9), (1, 12, 0.9),   # tie at 0.9 -> 11
         (2, 20, 0.3), (2, 21, 0.2)],
        "cluster long, doc_id long, quality_score double",
    )
    mx = m.groupBy("cluster").agg(
        F.max("quality_score").alias("kept_quality"),
        F.count(F.lit(1)).alias("n_members"),
    )
    kept = (
        m.join(mx, "cluster")
        .filter(F.col("quality_score") == F.col("kept_quality"))
        .groupBy("cluster", "kept_quality", "n_members")
        .agg(F.min("doc_id").alias("kept_doc_id"))
    )
    got = {r["cluster"]: (r["kept_doc_id"], r["kept_quality"], r["n_members"])
           for r in kept.collect()}
    assert got == {1: (11, 0.9, 3), 2: (20, 0.3, 2)}


# --- blocking-quality evaluation (q135, round 5) ---

def test_blocking_quality_hand_computed(spark):
    from pathhier_spark.operators.dedup import blocking_quality

    # 4 docs; blocking key = (len(toks)//8, first token) puts d1/d2
    # together ("a ..." 2 tokens -> "0|a") and d3/d4 together ("b ...")
    # -> cand = {(1,2),(3,4)}. gold = {(1,2),(1,3)} -> hit = {(1,2)}.
    # PC = 1/2; RR = 1 - 2/6 = 0.666667.
    docs = spark.createDataFrame(
        [(1, "a x"), (2, "a y"), (3, "b x"), (4, "b z")],
        "doc_id long, text string",
    )
    gold = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    r = blocking_quality(docs, gold).collect()[0]
    assert (r["n_docs"], r["n_gold"], r["n_cand"], r["n_hit"]) == (4, 2, 2, 1)
    assert r["pair_completeness"] == 0.5
    assert r["reduction_ratio"] == 0.666667


def test_blocking_quality_block_cap_and_empty_gold(spark):
    from pathhier_spark.operators.dedup import blocking_quality

    # 5 docs share one block; max_block_size=3 drops the whole block ->
    # 0 candidates, RR = 1. Empty gold -> PC NULL (no divide-by-zero).
    docs = spark.createDataFrame(
        [(i, "same text") for i in range(5)], "doc_id long, text string"
    )
    gold = spark.createDataFrame([], "id_a long, id_b long")
    r = blocking_quality(docs, gold, max_block_size=3).collect()[0]
    assert r["n_cand"] == 0 and r["n_hit"] == 0
    assert r["pair_completeness"] is None
    assert r["reduction_ratio"] == 1.0


# --- per-source template concentration (q143, round 5) ---

def test_template_concentration_hand_case(spark):
    from pathhier_spark.operators.dedup import template_concentration

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "sitea"),
            (2, "alpha beta gamma", "sitea"),
            (3, "totally different words here", "sitea"),
            (4, "lone page", "siteb"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: (
            r["n_docs"], r["n_shapes"], r["top_shape_docs"], r["template_fp"]
        )
        for r in template_concentration(docs).collect()
    }
    # sitea: docs 1+2 share a simhash shape, doc 3 is its own
    assert got["sitea"] == (3, 2, 2, 666666)
    # a single-doc source is trivially one shape at share 1.0
    assert got["siteb"] == (1, 1, 1, 1000000)


def test_template_concentration_all_identical(spark):
    from pathhier_spark.operators.dedup import template_concentration

    docs = spark.createDataFrame(
        [(i, "same text every page", "mirror") for i in range(5)],
        "doc_id long, text string, source string",
    )
    rows = template_concentration(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_shapes"], r["top_shape_docs"], r["template_fp"]) == (
        1, 5, 1000000,
    )
    assert r["template_share"] == 1.0


# --- MinHash sketch calibration (q152, round 5) ---

def test_minhash_calibration_identical_docs(spark):
    from pathhier_spark.operators.dedup import minhash_calibration

    # two identical docs: estimate = exact = 1.0 -> bucket 10, zero error
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    rows = minhash_calibration(docs, num_hashes=16).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["bucket"], r["n_pairs"]) == (10, 1)
    assert r["mean_est_fp"] == 1000000
    assert r["mean_jacc_fp"] == 1000000
    assert r["mean_abs_err_fp"] == 0


def test_minhash_calibration_partial_overlap_bounds(spark):
    from pathhier_spark.operators.dedup import minhash_calibration

    # overlapping docs: whatever decile the estimate lands in, the exact
    # micro-jaccard must be the true value and the error consistent
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f x y"),
        ],
        "doc_id long, text string",
    )
    rows = minhash_calibration(
        docs, num_hashes=16, shingle_k=3
    ).collect()
    if rows:  # pair surfaces only if some band collides
        r = rows[0]
        # shingles: 6 each, intersection 4 ('a b c','b c d','c d e','d e f')
        # union 8 -> exact 500000
        assert r["mean_jacc_fp"] == 500000
        assert (
            r["mean_abs_err_fp"]
            == abs(r["mean_est_fp"] - r["mean_jacc_fp"])
        )


def test_cdc_chunks_boundary_insensitive_to_insertion(spark):
    from pathhier_spark.operators.dedup import cdc_chunk_dedup

    # find a boundary token deterministically (md5 first hex in {0,8})
    import hashlib

    def is_b(t):
        return hashlib.md5(t.encode()).hexdigest()[0] in "08"

    vocab = [f"w{i}" for i in range(200)]
    b = next(w for w in vocab if is_b(w))
    plain = [w for w in vocab if not is_b(w)]
    # doc 1: A-chunk | B-chunk ; doc 2: same but with an inserted
    # prefix inside the FIRST chunk only — the second chunk (starting
    # at boundary token b) must still dedup across both docs
    a_part = " ".join(plain[:5])
    shared = " ".join([b] + plain[5:10])
    d1 = a_part + " " + shared
    d2 = plain[10] + " " + a_part + " " + shared
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    out = cdc_chunk_dedup(df, min_occurrences=2).collect()
    assert len(out) == 1
    assert out[0]["n_occurrences"] == 2 and out[0]["n_docs"] == 2
    assert out[0]["n_tokens"] == 6  # boundary token + 5 tail tokens
