"""Corpus-curation operators: deterministic sampling/splitting, benchmark
decontamination, domain-level stats."""

import pytest
from pyspark.sql import functions as F


# --- sampling ---


def test_hash_split_deterministic_and_partition_invariant(spark):
    """The whole point vs randomSplit: the assignment is a property of the
    row, so repartitioning must not move any row between splits."""
    from pathhier_spark.operators.sampling import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(17)).collect()
    }
    assert a == b
    # growing the corpus never reassigns old rows
    grown = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    g = {r["doc_id"]: r["split"] for r in hash_split(grown).collect()}
    assert all(g[k] == v for k, v in a.items())
    # fractions land near target on a uniform hash
    n = len(a)
    train = sum(1 for v in a.values() if v == "train") / n
    assert 0.85 < train < 0.95


def test_hash_split_fraction_guard(spark):
    from pathhier_spark.operators.sampling import hash_split

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, fractions={"a": 0.5, "b": 0.4})


def test_stratified_sample_monotone_nesting(spark):
    """fraction 0.1 subset must be contained in fraction 0.3 under the
    same salt — the reproducible-ablation property."""
    from pathhier_spark.operators.sampling import stratified_sample

    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"] for r in stratified_sample(df, fraction=0.1).collect()}
    s3 = {r["doc_id"] for r in stratified_sample(df, fraction=0.3).collect()}
    assert s1 <= s3
    assert 0.05 < len(s1) / 3000 < 0.15
    assert 0.25 < len(s3) / 3000 < 0.35
    # a different salt draws a genuinely different subset
    other = {
        r["doc_id"]
        for r in stratified_sample(df, fraction=0.1, salt="other").collect()
    }
    assert other != s1


# --- decontamination ---


def test_decontaminate_flags_overlap(spark):
    from pathhier_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox jumps totally different tail here"),
            (3, "nothing in common with anything at all whatsoever"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "THE QUICK BROWN FOX JUMPS")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_contaminated"], r["contaminated"])
        for r in decontaminate(docs, bench, n=5).collect()
    }
    # doc 1 contains the benchmark 5-gram (case-insensitive tokens)
    assert out[1] == (1, True)
    # doc 2 shares only a 4-token prefix, not a full 5-gram
    assert out[2] == (0, False)
    assert out[3] == (0, False)
    # shorter than n tokens -> no grams, clean
    assert out[4] == (0, False)


def test_decontaminate_accepts_precomputed_grams(spark):
    from pathhier_spark.operators.decontam import (
        benchmark_ngrams,
        decontaminate,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma epsilon")], "doc_id long, text string"
    )
    grams = benchmark_ngrams(bench, n=3)
    out = decontaminate(docs, grams, n=3).collect()[0]
    assert out["n_contaminated"] == 1  # "alpha beta gamma"
    assert out["contaminated"]


# --- domain stats ---


def test_domain_stats_aggregates_and_filters(spark):
    from pathhier_spark.operators.urls import domain_stats

    rows = [
        # good.com: 3 docs over 2 canonical urls, long pages
        (1, "https://good.com/a", 200),
        (2, "HTTPS://GOOD.com:443/a?utm_source=x", 300),
        (3, "https://good.com/b", 400),
        # thin.com: plenty of docs but tiny pages
        (4, "https://thin.com/x", 10),
        (5, "https://thin.com/y", 20),
        (6, "https://thin.com/z", 30),
        # lone.com: too few docs
        (7, "https://lone.com/p", 500),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    out = {
        r["host"]: r
        for r in domain_stats(df, min_docs=2, min_mean_chars=50.0).collect()
    }
    g = out["good.com"]
    assert (g["n_docs"], g["n_urls"], g["total_chars"]) == (3, 2, 900)
    assert g["mean_chars"] == pytest.approx(300.0)
    assert g["keep"]
    assert not out["thin.com"]["keep"]  # mean 20 < 50
    assert not out["lone.com"]["keep"]  # 1 doc < 2


def test_mixture_sample_per_group_rates(spark):
    from pathhier_spark.operators.sampling import mixture_sample

    rows = [(i, f"s{i % 3}") for i in range(6000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(
        df,
        group_col="source",
        fractions={"s0": 1.0, "s1": 0.3},
        default_fraction=0.0,
    )
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("s0") == 2000  # fraction 1.0 keeps every row
    assert 450 < by_src.get("s1", 0) < 750  # ~0.3 of 2000
    assert "s2" not in by_src  # default 0.0 drops unknown groups
    # monotone: raising a group's weight only ADDS rows
    bigger = mixture_sample(
        df,
        group_col="source",
        fractions={"s0": 1.0, "s1": 0.6},
        default_fraction=0.0,
    )
    small_ids = {r["doc_id"] for r in out.collect()}
    big_ids = {r["doc_id"] for r in bigger.collect()}
    assert small_ids <= big_ids


def test_mixture_sample_fraction_guard(spark):
    import pytest as _pytest

    from pathhier_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError):
        mixture_sample(df, group_col="source", fractions={"a": 1.2})


# --- count-min sketch ---


def test_countmin_overestimates_and_merges(spark):
    from pathhier_spark.operators.textstats import (
        countmin_estimate,
        countmin_sketch,
    )

    rows = [(f"w{i % 50}",) for i in range(3000)]  # 50 values, 60 each
    df = spark.createDataFrame(rows, "tok string")
    probes = df.distinct()
    sk = countmin_sketch(df, "tok", width=64, depth=4)
    est = {
        r["tok"]: r["est_count"]
        for r in countmin_estimate(sk, probes, "tok", width=64, depth=4).collect()
    }
    # CMS never underestimates; with 50 values in 64 buckets x 4 rows the
    # min-over-rows stays close to truth
    assert all(v >= 60 for v in est.values())
    assert sum(est.values()) <= 60 * 50 * 2  # bounded blow-up

    # mergeability: sketch(A) + sketch(B) == sketch(A ∪ B) elementwise
    a = df.limit(1000)
    b = spark.createDataFrame(rows[1000:], "tok string")
    sk_a = countmin_sketch(a, "tok", width=64, depth=4)
    sk_b = countmin_sketch(b, "tok", width=64, depth=4)
    merged = (
        sk_a.unionByName(sk_b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r["row"], r["bucket"]): r["cnt"] for r in sk.collect()}
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_countmin_unseen_value_estimates_zero_or_collision(spark):
    from pathhier_spark.operators.textstats import (
        countmin_estimate,
        countmin_sketch,
    )

    df = spark.createDataFrame([("a",), ("b",)], "tok string")
    sk = countmin_sketch(df, "tok", width=1024, depth=4)
    probes = spark.createDataFrame([("zzz",)], "tok string")
    out = countmin_estimate(sk, probes, "tok", width=1024, depth=4).collect()
    # wide sketch, 2 values: an unseen probe should miss every counter
    assert out[0]["est_count"] == 0


# --- plan assertions for the map-only curation operators ---


def test_mixture_and_split_plans_are_map_only(spark):
    """The sampler's contract is scan-speed selection: no Exchange may
    appear in either plan (the literal cut map and hash are pure column
    expressions)."""
    from pathhier_spark.operators.sampling import hash_split, mixture_sample

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id").withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string"))
    )
    for out in (
        mixture_sample(df, group_col="source", fractions={"s0": 0.5}),
        hash_split(df),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


# --- model-based quality filtering (q77) ---


def test_quality_logit_separates_good_from_garbage(spark):
    from pathhier_spark.operators.textstats import quality_logit

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then it ran "
            "far away into the deep green forest with many other animals " * 3),
        (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
        (3, "a a a a a a a a a a a a a a a a a a a a"),
    ]
    out = {
        r["doc_id"]: r
        for r in quality_logit(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["keep_doc"] and not out[2]["keep_doc"]
    # all-repeat doc: distinct_ratio collapses, logit well below the good doc
    assert out[1]["logit"] > out[3]["logit"]
    for r in out.values():
        assert 0.0 < r["quality_prob"] < 1.0
        # boundary decision is taken on the rounded logit
        assert r["keep_doc"] == (r["logit"] >= 0)


# --- DSIR importance weights (q79) ---


def test_dsir_ranks_target_like_docs_higher(spark):
    from pathhier_spark.operators.textstats import dsir_logratio

    target = spark.createDataFrame(
        [(100 + i, "protein pathway enzyme receptor kinase") for i in range(5)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [
            (1, "protein pathway enzyme signal"),      # target-like
            (2, "football match goal referee crowd"),  # off-domain
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["dsir_logratio"] for r in
           dsir_logratio(pool, target).collect()}
    assert out[1] > out[2]
    # partitioning must not change the position-ordered fold
    out2 = {r["doc_id"]: r["dsir_logratio"] for r in
            dsir_logratio(pool.repartition(7), target.repartition(3)).collect()}
    assert out == out2


def test_curation_funnel_invariants(spark):
    """q87 composite: flags are mutually consistent, packing covers
    exactly the kept docs with contiguous offsets."""
    from pathhier_spark.queries import q87_curation_funnel

    rows = q87_curation_funnel(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    kept = [r for r in rows if r["kept"]]
    assert kept, "funnel must keep something at sf0.001"
    for r in rows:
        fired = (
            r["is_dup"] or r["low_quality"] or r["in_benchmark"]
            or r["contaminated"]
        )
        assert r["kept"] == (not fired)
        if r["kept"]:
            assert r["start_off"] is not None and r["first_chunk"] is not None
        else:
            assert r["start_off"] is None and r["last_chunk"] is None
        assert (r["n_contaminated"] > 0) == r["contaminated"]
        if r["in_benchmark"]:
            # benchmark docs match their own grams
            assert r["contaminated"]
    kept.sort(key=lambda r: r["doc_id"])
    off = 0
    for r in kept:
        assert r["start_off"] == off
        assert r["first_chunk"] == off // 256
        assert r["last_chunk"] == (off + r["n_tokens"] - 1) // 256
        off += r["n_tokens"]


# --- deterministic epoch shuffle (q119, round 5) ---

def test_epoch_shuffle_contract(spark):
    from pathhier_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(40)], "doc_id long, text string"
    )
    a = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in epoch_shuffle(df, n_shards=4, epoch=0).collect()
    )
    # reproducible: same epoch -> identical assignment
    b = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in epoch_shuffle(df, n_shards=4, epoch=0).collect()
    )
    assert a == b
    # a different epoch genuinely reshuffles
    c = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in epoch_shuffle(df, n_shards=4, epoch=1).collect()
    )
    assert a != c
    # per-shard positions are dense 1..n and every doc appears exactly once
    from collections import Counter
    cnt = Counter(s for _, s, _ in a)
    for sh, n in cnt.items():
        assert sorted(p for _, s, p in a if s == sh) == list(range(1, n + 1))
    assert sum(cnt.values()) == 40


# --- Neyman allocation (q132, round 5) ---

def test_neyman_allocation_favors_volatile_strata(spark):
    from pathhier_spark.operators.sampling import neyman_allocation

    rows = [("a", v) for v in [10, 10, 10, 10]] + \
           [("b", v) for v in [0, 100, 0, 100]]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r["stratum"]: (r["std_value"], r["alloc"])
           for r in neyman_allocation(df, sample_size=10).collect()}
    # zero-variance stratum earns NOTHING; the volatile one takes all
    assert got["a"] == (0.0, 0)
    assert got["b"] == (50.0, 10)


def test_neyman_allocation_sums_exactly_to_budget(spark):
    from pathhier_spark.operators.sampling import neyman_allocation

    rows = [(f"s{i % 7}", (i * 31) % 97) for i in range(300)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = neyman_allocation(df, sample_size=333).collect()
    # largest-remainder rounding: allocations hit the budget EXACTLY
    assert sum(r["alloc"] for r in out) == 333
