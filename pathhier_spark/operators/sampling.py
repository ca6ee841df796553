"""Deterministic corpus sampling and splitting — the selection stage of a
training-data pipeline.

Spark's own `df.sample()`/`randomSplit()` are seeded per-partition: the
same row lands in a different split when the input's partitioning changes
(a repartition, a different file count, AQE coalescing), which silently
leaks validation documents into training between runs. Both operators here
key every decision off a salted md5 of the ROW's identity instead — the
assignment is a pure map-side column expression, reproducible across
engines, partitionings, and cluster sizes, and appending new documents
never reassigns old ones (the property that matters when the corpus grows
between training runs).

Hash: first 8 md5 hex nibbles as int64 (the engine-portable hex32 used
throughout; DuckDB mirror in queries._sql_hex32), taken modulo a
granularity of 1e6 buckets — split boundaries are exact integers so no
float comparison sits on a boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_GRAN = 1_000_000


def _hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 1e6) from a salted md5 of the key.

    A NULL key is coalesced to a sentinel before hashing: without it the
    bucket itself is NULL, which would silently route every NULL-identity
    row into hash_split's LAST split (every `<` comparison is
    NULL → otherwise) while stratified_sample silently DROPPED the same
    rows (NULL filter) — two different wrong answers for the same rows.
    With the sentinel, all NULL ids share one deterministic bucket (they
    are one identity as far as hashing can tell) and both operators treat
    them identically."""
    k = F.coalesce(key.cast("string"), F.lit("\x00null"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), k)), 1, 8),
        16,
        10,
    ).cast("long")
    return h % F.lit(_GRAN)


def hash_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "split",
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default) by
    hashed identity. Adds `split_bucket` (the raw [0,1e6) bucket, kept so
    downstream re-splits can subdivide without rehashing) and `split`.

    Fractions are cumulative left-to-right in dict order; they must sum to
    1.0 (±1e-9). Boundaries are exact integer bucket counts, so a
    fraction of 0.9 means buckets [0, 900000) — engine-portable with no
    float edge cases. Map-only: no shuffle, runs at scan speed at any
    corpus size, and a grown corpus re-splits consistently (old rows keep
    their assignment)."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = _hash_bucket(F.col(id_col), salt)
    out = df.withColumn("split_bucket", bucket)
    expr = None
    cum = 0
    names = list(fractions)
    for name in names[:-1]:
        cum += int(round(fractions[name] * _GRAN))
        cond = F.col("split_bucket") < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return out.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    *,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic `fraction` of rows by hashed identity. Unlike
    `df.sample()`, membership is a property of the row, not of the
    partitioning or a seed stream: re-running, repartitioning, or growing
    the corpus never flips old rows in or out, and nested samples are
    monotone (fraction 0.1 ⊂ fraction 0.2 under the same salt) — the
    property needed for reproducible ablation subsets. Map-only filter;
    stratification comes free: within ANY stratum (language, domain,
    source) the hash is uniform, so per-stratum rates concentrate around
    `fraction` without a per-stratum pass."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    cut = int(round(fraction * _GRAN))
    return df.filter(_hash_bucket(F.col(id_col), salt) < F.lit(cut))


def mixture_sample(
    df: DataFrame,
    *,
    group_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "mixture",
) -> DataFrame:
    """Per-group deterministic sampling — the source-mixture stage of a
    training pipeline: each group (source, domain, language) keeps its own
    fraction of rows, so corpus mixing weights are applied in one map-only
    filter. Groups absent from `fractions` keep `default_fraction` (0.0 =
    drop unknown sources, 1.0 = pass them through).

    Same hash-identity discipline as stratified_sample — membership is a
    property of the row, invariant to partitioning and corpus growth, and
    nested across fractions (raising one group's weight only ADDS rows).
    The per-group cut rides in as a small literal map (create_map), so
    the filter stays a pure column expression — no join, no shuffle, scan
    speed at any corpus size. For thousands of groups, precompute cuts
    into a broadcast-joined frame instead; at typical mixture sizes
    (tens of sources) the literal map is the cheaper plan."""
    for g, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0,1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")
    pairs = []
    for g, frac in sorted(fractions.items()):
        pairs += [F.lit(g), F.lit(int(round(frac * _GRAN)))]
    cut_map = F.create_map(*pairs) if pairs else None
    default_cut = F.lit(int(round(default_fraction * _GRAN)))
    cut = (
        F.coalesce(
            cut_map[F.col(group_col).cast("string")], default_cut
        )
        if cut_map is not None
        else default_cut
    )
    return df.filter(_hash_bucket(F.col(id_col), salt) < cut)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col,
    k: int,
    *,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): every row draws a reproducible uniform u from a salted
    md5 of its key and is ranked by ln(u)/w — the top-k under that ranking
    is exactly a weight-proportional sample without replacement. The
    ranking is equivalent to the textbook u^(1/w) key by monotonicity but
    avoids pow(), whose cross-engine behavior is less predictable than
    ln().

    Deterministic like everything in this module: same corpus -> same
    sample, regardless of partitioning or cluster size, and the rank key
    is reproducible in SQL (q70's oracle). u = (hex32 + 1) / 2^32 — a
    dyadic rational, exact in double, never 0 so ln is finite.

    The top-k is a sort-limit, which Spark plans as TakeOrderedAndProject
    — per-partition heaps of size k, no global sort, no single-partition
    exchange. Weights must be > 0; rows with NULL or non-positive weight
    are dropped (they have zero selection probability). Ties (impossible
    on distinct keys, but belt-and-braces) break by key.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    uniform = (h + F.lit(1)).cast("double") / F.lit(float(2**32))
    w = F.col(weight_col).cast("double")
    keyed = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "skey", F.log(uniform) / w
    )
    return keyed.orderBy(F.desc("skey"), F.asc(key_col)).limit(k)


def epoch_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    n_shards: int = 64,
    epoch: int = 0,
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic training-epoch shuffle: give every row a shard and a
    position WITHOUT a global sort. The order key is a salted md5 of
    (salt, epoch, id) — changing `epoch` reshuffles the whole corpus
    reproducibly, the property data loaders need for multi-epoch
    training with resumable, audit-identical ordering. Shard =
    hash % n_shards (uniform, skew-free by construction); position =
    row_number over (shard, order by hash, id) — a window PARTITIONED BY
    SHARD, so ranking parallelizes across shards and no stage ever sees
    a global order. The id tiebreak makes position total even on the
    ~2^-32 hash collision.

    At 100 TB this is one hash column (map-only) + one shuffle into
    n_shards partitions + a per-shard sort — exactly the cost of writing
    the shuffled epoch out, with no driver-side state. Output: input
    columns + (shard INT64, pos INT64)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}:{int(epoch)}:"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    out = df.withColumn("_ekey", h).withColumn(
        "shard", (F.col("_ekey") % n_shards).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("_ekey", F.col(id_col))
    return out.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).drop("_ekey")


def neyman_allocation(
    df: DataFrame,
    *,
    stratum_col: str = "source",
    value_col: str = "n_chars",
    sample_size: int = 1000,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: how many samples to
    draw from each stratum to minimize the variance of the estimated
    corpus mean — alloc_h proportional to N_h * S_h, so big AND volatile
    strata get more budget than big-but-uniform ones (the statistically
    correct answer to "how much of each source goes into the eval
    slice"). Rounding is floor; the remainder seats go to the largest
    fractional parts (largest-remainder method, ties to stratum name) so
    the allocations sum EXACTLY to sample_size.

    Determinism shape: per-stratum count/sum/sum-of-squares are ONE
    exact-int64 combiner groupBy (values are integers; sumsq of n_chars
    <= 1e6^2 * 1e12 rows stays under int64 for any real corpus slice);
    std = sqrt of a fixed rational of those integers (engine-identical,
    the q110 Pearson discipline), and the allocation arithmetic runs on
    the stratum-count-sized table. Output: (stratum, n_rows, mean_value,
    std_value, alloc), round-6 doubles."""
    g = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("long")).alias("s"),
        F.sum(
            F.col(value_col).cast("long") * F.col(value_col).cast("long")
        ).alias("ss"),
    )
    n, s, ss = (F.col(c).cast("double") for c in ("n", "s", "ss"))
    var = (n * ss - s * s) / (n * n)  # population variance, exact ints in
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    weighted = g.select(
        "stratum", "n", "s", "ss", (n * std).alias("w")
    )
    tot = weighted.agg(F.sum("w").alias("wtot"))
    alloc_raw = (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "stratum", "n", "s", "ss",
            (F.col("w") / F.col("wtot") * sample_size).alias("raw"),
        )
    )
    base = alloc_raw.select(
        "stratum", "n", "s", "ss", "raw",
        F.floor("raw").cast("long").alias("base"),
        (F.col("raw") - F.floor("raw")).alias("frac"),
    )
    short = base.agg(
        (F.lit(int(sample_size)) - F.sum("base")).alias("short")
    )
    w_rank = Window.orderBy(F.col("frac").desc(), F.col("stratum"))
    ranked = base.crossJoin(F.broadcast(short)).withColumn(
        "rk", F.row_number().over(w_rank)
    )
    nn, sss, ssss = (F.col(c).cast("double") for c in ("n", "s", "ss"))
    return ranked.select(
        "stratum",
        F.col("n").alias("n_rows"),
        (F.round(sss / nn, 6) + F.lit(0.0)).alias("mean_value"),
        (
            F.round(
                F.sqrt(
                    F.greatest(
                        (nn * ssss - sss * sss) / (nn * nn), F.lit(0.0)
                    )
                ),
                6,
            ) + F.lit(0.0)
        ).alias("std_value"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("short"), 1).otherwise(0)
        ).cast("long").alias("alloc"),
    )


def split_leakage(
    pairs: DataFrame,
    splits: DataFrame,
    *,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Cross-split near-dup leakage audit — the eval-integrity check every
    LLM data pipeline needs before training: a near-duplicate pair that
    straddles train and val/test silently inflates held-out metrics. Joins
    a match-pair set (id_a, id_b) against per-doc split assignments and
    counts pairs per unordered split combination.

    Scale shape: two equi-joins on the doc id (the pair table is the small
    post-LSH-verify set, the split table is map-only hash_split output —
    both shuffles are on the id key) and one combiner groupBy over the
    ≤ |splits|² combination space. Output: (split_lo, split_hi, n_pairs,
    is_cross) — is_cross=1 rows are the leaks; a clean corpus has all
    mass on the diagonal."""
    s = splits.select(F.col(id_col).alias("_id"), F.col(split_col).alias("_s"))
    j = (
        pairs.select("id_a", "id_b")
        .join(s.select(F.col("_id").alias("id_a"), F.col("_s").alias("sa")), "id_a")
        .join(s.select(F.col("_id").alias("id_b"), F.col("_s").alias("sb")), "id_b")
    )
    lo = F.least("sa", "sb")
    hi = F.greatest("sa", "sb")
    return (
        j.groupBy(lo.alias("split_lo"), hi.alias("split_hi"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_lo",
            "split_hi",
            "n_pairs",
            F.when(F.col("split_lo") != F.col("split_hi"), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_cross"),
        )
    )


def temperature_allocation(
    df: DataFrame,
    *,
    group_col: str = "lang",
    text_col: str = "text",
    budget: int = 1_000_000,
    scale: int = 1000,
) -> DataFrame:
    """Temperature-scaled (alpha = 0.5) mixture allocation: split a token
    budget across languages proportionally to sqrt of each language's
    token mass — the standard multilingual up/down-sampling rule
    (p_l proportional to T_l^alpha; alpha < 1 lifts low-resource
    languages, alpha = 1 is proportional, alpha = 0 uniform). The
    square root is the one alpha whose fixed-point form is engine-exact:
    both engines convert the int64 count to the SAME nearest double and
    IEEE-754 sqrt is correctly rounded, so floor(sqrt(T) * scale) agrees
    bit-for-bit with the DuckDB oracle at any magnitude.

    Rounding is the q132 largest-remainder discipline in pure integers:
    base_l = (budget * w_l) DIV W and the leftover seats go to the
    largest (budget * w_l) MOD W, ties to the language name, so the
    allocations sum EXACTLY to budget. Bound: budget * w_fp must stay
    under 2^63 — at budget 1e6 and scale 1e3 that allows ~1e19 tokens
    per language, past any real corpus.

    Scale shape: token counting is map-only (size of the split array,
    no explode); the per-language mass is ONE combiner groupBy; all the
    allocation arithmetic (including the rank window) runs on the
    language-cardinality table, never corpus rows. Output: (lang,
    n_tokens, w_fp, alloc_tokens, share round-6), Σ alloc == budget."""
    from pathhier_spark.functions.text import WS_SPLIT_RE

    toks = df.select(
        F.col(group_col).alias("grp"),
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), WS_SPLIT_RE),
                lambda x: x != "",
            )
        ).alias("nt"),
    )
    g = toks.groupBy("grp").agg(F.sum(F.col("nt").cast("long")).alias("n_tokens"))
    w = g.select(
        "grp",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(int(scale)))
        .cast("long")
        .alias("w_fp"),
    )
    tot = w.agg(F.sum("w_fp").alias("wtot"))
    b = (
        w.crossJoin(F.broadcast(tot))
        .withColumn("num", F.lit(int(budget)).cast("long") * F.col("w_fp"))
        .withColumn("base", F.expr("num DIV wtot").cast("long"))
        .withColumn("rem", F.expr("num % wtot").cast("long"))
    )
    short = b.agg((F.lit(int(budget)) - F.sum("base")).alias("short"))
    rk_w = Window.orderBy(F.col("rem").desc(), F.col("grp"))
    ranked = b.crossJoin(F.broadcast(short)).withColumn(
        "rk", F.row_number().over(rk_w)
    )
    alloc = (
        F.col("base")
        + F.when(F.col("rk") <= F.col("short"), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    return ranked.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "w_fp",
        alloc.alias("alloc_tokens"),
        (
            F.round(alloc.cast("double") / F.lit(float(budget)), 6) + F.lit(0.0)
        ).alias("share"),
    )


def kcenter_select(
    emb: DataFrame,
    *,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Greedy k-center (farthest-point / Gonzalez) diversity selection
    over an embedding column — the coreset picker for training-data
    diversity: each round adds the point FARTHEST from everything
    already chosen, the classic 2-approximation to the k-center
    clustering optimum. Deterministic end to end: vectors quantize to
    int64 micro-units (the q36 discipline — distances are all-integer
    squared L2, no float boundary flips), the seed is the row with the
    smallest md5('kc:' || id) (engine-portable, the k-means init
    trick), and each round's argmax breaks ties by MINIMUM id via a
    single max(struct(mind, -id, qv)) aggregate — one job per round,
    no window, no sort.

    The min-distance column updates INCREMENTALLY (mind =
    least(mind, sqdist(·, newest))) so round r costs one map pass, not
    r re-scans; each round localCheckpoints eagerly (the q51 loop
    discipline — k bounded and small, the driver holds only k centers).
    Rounds stop early when max(mind) = 0: every remaining point
    duplicates a chosen center, so further picks are degenerate (the
    oracle mirrors the same guard). Overflow bound: sum over dims of
    (2 * scale * |x|)^2 must stay < 2^63 (|x| <= ~30 at 64 dims — the
    _sqdist_l2 domain). Output: (sel, id, dist_fp) in selection order,
    dist_fp = the selected point's distance to the prior centers (the
    coverage radius just before it was added; 0 for the seed)."""
    from pathhier_spark.operators.similarity import _sqdist_l2

    spark = emb.sparkSession
    out_schema = f"sel int, {id_col} long, dist_fp long"
    if k < 1:
        raise ValueError("kcenter_select needs k >= 1")
    c = emb.select(
        F.col(id_col).alias("_id"),
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * scale).cast("long")
        ).alias("_qv"),
    )
    seed_rows = (
        c.select(
            "_id",
            "_qv",
            F.md5(F.concat(F.lit("kc:"), F.col("_id").cast("string"))).alias(
                "_h"
            ),
        )
        .orderBy("_h", "_id")
        .limit(1)
        .collect()
    )
    if not seed_rows:
        return spark.createDataFrame([], out_schema)
    seed = seed_rows[0]
    chosen = [(0, int(seed["_id"]), 0)]

    def lit_vec(vals):
        return F.array(*[F.lit(int(v)) for v in vals])

    cur = c.select(
        "_id",
        "_qv",
        _sqdist_l2(F.col("_qv"), lit_vec(seed["_qv"])).alias("mind"),
    ).localCheckpoint(eager=True)
    for r in range(1, k):
        top = cur.agg(
            F.max(
                F.struct(
                    F.col("mind").alias("m"),
                    (-F.col("_id")).alias("nid"),
                    F.col("_qv").alias("qv"),
                )
            ).alias("s")
        ).collect()[0]["s"]
        if top is None or top["m"] == 0:
            break
        chosen.append((r, int(-top["nid"]), int(top["m"])))
        cur = cur.select(
            "_id",
            "_qv",
            F.least(
                F.col("mind"), _sqdist_l2(F.col("_qv"), lit_vec(top["qv"]))
            ).alias("mind"),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(chosen, out_schema)


def set_cover_select(
    df: DataFrame,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
) -> DataFrame:
    """Greedy maximum-coverage corpus selection — the submodular
    facility-location classic for training-data picking: each round
    adds the document covering the most NOT-YET-COVERED vocabulary,
    the (1 - 1/e)-approximation to optimal coverage that diminishing
    returns guarantees. The diversity companion to kcenter_select:
    k-center spreads in embedding space, set-cover spreads over
    discrete vocabulary.

    Deterministic end to end: gains are exact distinct-token counts,
    the per-round argmax is one max(struct(gain, -id)) aggregate (max
    gain, then MIN id among ties — the portable two-phase argmax), and
    rounds stop early when the best gain is 0 (everything coverable is
    covered). Scale shape: the (id, token) membership table
    materializes ONCE (eager localCheckpoint) and each round is one
    anti-join against the covered set + one combiner count — never a
    re-tokenization, never anything quadratic; k is small and bounded,
    so the driver holds only the k picks (the kcenter/q163 argument).
    Output: (sel, id_col, gain, n_covered) in selection order, where
    n_covered is the cumulative distinct vocabulary after the pick."""
    if k < 1:
        raise ValueError("set_cover_select needs k >= 1")
    spark = df.sparkSession
    toks = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(F.col(tokens_col))).alias("tok"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    covered = None
    rows = []
    for r in range(k):
        pool = toks if covered is None else toks.join(
            covered, "tok", "left_anti"
        )
        top_rows = pool.groupBy("_id").agg(
            F.count(F.lit(1)).alias("gain")
        ).agg(
            F.max(
                F.struct(F.col("gain"), (-F.col("_id")).alias("nid"))
            ).alias("s")
        ).collect()
        top = top_rows[0]["s"] if top_rows else None
        if top is None or top["gain"] == 0:
            break
        doc = -top["nid"]
        picked = toks.filter(F.col("_id") == doc).select("tok")
        covered = (
            picked
            if covered is None
            else covered.union(picked).distinct()
        ).localCheckpoint(eager=True)
        rows.append((r, int(doc), int(top["gain"]), covered.count()))
    return spark.createDataFrame(
        rows, f"sel int, {id_col} long, gain long, n_covered long"
    )


def pareto_frontier2d(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Exact 2-D Pareto frontier (skyline) over two integer quality
    signals — the multi-criteria counterpart of the scalar keep/drop
    thresholds (q14/q53): keep the documents no other document beats on
    BOTH axes (maximize both). The selection primitive behind "best
    quality at every length" curation sweeps and the threshold-free dual
    of the q175 PR-curve: the frontier IS the set of undominated
    operating points.

    Dominance: a row is dominated iff some other row has x' >= x AND
    y' >= y with at least one strict. Exact-tie duplicates (same x, y)
    dominate neither each other nor anything extra — all stay on the
    frontier (the standard skyline convention; pinned in pytest).

    Scale shape — the reason this is not the textbook sort-based sweep:
    a global ORDER BY x over corpus rows would be a SinglePartition
    window (the one plan shape this repo bans). Instead a row is on the
    frontier iff y = ymax(x) AND y > S(x), where ymax is the per-x-value
    maximum and S(x) = max_{x' > x} ymax(x') is the strict-suffix
    maximum — and BOTH live on the x-VALUE-DOMAIN histogram, not on
    corpus rows (the q45 discipline): one combiner-friendly groupBy(x)
    builds the histogram, one window over that tiny table computes the
    suffix max, and one broadcast join back decides every row map-side.
    Works for any bounded-domain signal (token counts, integer quality
    scores); quantize upstream when the x domain is not bounded. NULL
    in either signal disqualifies the row (dominance is undefined on
    missing data), mirroring SQL NOT EXISTS semantics.

    Output: the frontier rows (id, x, y), one per input row that
    survives (duplicates preserved)."""
    pts = df.select(
        F.col(id_col),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    ).where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    hist = pts.groupBy("_x").agg(F.max("_y").alias("ymax"))
    wsuf = (
        Window.orderBy(F.asc("_x"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    dom = hist.select(
        "_x",
        "ymax",
        F.coalesce(
            F.max("ymax").over(wsuf), F.lit(-(1 << 62))
        ).alias("suf"),
    )
    return (
        pts.join(F.broadcast(dom), "_x")
        .where((F.col("_y") == F.col("ymax")) & (F.col("_y") > F.col("suf")))
        .select(
            F.col(id_col),
            F.col("_x").alias(x_col),
            F.col("_y").alias(y_col),
        )
    )


def priority_sample_sums(
    df: DataFrame,
    *,
    id_col: str = "event_id",
    weight_col: str = "w",
    group_col: str = "event_type",
    k: int = 100,
) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup) for SUBSET-SUM
    estimation — the weighted counterpart of the distinct sketches
    (KMV q50, HLL q68): keep the k items of highest priority
    q_i = w_i / u_i and any subset's weight sum is estimated by
    Σ max(w_i, τ) over its sampled members, τ = the (k+1)-th priority.
    DLT prove the estimator unbiased with near-optimal variance — ONE
    k-item sample answers every posterior group-by-sum question, which
    is exactly the regime of interactive corpus analytics over 100 TB.

    RNG-free determinism: u_i is an exact dyadic rational from the
    item's md5 ((first-8-hex + 1) / 2^32), so priorities are identical
    doubles on both engines and the (priority DESC, id) order — and
    therefore the sample and τ — is bit-reproducible. Global top-(k+1)
    is the standard scalable pattern (per-partition partial top-k,
    then merge k·parts rows). Output per group: (group, n_items,
    exact_sum, n_sampled, est_sum) — the exact sum ships alongside so
    the estimate is auditable row-by-row."""
    items = df.where(
        F.col(id_col).isNotNull() & F.col(weight_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("i"),
        F.col(weight_col).cast("long").alias("w"),
    ).where(F.col("w") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("i").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(float(1 << 32))
    pri = items.select(
        "g", "i", "w", (F.col("w").cast("double") / u).alias("q")
    )
    wtop = Window.orderBy(F.desc("q"), F.asc("i"))
    ranked = pri.withColumn("_rn", F.row_number().over(wtop)).where(
        F.col("_rn") <= k + 1
    ).localCheckpoint(eager=False)
    # tau as a 1-row aggregate: NULL (-> 0.0) when fewer than k+1 items,
    # which degrades the estimator to the exact sum — the DLT convention
    tau = ranked.agg(
        F.max(F.when(F.col("_rn") == k + 1, F.col("q"))).alias("tau")
    )
    sample = ranked.where(F.col("_rn") <= k)
    est = (
        sample.crossJoin(F.broadcast(tau))
        .select(
            "g",
            "i",
            F.greatest(
                F.col("w").cast("double"),
                F.coalesce(F.col("tau"), F.lit(0.0)),
            ).alias("e"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            # float sum folds in ID order (never a shuffled double sum)
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "e"))),
                    lambda s: s["e"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("est_sum"),
        )
    )
    exact = items.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("w").cast("long").alias("exact_sum"),
    )
    return (
        exact.join(est, "g", "left")
        .select(
            F.col("g").alias(group_col),
            "n_items",
            "exact_sum",
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("long")
            .alias("n_sampled"),
            F.coalesce(F.col("est_sum"), F.lit(0.0)).alias("est_sum"),
        )
    )
