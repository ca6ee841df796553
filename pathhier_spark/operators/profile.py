"""Single-pass dataset profiler — per-column null counts, distinct
cardinality, and min/max, emitted long-format (one row per column).

The ingest-gate half of data quality: before a 100 TB corpus enters the
pipeline, the profile is what detects the broken shard (nulls spiking),
the truncated dump (distinct ids collapsing), and the unit change (max
out of range) — the same role the reference's distribution stats play for
its curated databases (pathway_utils.py's kb stats), generalized to any
table the engine reads.

Plan shape: ONE aggregate pass over the table produces every statistic
(all per-column aggs in a single groupBy().agg — Spark fuses them into
one scan with map-side partials); the long-format pivot happens on the
resulting single row via an array-of-structs explode, which is driver-free
and costs nothing. Exact distinct counts use count(DISTINCT col), which
Spark plans as one Expand (one extra shuffle of (col_idx, value) pairs);
for profile-only monitoring at full scale pass exact_distinct=False to
use approx_count_distinct (HLL, single pass, no Expand) — the q68/q82
sketches are the same estimator exposed as data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def profile_columns(
    df: DataFrame,
    *,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile `columns` (default: all numeric/string columns) of `df`.

    Output (one row per profiled column, ordered by the input column
    order): column, n_rows, n_nulls, n_distinct (non-null values, exact
    or HLL-approximate), min_num/max_num (numeric columns, as round-6
    doubles; NULL for strings), min_str/max_str (string columns; NULL
    for numerics). Profiling numerics through doubles keeps one output
    schema for every input table; exact integer profiling beyond 2^53
    should read the sketch queries instead."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (NumericType, StringType))
        ]
    for c in columns:
        if c not in fields:
            raise ValueError(f"unknown column {c!r}")
        if not isinstance(fields[c], (NumericType, StringType)):
            raise ValueError(f"column {c!r} is not numeric or string")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"nd_{c}"))
        if isinstance(fields[c], NumericType):
            aggs.append(
                F.round(F.min(F.col(c)).cast("double"), 6).alias(f"mn_{c}")
            )
            aggs.append(
                F.round(F.max(F.col(c)).cast("double"), 6).alias(f"mx_{c}")
            )
        else:
            aggs.append(F.min(F.col(c)).alias(f"mn_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"mx_{c}"))
    one = df.agg(*aggs)

    def _row(i: int, c: str):
        numeric = isinstance(fields[c], NumericType)
        return F.struct(
            F.lit(i).cast("long").alias("col_idx"),
            F.lit(c).alias("column"),
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).cast("long").alias("n_nulls"),
            F.col(f"nd_{c}").cast("long").alias("n_distinct"),
            (F.col(f"mn_{c}") if numeric else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"mx_{c}") if numeric else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (F.lit(None).cast("string") if numeric else F.col(f"mn_{c}")).alias(
                "min_str"
            ),
            (F.lit(None).cast("string") if numeric else F.col(f"mx_{c}")).alias(
                "max_str"
            ),
        )

    rows = F.array(*[_row(i, c) for i, c in enumerate(columns)])
    return one.select(F.explode(rows).alias("p")).select("p.*")


def source_chisq(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group chi-square goodness-of-fit of the token distribution
    against the whole corpus — the "which crawl source looks wrong"
    anomaly score (a spam injection, an encoding break, or a template
    flood shows up as a token mix that diverges from everyone else's).
    Complements psi_drift (textstats): PSI compares two SNAPSHOTS of one
    corpus; this ranks GROUPS within one snapshot.

    Exactness discipline: observed counts, group totals, token totals,
    and the corpus total are exact int64 from ONE combiner-friendly
    groupBy(group, token). The per-token statistic is computed from the
    exact integer residual diff = obs*corpus_total - tok_total*grp_total
    (a difference of ~1e12-scale products — int64-safe far past this
    corpus; the SQUARE happens in double, after the exact subtraction),
    then chi2_term = diff^2 / (corpus_total * tok_total * grp_total) —
    the algebraic identity of (obs-exp)^2/exp with exp =
    tok_total*grp_total/corpus_total, picked so both engines do the
    identical double ops on identical integers. The per-group sum folds
    in TOKEN order (array_sort + aggregate, the bm25/unigram-surprisal
    discipline) so the float total is partition- and engine-invariant.

    Scale shape: one corpus-sized explode + groupBy; everything after is
    vocab x groups sized, with the token/corpus totals broadcast. Output:
    (group_col, n_tokens bigint, chi2 double round-6), one row per group.
    """
    from pathhier_spark.operators.textstats import _tokens

    obs = (
        docs.select(F.col(group_col).alias("grp"), F.explode(_tokens(text_col)).alias("token"))
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    grp_tot = obs.groupBy("grp").agg(F.sum("obs").alias("grp_total"))
    tok_tot = obs.groupBy("token").agg(F.sum("obs").alias("tok_total"))
    corpus = obs.agg(F.sum("obs").alias("corpus_total"))
    diff = (
        F.col("obs") * F.col("corpus_total")
        - F.col("tok_total") * F.col("grp_total")
    ).cast("double")
    term = (diff * diff) / (
        F.col("corpus_total").cast("double")
        * F.col("tok_total").cast("double")
        * F.col("grp_total").cast("double")
    )
    # dense (group x token) domain: a token a group never emits still
    # contributes its expected count (diff = -tok_total*grp_total, term =
    # exp) — the textbook zero-cell term, and the cell count is
    # groups x vocab, not corpus-sized
    dense = (
        grp_tot.crossJoin(F.broadcast(tok_tot))
        .join(obs, ["grp", "token"], "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0)))
    )
    scored = dense.crossJoin(F.broadcast(corpus)).select(
        "grp", "token", F.col("grp_total"), term.alias("t")
    )
    return (
        scored.groupBy("grp")
        .agg(
            F.first("grp_total").alias("n_tokens"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("token", "t"))),
                F.lit(0.0),
                lambda acc, x: acc + x["t"],
            ).alias("chi2_raw"),
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("n_tokens"),
            (F.round("chi2_raw", 6) + F.lit(0.0)).alias("chi2"),
        )
    )


def cohens_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cohen's kappa between two categorical columns — chance-corrected
    agreement, the metrology scalar behind every "do my two quality
    signals / annotators / classifiers agree?" question (the confusion
    matrix q15 emits, summarized to one auditable number).

    kappa = (po - pe) / (1 - pe), po = agreements/N,
    pe = sum_k row_k*col_k / N^2 (expected agreement by chance).

    Exactness: ONE combiner groupBy(col_a, col_b) touches row-scale data;
    N, the diagonal, the marginals, and sum_k row_k*col_k are exact int64
    (products of marginals — int64-safe to ~3e9 rows per class; past
    that, pre-aggregate per shard). po/pe/kappa are then single
    int64->double divisions in a fixed expression shape, identical on
    both engines, round-6. Degenerate pe == 1 (both columns constant and
    equal) yields NULL kappa rather than a division blow-up.

    Output: one row (n_total, n_agree, po, pe, kappa)."""
    cm = (
        df.groupBy(F.col(col_a).alias("ka"), F.col(col_b).alias("kb"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scalars = cm.agg(
        F.sum("n").alias("n_total"),
        F.sum(F.when(F.col("ka") == F.col("kb"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    rows = cm.groupBy("ka").agg(F.sum("n").alias("ra"))
    cols = cm.groupBy("kb").agg(F.sum("n").alias("cb"))
    pe_num = (
        rows.join(cols, rows["ka"] == cols["kb"])
        .agg(F.sum(F.col("ra") * F.col("cb")).cast("long").alias("pe_num"))
    )
    po = F.col("n_agree").cast("double") / F.col("n_total").cast("double")
    pe = F.col("pe_num").cast("double") / (
        F.col("n_total").cast("double") * F.col("n_total").cast("double")
    )
    return (
        scalars.crossJoin(F.broadcast(pe_num))
        .select(
            "n_total",
            "n_agree",
            (F.round(po, 6) + F.lit(0.0)).alias("po"),
            (F.round(pe, 6) + F.lit(0.0)).alias("pe"),
            F.when(
                pe < 1.0,
                F.round((po - pe) / (F.lit(1.0) - pe), 6) + F.lit(0.0),
            ).alias("kappa"),
        )
    )


def join_key_skew(
    df: DataFrame,
    key_col: str,
    *,
    permille: int = 990,
) -> DataFrame:
    """Pre-join skew probe: the numbers that decide a join strategy
    BEFORE running it — broadcast / plain shuffle / salted / AQE skew
    hints (the BENCH/SKEW.md regimes, as a queryable operator instead of
    a post-mortem). NULL keys count as one key (they hash to one
    partition in a real shuffle — exactly the skew that hurts).

    Statistics and why they are scalable: key frequencies are one
    combiner groupBy (key-sized result); max/avg/top-share are a 1-row
    aggregate over it; the p-th permille frequency uses the
    histogram-of-the-histogram trick — groupBy freq gives (freq,
    n_keys) with at most a few thousand DISTINCT frequency values on
    any real distribution (Zipf included), and the cumulative walk runs
    on that tiny table, so nothing is ever globally sorted at data or
    key scale. skew_factor = max_freq / mean_freq is the one number to
    alert on: ~1 = uniform, >> 1 = salt it.

    Output: one row (n_rows, n_keys, max_freq, p{permille}_freq,
    top1_share, skew_factor), shares round-6."""
    freqs = (
        df.select(F.col(key_col).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("freq"))
    ).localCheckpoint(eager=False)
    hist = freqs.groupBy("freq").agg(F.count(F.lit(1)).alias("nk"))
    w = (
        Window.orderBy("freq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = hist.agg(
        F.sum("nk").alias("n_keys"),
        F.sum(F.col("nk") * F.col("freq")).alias("n_rows"),
        F.max("freq").alias("max_freq"),
    )
    # cumulative over the tiny (distinct-frequency)-sized histogram: the
    # Window.orderBy here IS single-partition, but over ~1e3 rows by the
    # histogram-of-histogram argument, never data- or key-sized
    cum = hist.select(
        "freq", F.sum("nk").over(w).alias("cum")
    )
    p = (
        cum.crossJoin(F.broadcast(tot))
        .filter(
            F.col("cum")
            >= F.floor((F.lit(int(permille)) * F.col("n_keys") + 999) / 1000)
        )
        .agg(F.min("freq").alias("p_freq"))
    )
    return (
        tot.crossJoin(F.broadcast(p))
        .select(
            "n_rows",
            "n_keys",
            "max_freq",
            F.col("p_freq").alias(f"p{int(permille)}_freq"),
            (
                F.round(
                    F.col("max_freq") / F.col("n_rows").cast("double"), 6
                ) + F.lit(0.0)
            ).alias("top1_share"),
            (
                F.round(
                    F.col("max_freq")
                    * F.col("n_keys")
                    / F.col("n_rows").cast("double"),
                    6,
                ) + F.lit(0.0)
            ).alias("skew_factor"),
        )
    )


def source_diversity(
    docs: DataFrame,
    *,
    group_col: str = "source",
    label_col: str = "lang",
) -> DataFrame:
    """Per-source label-diversity profile — the curation dashboard row
    answering "how language-diverse is each corpus source?": Shannon
    entropy of the label distribution (nats), its exp (effective number
    of labels, the ecology 'Hill number' D1), and the majority label with
    its share.

    Determinism shape: per-(source,label) counts are exact int64 (one
    combiner groupBy); H = ln(n) − (Σ c·ln c)/n needs ONE float sum, and
    that sum is a label-ordered F.aggregate fold over the sorted
    per-source array (the q63/q130 fixed-order discipline) — the array is
    |labels|-sized per source, never corpus-sized. The majority label is
    the portable two-phase argmax (max count, then first label achieving
    it in the label-sorted array — min label, the q131 tie rule).
    Output: (source, n_docs, n_labels, top_label, top_share, entropy,
    effective_labels), doubles round-6."""
    counts = docs.groupBy(
        F.col(group_col).alias("grp"), F.col(label_col).alias("lab")
    ).agg(F.count(F.lit(1)).alias("c"))
    per = counts.groupBy("grp").agg(
        F.sum("c").alias("n_docs"),
        F.count(F.lit(1)).alias("n_labels"),
        F.max("c").alias("max_c"),
        F.sort_array(F.collect_list(F.struct("lab", "c"))).alias("arr"),
    )
    slnl = F.aggregate(
        "arr",
        F.lit(0.0),
        lambda acc, x: acc + x["c"].cast("double") * F.log(x["c"].cast("double")),
    )
    n = F.col("n_docs").cast("double")
    h = F.log(n) - slnl / n
    top = F.element_at(
        F.filter("arr", lambda x: x["c"] == F.col("max_c")), 1
    )["lab"]
    return per.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_labels",
        top.alias("top_label"),
        (F.round(F.col("max_c").cast("double") / n, 6) + F.lit(0.0)).alias(
            "top_share"
        ),
        (F.round(h, 6) + F.lit(0.0)).alias("entropy"),
        (F.round(F.exp(h), 6) + F.lit(0.0)).alias("effective_labels"),
    )


def mad_outliers(
    df: DataFrame,
    *,
    group_col: str,
    cents_col: str,
    k_mad: int = 3,
) -> DataFrame:
    """Robust per-group outlier profile: low-median + MAD (median
    absolute deviation) + the count of |x - med| > k_mad * MAD rows —
    the outlier detector that, unlike the z-score (q134), a single
    wild value cannot poison (median and MAD both have 50% breakdown).

    All arithmetic is EXACT INT64 on pre-quantized integer cents (the
    q49 rule: quantize per row BEFORE aggregating, never round a float
    sum). Median uses the low-median convention — the smallest value v
    whose cumulative count reaches ceil(n/2) — computed by the q45/q71
    value-histogram + inverted-CDF walk: one combiner groupBy to the
    (group, value) domain, one window over the DOMAIN (distinct values
    per group, never rows). The MAD pass repeats the same machinery on
    |x - med|, and the outlier count is one more combiner aggregate.
    Three passes over the (group, value) histogram; zero passes over
    raw rows beyond the first quantize+count.

    Output: (group, n, med_cents, mad_cents, n_outliers), one row per
    group, NULL-group rows excluded."""

    # both medians reuse textstats.grouped_value_percentiles — its
    # inverted-CDF rank floor((n-1)*0.5)+1 equals the low-median
    # (n+1) DIV 2 for every n (even: (n-1)/2 floors to n/2-1, +1 = n/2;
    # odd: exact), so this IS the q45/q71 machinery, not a re-implement
    from pathhier_spark.operators.textstats import grouped_value_percentiles

    base = df.select(
        F.col(group_col).alias("g"), F.col(cents_col).alias("v")
    ).filter(F.col("g").isNotNull() & F.col("v").isNotNull())
    ns = base.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    med = (
        grouped_value_percentiles(base, "g", "v", qs=(0.5,))
        .select("g", F.col("p50").alias("med"))
        .join(ns, "g")
    )
    dev = base.join(med.select("g", "med"), "g").select(
        "g", F.abs(F.col("v") - F.col("med")).alias("d")
    )
    mad = grouped_value_percentiles(dev, "g", "d", qs=(0.5,)).select(
        "g", F.col("p50").alias("mad")
    )
    flagged = (
        base.join(med.select("g", "med", "n"), "g")
        .join(mad, "g")
        .select(
            "g",
            "n",
            "med",
            "mad",
            F.when(
                F.abs(F.col("v") - F.col("med"))
                > F.lit(int(k_mad)) * F.col("mad"),
                1,
            )
            .otherwise(0)
            .alias("is_out"),
        )
    )
    return flagged.groupBy("g", "n", "med", "mad").agg(
        F.sum("is_out").cast("long").alias("n_outliers")
    ).select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("med").cast("long").alias("med_cents"),
        F.col("mad").cast("long").alias("mad_cents"),
        "n_outliers",
    )


def pr_curve(
    df: DataFrame,
    *,
    score_col: str = "score_fp",
    label_col: str = "is_pos",
) -> DataFrame:
    """Threshold-sweep precision/recall/F1 over an integer fixed-point
    score: one curve row per distinct score value s, evaluating the rule
    "predict positive iff score >= s". This is the calibration table a
    curation pipeline reads to PICK its filter threshold (argmax-F1, or
    precision-at-target) instead of hard-coding one — the eval companion
    to the quality scorer (q14) the way retrieval_eval (q126) scores the
    ranking stack.

    The score column must arrive as EXACT INTEGER fixed point (compute
    micro-units upstream as floor((scale * num) / den) of exact integer
    counts — the q170 idiom); the operator never multiplies floats, so
    the curve is engine-portable by construction. A NULL label counts
    toward predicted-positives but not true-positives on both engines
    (SUM skips NULLs, COUNT(*) does not).

    Scale shape: one combiner groupBy collapses the row-scale input to a
    per-score histogram whose cardinality is bounded by the score's
    fixed-point resolution — quantize coarser upstream to bound it
    harder; the cumulative window then runs over that HISTOGRAM (the q45
    exact-percentile discipline: a SinglePartition sort of a
    resolution-sized table, never the corpus); the positive total joins
    back as a broadcast scalar. tp/fpos/fneg are exact int64;
    prec/rec/f1 are each ONE IEEE division of exact integers — bit-exact
    on any engine (f1 = 2*tp / (pp + total_pos), one division, no
    compounding). rec/f1 are NULL when the input has no positives.
    Output: (score_fp, tp, fpos, fneg, prec, rec, f1), score_fp DESC."""
    h = (
        df.select(
            F.col(score_col).cast("long").alias("score_fp"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("score_fp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("y"), F.lit(0)).alias("npos"),
        )
    )
    wdesc = Window.orderBy(F.desc("score_fp")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = h.agg(F.sum("npos").alias("total_pos"))
    cum = h.select(
        "score_fp",
        F.sum("n").over(wdesc).alias("pp"),
        F.sum("npos").over(wdesc).alias("tp"),
    )
    return (
        cum.join(F.broadcast(tot))
        .select(
            "score_fp",
            F.col("tp").cast("long").alias("tp"),
            (F.col("pp") - F.col("tp")).cast("long").alias("fpos"),
            (F.col("total_pos") - F.col("tp")).cast("long").alias("fneg"),
            (F.col("tp") / F.col("pp")).alias("prec"),
            F.when(
                F.col("total_pos") > 0, F.col("tp") / F.col("total_pos")
            ).alias("rec"),
            F.when(
                F.col("total_pos") > 0,
                (2 * F.col("tp")) / (F.col("pp") + F.col("total_pos")),
            ).alias("f1"),
        )
        .orderBy(F.desc("score_fp"))
    )


def auc_exact(
    df: DataFrame,
    *,
    score_col: str = "score_fp",
    label_col: str = "is_pos",
) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney pair count with the standard
    half-credit tie correction — the single-scalar companion to
    pr_curve's full threshold sweep (q172): AUC = P(random positive
    outranks random negative), ties counting 1/2. Never materializes
    pairs and never ranks rows: per distinct score s the histogram
    gives (npos_s, nneg_s); wins = Σ_s npos_s * (negatives strictly
    below s) via an EXCLUSIVE cumulative window, ties = Σ_s
    npos_s * nneg_s — so auc = (2*wins + ties) / (2*npos*nneg) is ONE
    IEEE division of exact int64s (the doubled numerator absorbs the
    half-credit without a float ever multiplying a float).

    Same scale shape as pr_curve: one combiner groupBy to the
    score-resolution histogram, one SinglePartition cumulative window
    over that HISTOGRAM only (q45 discipline), one single-row finish.
    NULL labels count as neither positive nor negative (they carry no
    ordering information — unlike pr_curve, where they still occupy
    predicted-positive slots). AUC is NULL when either class is empty.
    Output: one row (n_pos, n_neg, wins2, auc)."""
    h = (
        df.select(
            F.col(score_col).cast("long").alias("score_fp"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("score_fp")
        .agg(
            F.coalesce(F.sum("y"), F.lit(0)).alias("npos"),
            F.coalesce(
                F.sum(
                    F.when(F.col("y").isNotNull(), 1 - F.col("y"))
                ),
                F.lit(0),
            ).alias("nneg"),
        )
    )
    wexcl = Window.orderBy(F.asc("score_fp")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = h.select(
        "npos",
        "nneg",
        F.coalesce(F.sum("nneg").over(wexcl), F.lit(0)).alias("nneg_below"),
    )
    return c.agg(
        F.sum("npos").cast("long").alias("n_pos"),
        F.sum("nneg").cast("long").alias("n_neg"),
        (
            F.sum(F.col("npos") * (2 * F.col("nneg_below") + F.col("nneg")))
        ).cast("long").alias("wins2"),
    ).select(
        "n_pos",
        "n_neg",
        "wins2",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("wins2") / (2 * F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
    )


def group_trend(
    df: DataFrame,
    *,
    group_col: str,
    day_col: str,
    count_col: str = "n",
) -> DataFrame:
    """Per-group ordinary-least-squares trend slope over a daily count
    series — the drift detector that says not just "did the
    distribution shift" (q102) but in WHICH DIRECTION and HOW FAST each
    group's volume is moving. x = day index relative to the group's own
    first day (self-contained — no global calendar join), y = the daily
    count; slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx) computed from five
    exact int64 moments and finished by ONE IEEE division (the q81
    lesson: the numerator and denominator ship too, so the exactness
    claim is auditable in the output). NULL slope when the group has a
    single day (denominator 0). Day gaps are NOT densified — a missing
    day is absent, not zero; run gapfill (q117) upstream when zeros are
    the intended reading.

    Scale shape: one combiner groupBy to (group, day) counts, a
    group-sized broadcast join for each group's first day, one combiner
    groupBy for the moments — value-domain tables only, nothing
    row-scale past the first aggregate. Output: (group, n_days,
    slope_num, slope_den, slope)."""
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(day_col).alias("d")
    ).agg(F.coalesce(F.sum(count_col), F.lit(0)).cast("long").alias("y"))
    first = daily.groupBy("g").agg(F.min("d").alias("d0"))
    m = (
        daily.join(F.broadcast(first), "g")
        .select("g", F.datediff("d", "d0").cast("long").alias("x"), "y")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    return m.select(
        F.col("g").alias(group_col),
        F.col("n_days").cast("long").alias("n_days"),
        (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("slope_den"),
        F.when(
            (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")) > 0,
            (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")),
        ).alias("slope"),
    )


def wasserstein1(
    df: DataFrame,
    *,
    value_col: str = "v",
    group_col: str = "snap",
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between the integer
    value distributions of two snapshots — the drift metric that, unlike
    PSI (q102) or a chi-square (q104), respects the ORDER of the value
    domain: mass moved two buckets costs twice mass moved one. Uses the
    closed form W1 = ∫ |CDF_A - CDF_B| dx over the merged value domain:
    per distinct value the histogram gives (na_v, nb_v); an inclusive
    cumulative window yields cumA/cumB; each inter-value gap contributes
    |cumA * nB - cumB * nA| * gap — exact int64 under the common
    denominator nA*nB — and w1 = Σ / (nA * nB) is ONE IEEE division (the
    q174 doubled-numerator trick generalized to a common denominator).
    Group values must be exactly two after filtering; rows in neither
    snapshot are the caller's bug, not silently dropped — group_col is
    read as `= 0` (A) vs `<> 0` (B).

    Scale shape: corpus → one combiner groupBy to the value-domain
    histogram; the cumulative window and the gap lead() run over that
    HISTOGRAM only (q45 discipline); single-row finish. Overflow bound:
    max(cum) * max(n) * value_range summed over the domain must stay
    < 2^63 — fine for counts to ~1e6 over ranges to ~1e4; quantize the
    value domain coarser upstream when it is not. Output: one row
    (n_a, n_b, w1_num, w1)."""
    h = (
        df.select(
            F.col(value_col).cast("long").alias("x"),
            F.when(F.col(group_col) == 0, 1).otherwise(0).alias("a"),
        )
        .groupBy("x")
        .agg(
            F.sum("a").alias("na"),
            F.sum(1 - F.col("a")).alias("nb"),
        )
    )
    wincl = Window.orderBy(F.asc("x")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wnext = Window.orderBy(F.asc("x"))
    c = h.select(
        "x",
        "na",
        "nb",
        F.sum("na").over(wincl).alias("cuma"),
        F.sum("nb").over(wincl).alias("cumb"),
        F.lead("x").over(wnext).alias("xnext"),
    )
    tot = c.agg(
        F.coalesce(F.sum("na"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("nb"), F.lit(0)).cast("long").alias("n_b"),
    )
    num = (
        c.filter(F.col("xnext").isNotNull())
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.abs(
                    F.col("cuma") * F.col("n_b")
                    - F.col("cumb") * F.col("n_a")
                )
                * (F.col("xnext") - F.col("x"))
            )
            .cast("long")
            .alias("w1_num")
        )
    )
    # tot and num join back as 1-row broadcasts so a single-value domain
    # (no gaps -> empty sum) still reports the true totals with W1 = 0
    return tot.crossJoin(F.broadcast(num)).select(
        "n_a",
        "n_b",
        F.coalesce(F.col("w1_num"), F.lit(0)).alias("w1_num"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.coalesce(F.col("w1_num"), F.lit(0))
            / (F.col("n_a") * F.col("n_b")),
        ).alias("w1"),
    )


def ks_two_sample(
    df: DataFrame,
    *,
    value_col: str = "v",
    group_col: str = "snap",
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the integer
    value distributions of two snapshots — the sup-norm sibling of
    wasserstein1 (q103): W1 integrates |CDF_A - CDF_B| (total drift mass),
    KS takes its MAXIMUM (worst single-threshold divergence) — the right
    alarm when one narrow band of the distribution moved (a new crawl
    source injecting only very short docs barely moves W1 but spikes KS),
    and the statistic behind the standard two-sample test.

    Exactness: per distinct value the histogram gives (na_v, nb_v); the
    inclusive cumulative window yields cumA/cumB; D's numerator is
    max_v |cumA*nB - cumB*nA| — exact int64 under the common denominator
    nA*nB — and ships in the output (d_num) so the claim is auditable.
    ks_d = d_num/(nA*nB) is ONE IEEE division; ks_stat (the asymptotic
    test scale, sqrt(nA*nB/(nA+nB)) * D — compare against the K-alpha
    table, 1.358 for alpha=.05) is the FIXED SHAPE
    sqrt(cast-divide)*divide, identical IEEE ops in identical order on
    any engine. Group semantics match wasserstein1: group_col = 0 is A,
    anything else B; an empty side yields NULL ks_d/ks_stat, never a
    division by zero.

    Scale shape: corpus → ONE combiner groupBy to the value-domain
    histogram; the cumulative window runs over that HISTOGRAM only (q45
    discipline); single-row finish. Overflow bound: max(cum)*max(n) <
    2^63 — both sides to ~3e9 rows; shard the test past that (per-shard
    KS maxima are NOT combinable exactly — unlike W1 — so quantize the
    domain instead when one shard cannot hold a side's count). Output:
    one row (n_a, n_b, d_num, ks_d, ks_stat)."""
    h = (
        df.select(
            F.col(value_col).cast("long").alias("x"),
            F.when(F.col(group_col) == 0, 1).otherwise(0).alias("a"),
        )
        .groupBy("x")
        .agg(
            F.sum("a").alias("na"),
            F.sum(1 - F.col("a")).alias("nb"),
        )
    )
    wincl = Window.orderBy(F.asc("x")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.select(
        F.sum("na").over(wincl).alias("cuma"),
        F.sum("nb").over(wincl).alias("cumb"),
    )
    tot = h.agg(
        F.coalesce(F.sum("na"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("nb"), F.lit(0)).cast("long").alias("n_b"),
    )
    num = (
        c.crossJoin(F.broadcast(tot))
        .agg(
            F.coalesce(
                F.max(
                    F.abs(
                        F.col("cuma") * F.col("n_b")
                        - F.col("cumb") * F.col("n_a")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("d_num")
        )
    )
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    nd = (F.col("n_a") * F.col("n_b")).cast("double")
    ks_d = F.col("d_num") / (F.col("n_a") * F.col("n_b"))
    return tot.crossJoin(F.broadcast(num)).select(
        "n_a",
        "n_b",
        "d_num",
        F.when(both, F.round(ks_d, 6) + F.lit(0.0)).alias("ks_d"),
        F.when(
            both,
            F.round(
                F.sqrt(nd / (F.col("n_a") + F.col("n_b"))) * ks_d, 6
            )
            + F.lit(0.0),
        ).alias("ks_stat"),
    )


def signal_correlations(df: DataFrame, *, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation matrix over integer signal columns —
    which quality signals are REDUNDANT: a curation pipeline weighing
    n_tokens, n_chars, distinct counts, stopword counts (q14's family)
    reads this to drop the ones that move together. ONE aggregate pass
    computes every moment (n, each Sx/Sxx, every pairwise Sxy — Spark
    fuses them into a single scan with map-side partials, the
    profile_columns discipline); the pair table then pivots off that
    single row via an array-of-structs explode, driver-free.

    corr = (n*Sxy - Sx*Sy) / sqrt(n*Sxx - Sx²) / sqrt(n*Syy - Sy²):
    numerator and both denominators are exact int64 (and ship in the
    output, so the exactness is auditable); the finish is the FIXED
    SHAPE cast-divide-sqrt-divide — identical IEEE ops in identical
    order on any engine (the int64→double cast rounds to nearest the
    same way everywhere). NULL corr when a signal is constant
    (denominator 0). Overflow bound: n * max|x| * max|y| summed must
    stay < 2^63 — counts to ~1e5 over signal magnitudes to ~1e4 are
    safe; quantize coarser upstream past that. Output: one row per
    unordered pair, sig_a < sig_b lexicographic."""
    cs = sorted(cols)
    if len(cs) < 2:
        raise ValueError("signal_correlations needs >= 2 columns")
    if len(set(cs)) != len(cs):
        raise ValueError("signal_correlations columns must be distinct")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cs:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for i, a in enumerate(cs):
        for b in cs[i + 1 :]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    m = df.agg(*aggs)
    structs = []
    for i, a in enumerate(cs):
        for b in cs[i + 1 :]:
            num = F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(
                f"s_{b}"
            )
            dena = F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(
                f"s_{a}"
            )
            denb = F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(
                f"s_{b}"
            )
            structs.append(
                F.struct(
                    F.lit(a).alias("sig_a"),
                    F.lit(b).alias("sig_b"),
                    F.col("n").cast("long").alias("n"),
                    num.cast("long").alias("corr_num"),
                    dena.cast("long").alias("den_a"),
                    denb.cast("long").alias("den_b"),
                    F.when(
                        (dena > 0) & (denb > 0),
                        num.cast("double")
                        / F.sqrt(dena.cast("double"))
                        / F.sqrt(denb.cast("double")),
                    ).alias("corr"),
                )
            )
    return (
        m.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("sig_a", "sig_b")
    )


def mutual_information(
    df: DataFrame, *, x_col: str, y_col: str
) -> DataFrame:
    """Mutual information I(X;Y) between two categorical columns — the
    association-strength scalar completing the family: chi-square
    (source_chisq) asks "is the deviation surprising", kappa
    (cohens_kappa) scores rater agreement, MI measures how many nats
    knowing X tells you about Y — directly comparable across pairs and
    bounded by min(H(X), H(Y)). Per observed cell the term is
    (n_ij/n) * ln((n_ij*n)/(r_i*c_j)) — counts exact int64, the ln
    argument ONE division of exact integer products, the whole term a
    fixed shape both engines evaluate identically; zero cells
    contribute nothing (x ln x -> 0). The cell terms fold in (x, y)
    sorted order from a 0.0 seed (the q104 float-sum discipline) so the
    total is partition- and engine-invariant. NULL categories are
    dropped (MI over the observed joint distribution; NULL ordering
    differs across engines and a null category is an upstream bug).

    Scale shape: one combiner groupBy to the cell table (categories ×
    categories — value-domain, never row-scale), two category-sized
    margins broadcast back, one scalar total; the ordered fold runs
    over the cell list. Output: one row (n, n_cells, mi round-6)."""
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .agg(F.count(F.lit(1)).alias("nij"))
    )
    rx = cells.groupBy("x").agg(F.sum("nij").alias("rx"))
    cy = cells.groupBy("y").agg(F.sum("nij").alias("cy"))
    n = cells.agg(F.sum("nij").cast("long").alias("n"))
    terms = (
        cells.join(F.broadcast(rx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "x",
            "y",
            "n",
            (
                (F.col("nij").cast("double") / F.col("n"))
                * F.log(
                    (F.col("nij") * F.col("n")).cast("double")
                    / (F.col("rx") * F.col("cy")).cast("double")
                )
            ).alias("t"),
        )
    )
    return terms.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("x", "y", "t"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["t"],
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("mi"),
    )


def calibration_bins(
    df: DataFrame,
    *,
    score_col: str = "score_fp",
    label_col: str = "is_pos",
    n_bins: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Reliability table (calibration curve) — the third member of the
    eval family: pr_curve (q172) sweeps thresholds, auc_exact (q174)
    scores ranking, this asks whether the SCORE MEANS WHAT IT SAYS: in
    each score bin, does the positive fraction track the scores? The
    score arrives as integer fixed point in [0, scale]; bin =
    min((score * n_bins) DIV scale, n_bins - 1) is pure integer
    arithmetic (top-of-range scores fold into the last bin). Per bin
    the counts are exact int64; frac_pos and mean_score_fp are each ONE
    IEEE division of exact integers. A NULL label occupies the bin's n
    but never n_pos (the pr_curve convention). Empty bins are absent,
    not zero rows — the domain is data-defined.

    Scale shape: one combiner groupBy straight to the n_bins-sized
    table; no window, no sort beyond the final n_bins-row orderBy.
    Output: (bin, n, n_pos, frac_pos, mean_score_fp)."""
    if n_bins < 1:
        raise ValueError("calibration_bins needs n_bins >= 1")
    b = F.least(
        F.floor(
            (F.col(score_col).cast("long") * n_bins)
            / F.lit(int(scale)).cast("long")
        ).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )
    return (
        df.select(
            b.alias("bin"),
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("n_pos"),
            F.sum("s").alias("sum_s"),
        )
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            "n_pos",
            (F.col("n_pos") / F.col("n")).alias("frac_pos"),
            (F.col("sum_s") / F.col("n")).alias("mean_score_fp"),
        )
        .orderBy("bin")
    )


def corpus_quantile_bins(
    df: DataFrame,
    *,
    score_col: str = "score_fp",
    group_col: str = "source",
    n_bins: int = 10,
) -> DataFrame:
    """Rank-based cross-group score normalization: place every row at
    its CORPUS-WIDE quantile, then histogram each group over those
    quantile bins — the reading that says "source A's quality scores
    sit in the corpus' bottom deciles" even when sources use wildly
    different score ranges (the curation fix for heterogeneous-source
    score drift; grouped_value_percentiles answers the inverse
    question, per-group cut points). Quantile position is EXACT integer
    rank: below_s = rows with score strictly below s (an exclusive
    cumulative window over the score histogram — q45 discipline), and
    qbin = (below_s * n_bins) DIV n, pure integer arithmetic with no
    interpolation to diverge on. Ties share a bin by construction
    (equal scores have equal below-counts).

    Scale shape: one combiner groupBy to the score histogram, the
    exclusive window over that HISTOGRAM only, then the histogram —
    score-resolution-sized — broadcasts back onto the rows for the
    final (group, qbin) combiner count; nothing row-scale is ever
    sorted. Output: (group_col, qbin, n_rows), ordered."""
    if n_bins < 1:
        raise ValueError("corpus_quantile_bins needs n_bins >= 1")
    rows = df.select(
        F.col(group_col).alias("g"),
        F.col(score_col).cast("long").alias("s"),
    )
    h = rows.groupBy("s").agg(F.count(F.lit(1)).alias("ns"))
    wexcl = Window.orderBy(F.asc("s")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    qmap = h.select(
        "s", F.coalesce(F.sum("ns").over(wexcl), F.lit(0)).alias("below")
    )
    tot = h.agg(F.sum("ns").cast("long").alias("n"))
    return (
        rows.join(F.broadcast(qmap), "s")
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            F.floor((F.col("below") * n_bins) / F.col("n"))
            .cast("long")
            .alias("qbin"),
        )
        .groupBy("g", "qbin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(F.col("g").alias(group_col), "qbin", "n_rows")
        .orderBy(group_col, "qbin")
    )


def spearman_rho(
    df: DataFrame, *, x_col: str, y_col: str
) -> DataFrame:
    """Exact Spearman rank correlation with proper average-rank tie
    handling — the rank-based companion to signal_correlations' Pearson:
    Pearson asks "do they move together LINEARLY", Spearman asks "do
    they move together MONOTONICALLY", which is the right question for
    skewed quality signals where a log-shaped relation scores near zero
    linearly. Ranks come from the value-domain histograms (q45
    discipline — never a row-scale sort): the DOUBLED average rank of
    value v is 2·below_v + n_v + 1, an exact integer (the q174 doubling
    trick applied to midranks), and the doubled-rank mean is exactly
    n + 1, so deviations dx = rx2 − (n+1) are exact int64 with |dx| < n.
    rho = Σdx·dy / sqrt(Σdx²) / sqrt(Σdy²) — exact integer moments (the
    denominators ship in the output), fixed-shape cast-divide-sqrt-
    divide finish, NULL when either signal is constant. Rows with a
    NULL in either column are dropped (a rank for NULL is undefined).
    Overflow bound: Σ|dx·dy| ≤ n³ must stay < 2^63 — fine to n ≈ 2e6;
    pre-aggregate coarser upstream past that.

    Scale shape: two combiner groupBys to the per-column histograms,
    exclusive cumulative windows over those HISTOGRAMS only, two
    histogram-sized broadcast joins back onto the rows, one fused
    moment aggregate. Output: one row
    (n, sum_dxdy, sum_dx2, sum_dy2, rho)."""
    rows = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())

    def rank2_map(col: str):
        h = rows.groupBy(col).agg(F.count(F.lit(1)).alias("nv"))
        wexcl = Window.orderBy(F.asc(col)).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return h.select(
            col,
            (
                2 * F.coalesce(F.sum("nv").over(wexcl), F.lit(0))
                + F.col("nv")
                + 1
            ).alias(f"r2_{col}"),
        )

    tot = rows.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = (
        rows.join(F.broadcast(rank2_map("x")), "x")
        .join(F.broadcast(rank2_map("y")), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            (F.col("r2_x") - (F.col("n") + 1)).alias("dx"),
            (F.col("r2_y") - (F.col("n") + 1)).alias("dy"),
        )
    )
    m = ranked.agg(
        F.max("n").alias("n"),
        F.coalesce(F.sum(F.col("dx") * F.col("dy")), F.lit(0))
        .cast("long")
        .alias("sum_dxdy"),
        F.coalesce(F.sum(F.col("dx") * F.col("dx")), F.lit(0))
        .cast("long")
        .alias("sum_dx2"),
        F.coalesce(F.sum(F.col("dy") * F.col("dy")), F.lit(0))
        .cast("long")
        .alias("sum_dy2"),
    )
    return m.select(
        "n",
        "sum_dxdy",
        "sum_dx2",
        "sum_dy2",
        F.when(
            (F.col("sum_dx2") > 0) & (F.col("sum_dy2") > 0),
            F.col("sum_dxdy").cast("double")
            / F.sqrt(F.col("sum_dx2").cast("double"))
            / F.sqrt(F.col("sum_dy2").cast("double")),
        ).alias("rho"),
    )


def jackknife_mean_se(
    df: DataFrame,
    *,
    value_col: str = "v",
    id_col: str = "doc_id",
    n_shards: int = 10,
    salt: str = "jk",
) -> DataFrame:
    """Delete-one-shard jackknife standard error of a corpus mean — the
    error bar every corpus statistic here lacks: "mean tokens/doc is
    512.3" means nothing for monitoring until you know whether ±0.1 or
    ±50 is noise. RNG-free by the repo's standard trick: shards are md5
    buckets of the id, so the estimate is reproducible on any engine
    and any partitioning. Per shard the sums are exact int64; each
    leave-one-out mean m_i = (T - t_i)/(n - n_i) is ONE division of
    exact integers; their mean and the jackknife variance
    (S-1)/S · Σ(m_i - m̄)² fold over the SHARD-ORDERED list from a 0.0
    seed (the q104 float-sum discipline — S is tiny, the order is the
    portability point). NULL values count toward neither sum nor count.
    Degenerate guards: a shard equal to the whole corpus (every other
    shard empty) yields a NULL m_i divisor — filtered with n > n_i,
    mirrored in the oracle.

    Scale shape: one combiner groupBy to the S-row shard table;
    everything after is S-sized. Output: one row
    (n, n_shards_used, mean, jk_se round-6)."""
    if n_shards < 2:
        raise ValueError("jackknife needs n_shards >= 2")
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    per = (
        df.select(shard.alias("s"), F.col(value_col).cast("long").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("ni"),
            F.sum("v").alias("ti"),
        )
    )
    tot = per.agg(
        F.sum("ni").cast("long").alias("n"), F.sum("ti").cast("long").alias("t")
    )
    loo = (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("n") > F.col("ni"))
        .select(
            "s",
            "n",
            "t",
            (
                (F.col("t") - F.col("ti")).cast("double")
                / (F.col("n") - F.col("ni"))
            ).alias("m"),
        )
    )
    one = loo.agg(
        F.max("n").alias("n"),
        F.max("t").alias("t"),
        F.count(F.lit(1)).cast("long").alias("s_used"),
        F.array_sort(F.collect_list(F.struct("s", "m"))).alias("arr"),
    ).select(
        "n",
        "t",
        "s_used",
        "arr",
        (
            F.aggregate(
                F.col("arr"), F.lit(0.0), lambda acc, x: acc + x["m"]
            )
            / F.col("s_used")
        ).alias("mbar"),
    )
    return one.select(
        "n",
        F.col("s_used").alias("n_shards_used"),
        (F.col("t") / F.col("n")).alias("mean"),
        (
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.col("arr"),
                        F.lit(0.0),
                        lambda acc, x: acc
                        + (x["m"] - F.col("mbar"))
                        * (x["m"] - F.col("mbar")),
                    )
                    * (F.col("s_used") - 1)
                    / F.col("s_used")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("jk_se"),
    )


def kendall_tau(
    df: DataFrame, *, x_col: str, y_col: str
) -> DataFrame:
    """Exact Kendall tau-b — the third correlation question: Pearson
    (linear), Spearman (monotone via ranks), Kendall (pairwise ORDER
    AGREEMENT: of all row pairs, how many are concordant minus
    discordant, tie-corrected). Tau-b is the robust choice when both
    signals are coarse integers riddled with ties — exactly the shape
    of doc-level count features — because the b-correction discounts
    tied pairs from the denominator instead of diluting the statistic.

    The pair census never touches row pairs: it runs on the JOINT
    (x, y) VALUE-CELL histogram (the q45/q189 domain discipline, one
    dimension up). For cells in strict lex order, x1<x2 ∧ y1<y2 adds
    h1·h2 concordant, x1<x2 ∧ y1>y2 adds h1·h2 discordant; equal-x or
    equal-y cell pairs are tie pairs, counted in closed form from the
    marginal histograms (Σ t(t−1)/2). All counts exact int64;
    tau_b = (C−D) / (sqrt(n0−n1)·sqrt(n0−n2)) is the one fixed-shape
    float finish (separate sqrts — the product can pass 2^63 where the
    factors cannot). NULL rows drop; tau_b NULL if either signal is
    constant.

    Scale shape: one combiner groupBy to the joint histogram, a
    cell×cell join bounded by DISTINCT-cell count squared (≪ rows² for
    integer signals; pre-bucket coarser if the domain explodes), two
    marginal aggregates. Output: one row
    (n, concordant, discordant, ties_x, ties_y, tau_b)."""
    rows = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    cells = rows.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("h")
    ).localCheckpoint(eager=False)
    a, b = cells.alias("a"), cells.alias("b")
    lex = (F.col("a.x") < F.col("b.x")) | (
        (F.col("a.x") == F.col("b.x")) & (F.col("a.y") < F.col("b.y"))
    )
    pair = (
        a.join(b, lex)
        .select(
            F.when(
                (F.col("a.x") < F.col("b.x")) & (F.col("a.y") < F.col("b.y")),
                F.col("a.h") * F.col("b.h"),
            )
            .otherwise(F.lit(0))
            .alias("c"),
            F.when(
                (F.col("a.x") < F.col("b.x")) & (F.col("a.y") > F.col("b.y")),
                F.col("a.h") * F.col("b.h"),
            )
            .otherwise(F.lit(0))
            .alias("d"),
        )
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("concordant"),
            F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("discordant"),
        )
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("h").alias("t"))
        .agg(
            F.coalesce(
                F.sum((F.col("t") * (F.col("t") - 1) / 2).cast("long")),
                F.lit(0),
            ).cast("long").alias("ties_x"),
            F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n"),
        )
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("h").alias("t"))
        .agg(
            F.coalesce(
                F.sum((F.col("t") * (F.col("t") - 1) / 2).cast("long")),
                F.lit(0),
            ).cast("long").alias("ties_y")
        )
    )
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    denom = F.sqrt((n0 - F.col("ties_x")).cast("double")) * F.sqrt(
        (n0 - F.col("ties_y")).cast("double")
    )
    return (
        pair.crossJoin(tx)
        .crossJoin(ty)
        .select(
            "n",
            "concordant",
            "discordant",
            "ties_x",
            "ties_y",
            F.when(
                (n0 > F.col("ties_x")) & (n0 > F.col("ties_y")),
                (F.col("concordant") - F.col("discordant")).cast("double")
                / denom,
            ).alias("tau_b"),
        )
    )


def constraint_profile(
    tables: dict[str, DataFrame],
    *,
    fds: list[tuple[str, str, str]],
    inds: list[tuple[str, str, str, str]],
) -> DataFrame:
    """Schema-constraint discovery over a table audit list — the data
    profiler that tells an engine what the catalog does not: which
    functional dependencies (X → Y iff |distinct X| = |distinct (X,Y)|)
    and inclusion dependencies (FK candidates: values(A.x) ⊆
    values(B.y), checked as a distinct left-anti count) actually HOLD
    in the data. FDs that hold license aggregation pushdown and
    dimension collapsing; INDs that hold license join reordering and
    referential bucketing — the discovered constraints feed exactly the
    physical decisions the rest of this repo makes by hand.

    Every check is exact integer: two distinct-counts per FD, one
    distinct left-anti count per IND; violations are REPORTED as counts
    (n_check = surplus pairs / missing FK values), never just a
    boolean. Each check is a tiny aggregate; the audit result is their
    union — at warehouse scale each distinct-count is one
    combiner-friendly pass over its own table, embarrassingly parallel
    across checks. Output: (kind, cname, n_lhs, n_check, holds)."""
    spark = next(iter(tables.values())).sparkSession
    rows = []
    for t, lhs, rhs in fds:
        df = tables[t]
        n_lhs = df.select(lhs).distinct().count()
        n_pairs = df.select(lhs, rhs).distinct().count()
        rows.append(
            ("fd", f"{t}.{lhs} -> {t}.{rhs}", n_lhs, n_pairs,
             n_lhs == n_pairs)
        )
    for t1, c1, t2, c2 in inds:
        lhs_vals = tables[t1].select(F.col(c1).alias("v")).distinct()
        rhs_vals = tables[t2].select(F.col(c2).alias("v")).distinct()
        n_lhs = lhs_vals.count()
        n_missing = lhs_vals.join(rhs_vals, "v", "left_anti").count()
        rows.append(
            ("ind", f"{t1}.{c1} subset-of {t2}.{c2}", n_lhs, n_missing,
             n_missing == 0)
        )
    return spark.createDataFrame(
        rows,
        "kind string, cname string, n_lhs long, n_check long,"
        " holds boolean",
    )


def burrows_delta(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Burrows' Delta stylometric distance between sources — the
    authorship/style-drift measure built on MARKER-WORD rates, not
    content: Delta(a, b) = mean over the top-k corpus-frequency words
    of |z_a − z_b|, where z standardizes each marker's per-mille rate
    across sources. Two crawls of the same template farm sit at tiny
    Delta even when their topics differ; a styled source stands out —
    the complement to content-level drift (chi-square/KS/PSI).

    Determinism: marker rates are one exact division of int64 counts
    (c·1e6 / tot); every cross-source float sum (marker means, squared
    deviations, the final |z|-fold) runs over a DOMAIN-bounded table
    (sources × markers) in a FIXED sort order via array_sort +
    sequential aggregate — the q44 fold discipline applied to the
    source domain. Marker selection cuts the vocab at (count DESC,
    token ASC), a deterministic total order. Zero cells are densified
    (a marker a source never uses is rate 0, the strongest style
    signal there is). Constant markers (σ = 0) contribute 0.

    Scale shape: ONE corpus-scale groupBy(source, token); everything
    after lives on sources × top_k cells. Output:
    (src_a, src_b, n_markers, delta) for src_a < src_b."""
    from pathhier_spark.operators.textstats import _tokens

    counts = (
        docs.where(F.col(text_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.explode(_tokens(text_col)).alias("tok"),
        )
        .groupBy("g", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    markers = (
        counts.groupBy("tok")
        .agg(F.sum("c").cast("long").alias("tc"))
        .orderBy(F.desc("tc"), "tok")
        .limit(top_k)
        .select("tok")
    )
    tots = counts.groupBy("g").agg(F.sum("c").cast("long").alias("tot"))
    dense = (
        tots.crossJoin(F.broadcast(markers))
        .join(counts, ["g", "tok"], "left")
        .select(
            "g",
            "tok",
            (
                (F.coalesce(F.col("c"), F.lit(0)) * F.lit(1_000_000))
                .cast("double")
                / F.col("tot").cast("double")
            ).alias("rate"),
        )
        .localCheckpoint(eager=False)
    )
    n_src = dense.select("g").distinct().count()

    def gfold(col):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("g", F.col(col).alias("v")))),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    mu = dense.groupBy("tok").agg(
        (gfold("rate") / F.lit(float(n_src))).alias("mu")
    )
    dev = dense.join(mu, "tok").select(
        "g", "tok", "rate", "mu",
        ((F.col("rate") - F.col("mu")) * (F.col("rate") - F.col("mu"))).alias("sq"),
    )
    sig = dev.groupBy("tok").agg(
        F.sqrt(gfold("sq") / F.lit(float(n_src))).alias("sigma")
    )
    z = (
        dense.join(mu, "tok")
        .join(sig, "tok")
        .select(
            "g",
            "tok",
            F.when(
                F.col("sigma") > 0,
                (F.col("rate") - F.col("mu")) / F.col("sigma"),
            )
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
    )
    a, b = z.alias("a"), z.alias("b")
    pair = a.join(
        b,
        (F.col("a.tok") == F.col("b.tok")) & (F.col("a.g") < F.col("b.g")),
    ).select(
        F.col("a.g").alias("src_a"),
        F.col("b.g").alias("src_b"),
        F.col("a.tok").alias("tok"),
        F.abs(F.col("a.z") - F.col("b.z")).alias("az"),
    )
    return pair.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_markers"),
        (
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tok", "az"))),
                    lambda s: s["az"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("delta"),
    )


def k_anonymity_audit(
    df: DataFrame,
    *,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """k-anonymity + l-diversity audit over quasi-identifier classes —
    the release-side privacy check that PII SCRUBBING (q37/q42) cannot
    give: scrubbing removes direct identifiers, but a quasi-identifier
    combination shared by fewer than k rows re-identifies by JOINING
    with outside data, and a class whose sensitive attribute takes
    fewer than l distinct values leaks it even at size ≥ k (the
    homogeneity attack). Before a corpus slice ships, this is the
    table a privacy review reads.

    Exact and combiner-friendly: ONE groupBy over the QI columns
    computes class size and distinct-sensitive count; violations are
    REPORTED per class with the exact counts (the no-bare-booleans
    discipline), never pre-suppressed — suppression policy belongs to
    the caller. NULL QI values form their own class (NULL is itself a
    linkable value). Output: (*qi_cols, class_size, n_sensitive,
    k_violation, l_violation)."""
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.countDistinct(F.col(sensitive_col))
            .cast("long")
            .alias("n_sensitive"),
        )
        .select(
            *qi_cols,
            "class_size",
            "n_sensitive",
            (F.col("class_size") < k).alias("k_violation"),
            (F.col("n_sensitive") < l_div).alias("l_violation"),
        )
    )


def benford_digit_test(
    df: DataFrame,
    *,
    value_col: str = "value",
) -> DataFrame:
    """Benford's-law first-digit test over integer cents — the
    forensic data-quality classic: organically-generated magnitudes
    follow P(d) = log10(1 + 1/d); fabricated, clipped, or
    unit-converted values don't, and the per-digit deviations say
    WHERE the distribution broke. Complements the schema profiler
    (q91) and constraint discovery (q213): those check structure,
    this checks the VALUES' generative plausibility.

    Exact observed counts from one combiner groupBy on the first
    digit of floor(value·100) (rows < 1 cent drop); expectations and
    chi-square terms are fixed scalar expressions of (n, d); the total
    chi2 folds the 9 digit terms in DIGIT order (array_sort +
    sequential aggregate — the fixed-order float discipline), then
    broadcasts back onto the 9-row digit table.
    Output: (digit, observed, expected, chi2_term, chi2_total)."""
    cents = F.floor(F.col(value_col) * F.lit(100.0)).cast("long")
    obs = (
        df.where(F.col(value_col).isNotNull())
        .select(cents.alias("c"))
        .where(F.col("c") >= 1)
        .select(
            F.substring(F.col("c").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    digits = obs.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    n = obs.agg(F.sum("observed")).collect()[0][0] or 0
    dense = digits.join(obs, "digit", "left").select(
        "digit",
        F.coalesce(F.col("observed"), F.lit(0)).cast("long").alias("observed"),
    )
    expected = F.lit(float(n)) * F.log10(
        F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
    )
    scored = dense.select(
        "digit",
        "observed",
        expected.alias("expected"),
        (
            (F.col("observed").cast("double") - expected)
            * (F.col("observed").cast("double") - expected)
            / expected
        ).alias("chi2_term"),
    )
    total = scored.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("digit", "chi2_term"))),
                lambda s: s["chi2_term"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("chi2_total")
    )
    return scored.crossJoin(F.broadcast(total))


def _v_optimal_driver(spark, vtype, rows, n_buckets: int) -> DataFrame:
    """Driver-side finish of the V-optimal DP for domain-bounded frequency
    vectors — bit-identical arithmetic to the distributed layered DP: the
    same prefix int64 sums, the same SSE double expression, the same
    lexicographic (cost, split) min. `rows` is the (v, f) frequency vector
    already sorted by v."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        DoubleType,
        StructField,
        StructType,
    )

    n = len(rows)
    schema = StructType(
        [
            StructField("bucket", IntegerType()),
            StructField("lo", vtype),
            StructField("hi", vtype),
            StructField("n_values", LongType()),
            StructField("total_freq", LongType()),
            StructField("sse", DoubleType()),
        ]
    )
    if n == 0:
        return spark.createDataFrame([], schema)
    vs = [r["v"] for r in rows]
    cf = [0] * (n + 1)
    cf2 = [0] * (n + 1)
    for i, r in enumerate(rows, start=1):
        f = int(r["f"])
        cf[i] = cf[i - 1] + f
        cf2[i] = cf2[i - 1] + f * f

    def sse(s: int, e: int) -> float:
        tot = float(cf[e] - cf[s])
        return float(cf2[e] - cf2[s]) - tot * tot / float(e - s)

    k = min(n_buckets, n)
    # cost[j][e]: min total SSE of splitting 1..e into j buckets;
    # split[j][e]: the argmin boundary (lexicographic min on (cost, s),
    # exactly the distributed min(struct(tc, s)))
    cost = [0.0] + [sse(0, e) for e in range(1, n + 1)]
    split = [0] * (n + 1)
    tables = []
    for _j in range(2, k + 1):
        nc = [0.0] * (n + 1)
        ns = [0] * (n + 1)
        for e in range(1, n + 1):
            best = None
            for s in range(1, e):
                tc = cost[s] + sse(s, e)
                if best is None or (tc, s) < best:
                    best = (tc, s)
            if best is None:  # e == 1 in layer j >= 2: unreachable split
                best = (cost[e], split[e])
            nc[e], ns[e] = best
        cost, split = nc, ns
        tables.append((nc, ns))
    bounds = [n]
    cur = n
    for j in range(k, 1, -1):
        cur = tables[j - 2][1][cur] if tables else split[cur]
        bounds.append(cur)
    bounds.append(0)
    bounds = bounds[::-1]
    out = []
    for bi in range(len(bounds) - 1):
        s, e = bounds[bi], bounds[bi + 1]
        out.append(
            (
                bi + 1,
                vs[s],
                vs[e - 1],
                e - s,
                cf[e] - cf[s],
                sse(s, e),
            )
        )
    return spark.createDataFrame(out, schema)


def v_optimal_histogram(
    df: DataFrame,
    *,
    value_col: str,
    n_buckets: int = 4,
    driver_finish: int = 4096,
) -> DataFrame:
    """V-optimal histogram construction — the optimizer-statistics
    classic (Ioannidis/Poosala): partition the value DOMAIN into
    `n_buckets` contiguous buckets minimizing total within-bucket
    frequency variance, the histogram that provably minimizes
    equality-selectivity estimation error. Equi-width and equi-depth
    (q118) are the cheap defaults; this is the exact optimum they
    approximate — and the constraint/profiling family's (q91/q213)
    natural capstone: discovered stats feeding the same CBO decisions.

    Exact layered DP on the VALUE-DOMAIN frequency vector (domain-
    bounded, the q45 exemption): prefix Σf and Σf² are int64 cumulative
    windows; SSE(a..b) is one fixed scalar expression of those
    integers; layer j's Ej[i] = min_s E_{j-1}[s] + SSE(s+1..i) takes
    the min of a lexicographic (cost, split) struct — bit-identical
    doubles, deterministic ties — and backtracking walks the argmin
    tables. Corpus-scale work is ONE combiner groupBy to the frequency
    vector; the DP is O(k·domain²) on the domain table.
    Output: (bucket, lo, hi, n_values, total_freq, sse) — `sse` is the
    bucket's own within-bucket frequency variance term.

    Domains at or below ``driver_finish`` distinct values run the DP on
    the driver (the Borůvka Kruskal-finish discipline, graph.py): the
    corpus-scale groupBy is the only cluster job, its ≤driver_finish-row
    frequency vector is collected once, and the O(k·domain²) DP — pure
    scalar arithmetic with zero data parallelism to exploit — runs in
    Python instead of as ~2k+4 driver-orchestrated micro-jobs
    (checkpoint/collect per layer). Every float op is the same IEEE
    double expression in the same order, so the buckets are
    bit-identical to the distributed path (asserted in tests); larger
    domains (where the collect would be unbounded) keep the distributed
    layered DP."""
    freq = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    rows = freq.orderBy("v").limit(driver_finish + 1).collect()
    if len(rows) <= driver_finish:
        return _v_optimal_driver(df.sparkSession, freq.schema["v"].dataType,
                                 rows, n_buckets)
    wv = Window.orderBy("v")
    pts = freq.select(
        "v",
        "f",
        F.row_number().over(wv).cast("long").alias("i"),
        F.sum("f").over(wv).cast("long").alias("cf"),
        F.sum(F.col("f") * F.col("f")).over(wv).cast("long").alias("cf2"),
    ).localCheckpoint(eager=True)
    n = pts.count()
    if n == 0:
        return df.sparkSession.createDataFrame(
            [],
            "bucket int, lo long, hi long, n_values long, total_freq long,"
            " sse double",
        )
    k = min(n_buckets, n)
    zero = pts.sparkSession.createDataFrame(
        [(0, 0, 0)], "i long, cf long, cf2 long"
    )
    pref = pts.select("i", "cf", "cf2").union(zero)

    def sse(cf2_b, cf2_a, cf_b, cf_a, cnt):
        tot = (cf_b - cf_a).cast("double")
        return (cf2_b - cf2_a).cast("double") - tot * tot / cnt.cast(
            "double"
        )

    a = pref.select(
        F.col("i").alias("s"),
        F.col("cf").alias("cf_a"),
        F.col("cf2").alias("cf2_a"),
    )
    b = pts.select(
        F.col("i").alias("e"),
        F.col("cf").alias("cf_b"),
        F.col("cf2").alias("cf2_b"),
    )
    seg = a.join(b, F.col("s") < F.col("e")).select(
        "s",
        "e",
        sse(
            F.col("cf2_b"), F.col("cf2_a"), F.col("cf_b"), F.col("cf_a"),
            F.col("e") - F.col("s"),
        ).alias("c"),
    ).localCheckpoint(eager=True)
    layer = seg.where(F.col("s") == 0).select(
        "e", F.col("c").alias("cost"), F.lit(0).cast("long").alias("split")
    )
    layers = {1: layer.localCheckpoint(eager=True)}
    for j in range(2, k + 1):
        prev = layers[j - 1].select(
            F.col("e").alias("s"), F.col("cost").alias("pcost")
        )
        cand = prev.join(seg, "s").select(
            "e",
            (F.col("pcost") + F.col("c")).alias("tc"),
            F.col("s"),
        )
        layers[j] = (
            cand.groupBy("e")
            .agg(F.min(F.struct("tc", "s")).alias("m"))
            .select(
                "e",
                F.col("m.tc").alias("cost"),
                F.col("m.s").alias("split"),
            )
            .localCheckpoint(eager=True)
        )
    # backtrack boundaries on the driver (k scalars)
    bounds = [int(n)]
    cur = int(n)
    for j in range(k, 1, -1):
        row = layers[j].where(F.col("e") == cur).collect()[0]
        cur = int(row["split"])
        bounds.append(cur)
    bounds.append(0)
    bounds = bounds[::-1]  # [0, b1, ..., n]
    spark = df.sparkSession
    cuts = spark.createDataFrame(
        [
            (bi + 1, bounds[bi], bounds[bi + 1])
            for bi in range(len(bounds) - 1)
        ],
        "bucket int, s long, e long",
    )
    lo = pts.select((F.col("i") - 1).alias("s"), F.col("v").alias("lo"))
    hi = pts.select(F.col("i").alias("e"), F.col("v").alias("hi"))
    cfs = pref.select(F.col("i").alias("s"), F.col("cf").alias("cfs"))
    cfe = pref.select(F.col("i").alias("e"), F.col("cf").alias("cfe"))
    return (
        cuts.join(seg, ["s", "e"])
        .join(lo, "s")
        .join(hi, "e")
        .join(cfs, "s")
        .join(cfe, "e")
        .select(
            "bucket",
            "lo",
            "hi",
            (F.col("e") - F.col("s")).cast("long").alias("n_values"),
            (F.col("cfe") - F.col("cfs")).cast("long").alias("total_freq"),
            F.col("c").alias("sse"),
        )
        .orderBy("bucket")
    )


def fd_mode_repair(
    df: DataFrame,
    *,
    lhs_col: str,
    rhs_col: str,
) -> DataFrame:
    """Minimal-change repair for an ALMOST-holding functional dependency
    (the HoloClean-lite rule-repair step downstream of q213's
    discovery): for each LHS class, the majority RHS value is the
    repair target and every disagreeing row is a REPORTED repair —
    never silently rewritten; the audit table is the output, and the
    caller applies it (the q220 suppression-policy discipline).

    Exact: one combiner groupBy to (lhs, rhs) counts; majority per LHS
    via a count-DESC/value-ASC row_number (deterministic ties); repair
    counts are exact integer differences. Output per LHS class:
    (lhs, majority_rhs, n_rows, n_values, n_repaired)."""
    cells = (
        df.where(F.col(lhs_col).isNotNull() & F.col(rhs_col).isNotNull())
        .groupBy(F.col(lhs_col).alias("l"), F.col(rhs_col).alias("r"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("l").orderBy(F.desc("c"), F.asc("r"))
    per_l = cells.groupBy("l").agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
    )
    maj = (
        cells.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("l", F.col("r").alias("majority_rhs"), F.col("c").alias("mc"))
    )
    return (
        per_l.join(maj, "l")
        .select(
            F.col("l").alias(lhs_col),
            "majority_rhs",
            "n_rows",
            "n_values",
            (F.col("n_rows") - F.col("mc")).cast("long").alias("n_repaired"),
        )
    )
