"""Temporal joins Spark's DataFrame API lacks as primitives — as-of join
and interval/range join — built as compositions of existing operators (the
SURVEY custom-operator rule: composition first, Pandas UDF only if
semantics demand it; these don't).

Both are staples of event-log / time-series work at warehouse scale
(enrich each event with the latest dimension snapshot; attribute points to
intervals) where the naive formulations — per-row subqueries, or a
BroadcastNestedLoopJoin over an inequality predicate — collapse at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: every left row gains the right row with the
    LARGEST right_ts <= left_ts for the same key (inclusive, matching
    DuckDB/pandas `merge_asof` backward semantics); unmatched left rows
    keep NULLs (left-outer).

    Implementation is the union-and-window composition: tag both sides,
    union on (key, ts, side, right-payload-struct), and take
    `last(payload, ignorenulls=True)` over a window ordered by
    (ts, side) with right rows sorting BEFORE left rows at equal ts —
    one shuffle of both sides on the key, one sort, no inequality join
    anywhere. That is the optimal distributed shape: each key's timeline
    is merged exactly once, vs. the per-left-row probe of a naive
    inequality join. Hot keys concentrate on single partitions like any
    keyed window; at production scale pre-bucket both tables on the key
    (sources/warehouse.write_bucketed) and the shuffle disappears too.

    Right-side (key, ts) pairs should be unique for deterministic output
    (true after any sensible snapshot dedup); with duplicates the last in
    (ts, payload-struct) order wins — still deterministic, but pick your
    own tie-break upstream if it matters. Right rows with a NULL timestamp
    are dropped (a NULL ts can never satisfy ts <= left_ts — matching
    DuckDB ASOF and pandas merge_asof, where they would otherwise sort
    first and become a universal fallback match); left rows with NULL
    left_ts sort before every right row and correctly match nothing.
    Right rows with a NULL key are dropped for the same reason:
    Window.partitionBy groups NULLs together, so a NULL-key left row
    would otherwise match a NULL-key right row — unlike DuckDB ASOF /
    pandas merge_asof / any equi-join, where NULL never equals NULL
    (NULL-key left rows still come through with NULL payload)."""
    right = right.filter(
        F.col(right_ts).isNotNull() & F.col(on).isNotNull()
    )
    lcols = left.columns
    rpay = [c for c in right.columns if c not in (on, right_ts)]
    pay_struct = F.struct(
        F.col(right_ts).alias("_pts"), *[F.col(c) for c in rpay]
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        pay_struct.alias("_pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols
          if c != on],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        *[F.col(c) for c in lcols if c != on],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side", "_pay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_match", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select(
        *[F.col(c) for c in lcols],
        F.col("_match._pts").alias(f"{right_prefix}{right_ts}"),
        *[F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in rpay],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str | None,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Interval join — point in [start, end) — via BIN BUCKETING: both
    sides map their time values onto fixed `bin_seconds` buckets (an
    interval explodes into every bucket it overlaps), the join is then a
    plain EQUI-join on (key, bin) with the exact BETWEEN predicate as a
    post-filter. Catalyst's native plan for an inequality-only join is a
    BroadcastNestedLoopJoin — O(points x intervals) and a scale killer;
    binning turns it into a hash join whose per-bucket work is bounded by
    interval density. Choose bin_seconds near the median interval length:
    too small explodes interval rows, too large packs unrelated points
    into shared buckets.

    A point's bucket appears in an interval's exploded bucket list at most
    once, so no dedup is needed. `on=None` joins on the bin alone
    (global intervals); how='left' keeps unmatched points with NULL
    interval columns (matches are still exact)."""
    b = F.lit(int(bin_seconds))
    p = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts_col)) / b)
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    keys = ["_bin"] if on is None else [on, "_bin"]
    cond_in = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) < F.col(end_col)
    )
    hit = p.join(i, keys).filter(cond_in).drop("_bin")
    if how == "inner":
        return hit
    if how == "left":
        icols = [c for c in intervals.columns if c not in points.columns
                 and c != (on or "")]
        # NULL-safe anti-join: a matched point carrying a NULL in any
        # column would never equal itself under plain equality and would
        # be emitted a second time as unmatched
        matched = hit.select(*points.columns).distinct()
        renamed = matched.select(
            *[F.col(c).alias(f"_m_{c}") for c in points.columns]
        )
        cond = None
        for c in points.columns:
            eq = points[c].eqNullSafe(renamed[f"_m_{c}"])
            cond = eq if cond is None else (cond & eq)
        missed = points.join(renamed, cond, "left_anti").select(
            *points.columns,
            *[F.lit(None).cast(intervals.schema[c].dataType).alias(c)
              for c in icols],
        )
        return hit.unionByName(missed)
    raise ValueError(f"unsupported how={how!r}")


def transition_matrix(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each user's events in (ts, tiebreak) order, every adjacent pair
    (event i, event i+1) contributes one (src_event, dst_event) transition;
    output is (src_event, dst_event, n_trans, prob) where prob is the
    row-normalized conditional P(dst | src). The classic behavioural-model
    aggregate downstream of sessionize (q16) — funnel (q87) and retention
    (q76) ask "did X happen"; the transition matrix asks "what follows X",
    which is what journey mining, anomaly scoring, and next-event
    prediction consume.

    Determinism: the successor is lead() over (ts, tiebreak) — the same
    total order q16's sessionizer uses — so ties never flip pairs between
    engines. prob is computed from the two integer counts at the very end
    (one division, round-6), never accumulated in floats.

    Scale shape: one shuffle by user (the lead window — per-user state,
    bounded by a user's event count, the same partitioning sessionize
    already established, so a pipeline computing both reuses the
    exchange); then one combiner-friendly groupBy whose cardinality is
    |event types|^2 — tiny. The row-sum join is broadcast (matrix-sized)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(type_col).alias("src_event"),
        )
        .withColumn("dst_event", F.lead("src_event").over(w))
        .where(F.col("dst_event").isNotNull())
    )
    counts = pairs.groupBy("src_event", "dst_event").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    totals = counts.groupBy("src_event").agg(
        F.sum("n_trans").alias("n_src")
    )
    return counts.join(F.broadcast(totals), "src_event").select(
        "src_event",
        "dst_event",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double") / F.col("n_src"), 6
        ).alias("prob"),
    )


def sliding_window_distinct(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Exact trailing-window activity metrics per day: for each calendar
    day present in the data, the event count and DISTINCT active-key
    count over the trailing ``window_days`` window — the rolling-WAU/MAU
    family, computed EXACTLY.

    Exact sliding distincts cannot be built from per-day distinct counts
    (distinct does not re-aggregate), and a windowed countDistinct over
    raw events would sort the full stream. The scale shape used here:

    1. collapse the stream ONCE to distinct (day, key) pairs — the only
       event-volume shuffle, and a combiner-friendly one;
    2. explode each pair into the <= ``window_days`` output days it
       contributes to (bounded constant fan-out, map-side);
    3. semi-join to the observed-day domain and countDistinct per
       output day — cardinality bounded by days x keys, not events.

    Rolling event counts ride the same contribution explode off the
    tiny per-day totals table. All-integer output — hash-exact.

    Returns (day, n_events_day, n_users_day, n_events_win, n_users_win)
    ordered by day, where *_win covers [day - window_days + 1, day].
    """
    d = F.to_date(F.col(ts_col)).alias("day")
    days = events.select(d).distinct()
    span = F.sequence(
        F.col("day"), F.date_add(F.col("day"), window_days - 1)
    )
    pairs = events.select(d, F.col(key_col).alias("k")).distinct()
    u_win = (
        pairs.select(F.explode(span).alias("day"), "k")
        .join(days, "day")  # only observed days emit output rows
        .groupBy("day")
        .agg(F.countDistinct("k").cast("long").alias("n_users_win"))
    )
    daily = events.select(d, F.col(key_col).alias("k")).groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events_day"),
        F.countDistinct("k").cast("long").alias("n_users_day"),
    )
    e_win = (
        daily.select(
            F.explode(span).alias("day"), F.col("n_events_day").alias("ne")
        )
        .join(days, "day")
        .groupBy("day")
        .agg(F.sum("ne").cast("long").alias("n_events_win"))
    )
    return (
        daily.join(u_win, "day").join(e_win, "day").select(
            "day", "n_events_day", "n_users_day", "n_events_win",
            "n_users_win",
        )
    )


def gapfill_locf(
    df: DataFrame,
    *,
    series_col: str = "series",
    day_col: str = "day",
    value_col: str = "value",
) -> DataFrame:
    """Time-series gap-fill with last-observation-carried-forward — the
    hypertable companion to the q49 rollup: densify each series to every
    day between its own first and last observation, then fill missing
    days with the most recent prior value. Input: one row per (series,
    day) with an exact-integer value (quantize floats to cents FIRST —
    the q49 discipline — so the fill is bit-portable). Output adds
    is_gap (1 = synthesized row).

    Plan: per-series span is one min/max combiner groupBy (series-count
    rows); the dense grid is an in-row sequence+explode of that tiny
    table — span * series rows, never event rows; observations join back
    on (series, day); the fill is ONE window per series
    (last(ignorenulls) over rows unbounded-preceding..current), i.e.
    partitioned by series key and therefore fully parallel across
    series — no global sort, no SinglePartition. Leading gaps (before a
    series' first observation) cannot exist by construction since the
    grid starts at the first observed day."""
    span = df.groupBy(F.col(series_col).alias("s")).agg(
        F.min(day_col).alias("d0"), F.max(day_col).alias("d1")
    )
    grid = span.select(
        "s",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    obs = df.select(
        F.col(series_col).alias("s"),
        F.col(day_col).alias("day"),
        F.col(value_col).alias("v"),
    )
    joined = grid.join(obs, ["s", "day"], "left")
    w = (
        Window.partitionBy("s")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("s").alias(series_col),
        F.col("day").alias(day_col),
        F.last("v", ignorenulls=True).over(w).alias(value_col),
        F.when(F.col("v").isNull(), 1).otherwise(0).cast("long").alias(
            "is_gap"
        ),
    )


def change_intervals(
    df: DataFrame,
    *,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Change-point intervalization (SCD Type 2 without the warehouse):
    collapse each key's time-ordered value sequence into maximal runs of
    the same value, emitting one row per run with its validity interval
    [valid_from, valid_to) — valid_to is the NEXT run's start, NULL for
    the still-open run. This is how a fact stream becomes a versioned
    dimension: the KG's "value of attribute A for entity E during
    [t1, t2)" surface.

    Plan: the classic gaps-and-islands pair of windows, both PARTITIONED
    BY KEY (parallel across keys, no global order): (1) a change flag
    via lag(value) with a running sum assigning run ids, (2) after the
    per-run groupBy, lead(valid_from) supplies valid_to. `tiebreak_col`
    makes the order total when timestamps can tie (pass the event id) —
    without a total order the run boundaries would be
    partition-dependent. Output: (key, value, valid_from, valid_to,
    n_events)."""
    order_cols = [F.col(ts_col)]
    if tiebreak_col is not None:
        order_cols.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    tb = (
        F.col(tiebreak_col)
        if tiebreak_col is not None
        else F.lit(0)
    )
    flagged = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        tb.alias("tb"),
        F.col(value_col).alias("v"),
        F.when(
            F.lag(F.col(value_col)).over(w).isNull()
            | (F.lag(F.col(value_col)).over(w) != F.col(value_col)),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    # the running sum must walk the IDENTICAL total order the lag used —
    # ordering by anything else would mis-assign run ids on ts ties
    w2 = (
        Window.partitionBy("k")
        .orderBy("t", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = flagged.withColumn("run_id", F.sum("chg").over(w2))
    grouped = runs.groupBy("k", "run_id").agg(
        F.min_by("v", "t").alias("value"),
        F.min("t").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w3 = Window.partitionBy("k").orderBy("run_id")
    return grouped.select(
        F.col("k").alias(key_col),
        "value",
        "valid_from",
        F.lead("valid_from").over(w3).alias("valid_to"),
        "n_events",
    )


def rate_anomalies(
    events: DataFrame,
    *,
    series_col: str = "event_type",
    ts_col: str = "ts",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Daily-rate anomaly detection per series — the ops-monitoring
    readout over an event stream: flag days whose event count sits more
    than z_threshold population standard deviations from the series'
    own mean (crawler stalls, bot floods, pipeline gaps all show up
    here first).

    Determinism shape: daily counts are exact int64 (one combiner
    groupBy); per-series n/Σx/Σx² reduce from the day-count-sized table
    (a second combiner groupBy — NO window, the series stats broadcast
    back); z = (x − μ)/σ_pop is algebraically rearranged so every input
    is one of those integers and the only doubles are a fixed shape of
    their products (the q110 Pearson discipline):
    z = (n·x − Σx) / sqrt(n·Σx² − (Σx)²). Zero-variance
    series flag nothing (z NULL). Output: (series, day, n_events, z
    round-6, is_anomaly), one row per observed (series, day)."""
    d = F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    daily = (
        events.select(F.col(series_col).alias("series"), d)
        .groupBy("series", "day")
        .agg(F.count(F.lit(1)).alias("x"))
    ).localCheckpoint(eager=False)
    return rate_anomalies_from_daily(daily, z_threshold=z_threshold)


def rate_anomalies_from_daily(
    daily: DataFrame,
    *,
    z_threshold: float = 2.0,
) -> DataFrame:
    """rate_anomalies over pre-aggregated (series, day, x) daily counts —
    the entry point for counts that arrive already windowed (e.g. the
    streaming_daily_counts -> warehouse path, whose batch parity is
    asserted in tests/test_streaming.py). Same exact-int64 moment shape
    and fixed-form z as rate_anomalies."""
    stats = daily.groupBy("series").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    j = daily.join(F.broadcast(stats), "series")
    n, sx, sxx = (F.col(c).cast("double") for c in ("n", "sx", "sxx"))
    x = F.col("x").cast("double")
    # z = (x - mean)/popstd rearranged to one fixed shape of the exact
    # integers: (n·x − Σx) / sqrt(n·Σx² − (Σx)²)
    denom = F.sqrt(n * sxx - sx * sx)
    z = F.when(denom > 0, F.round((n * x - sx) / denom, 6))
    return j.select(
        "series",
        "day",
        F.col("x").alias("n_events"),
        (z + F.lit(0.0)).alias("z"),
        F.when(
            z.isNotNull() & (F.abs(z) > z_threshold), 1
        ).otherwise(0).cast("long").alias("is_anomaly"),
    )


def ordered_funnel(
    events: DataFrame,
    *,
    steps: tuple = ("signup", "view", "purchase"),
    window_days: int = 7,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered multi-step conversion funnel with a deadline window — the
    product-analytics primitive sessionize (q16) and the transition
    matrix (q89) do not express: a user converts step k only with an
    event of type steps[k] STRICTLY AFTER their step k-1 time and no
    later than step-1 time + window_days. First-event semantics
    throughout (min ts per user per stage), so the result is a pure
    function of the event set — replays, re-partitioning, and late data
    cannot flip it.

    Scale shape: stage k is one filtered combiner groupBy(user) +
    an equi-join against the (user-sized) stage k-1 table — the event
    table is scanned once per step WITH the type filter pushed to the
    scan, never collected, never windowed per user. The final 3-row
    rollup uses a lag window over the step-sized output (domain-sized,
    like q45's value-histogram window — never user- or event-sized).

    Conversions are exact micro-unit integer ratios: conv_prev_fp vs
    the previous step, conv_start_fp vs step 1 (1e6 for step 1 itself).

    Output: (step, step_name, n_users, conv_prev_fp, conv_start_fp),
    one row per step, ordered by step."""
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.col(ts_col).alias("t"),
    )
    stage = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("tk"))
        .withColumn(
            "deadline",
            F.col("tk") + F.expr(f"INTERVAL {int(window_days)} DAYS"),
        )
    )
    rows = [
        stage.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(1).cast("int").alias("step"),
            F.lit(steps[0]).alias("step_name"),
            "n_users",
        )
    ]
    for k, name in enumerate(steps[1:], start=2):
        nxt_ev = ev.filter(F.col("et") == name)
        stage = (
            nxt_ev.join(
                stage.select("u", F.col("tk").alias("tp"), "deadline"), "u"
            )
            .filter((F.col("t") > F.col("tp")) & (F.col("t") <= F.col("deadline")))
            .groupBy("u")
            .agg(F.min("t").alias("tk"), F.min("deadline").alias("deadline"))
        )
        rows.append(
            stage.agg(
                F.count(F.lit(1)).cast("long").alias("n_users")
            ).select(
                F.lit(k).cast("int").alias("step"),
                F.lit(name).alias("step_name"),
                "n_users",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    w = Window.orderBy("step")
    # default frame (unbounded preceding .. current row): first_value is
    # step 1's count on every row
    return (
        out.withColumn("n_prev", F.lag("n_users").over(w))
        .withColumn("n_start", F.first("n_users").over(w))
        .select(
            "step",
            "step_name",
            "n_users",
            F.when(F.col("n_prev").isNull(), F.lit(1_000_000).cast("long"))
            .when(F.col("n_prev") == 0, F.lit(None).cast("long"))
            .otherwise(
                F.expr("(1000000 * n_users) DIV n_prev").cast("long")
            )
            .alias("conv_prev_fp"),
            F.when(F.col("n_start") == 0, F.lit(None).cast("long"))
            .otherwise(
                F.expr("(1000000 * n_users) DIV n_start").cast("long")
            )
            .alias("conv_start_fp"),
        )
        .orderBy("step")
    )


def frequent_sequences(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    ks: tuple = (2, 3),
    min_support_fp: int = 200_000,
) -> DataFrame:
    """Frequent contiguous event sequences — sequential pattern mining
    (the contiguous-k-gram core of PrefixSpan/GSP, which is what
    clickstream funnels actually consume): which orderings of actions
    recur across many users, with support counted as DISTINCT USERS
    (a user looping one path a thousand times contributes once).

    Scale shape: one window per user (two leads over (ts, tiebreak)
    total order — deterministic even with equal timestamps), k-gram
    pattern strings, then a (k, pattern, user)-distinct combiner
    groupBy to user-support counts; the n_users scalar broadcasts.
    Support threshold is an exact micro-unit integer comparison
    ((1e6*support) DIV n_users >= min_support_fp) — no float fraction
    on any boundary. Patterns join with '>' which cannot occur in
    event-type names.

    Output: (k, pattern, support, support_fp) for patterns at or above
    min_support_fp, ordered (k, support DESC, pattern)."""
    kmax = max(ks)
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    seq = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("w1"),
        *[
            F.lead(type_col, i).over(w).alias(f"w{i + 1}")
            for i in range(1, kmax)
        ],
    ).localCheckpoint(eager=False)
    n_users = events.agg(
        F.countDistinct(user_col).cast("long").alias("n_users")
    )
    grams = None
    for k in ks:
        cols = [f"w{i + 1}" for i in range(k)]
        # EVERY gram position must be non-NULL, not just the last lead:
        # concat_ws silently skips NULLs, so a NULL event type mid-gram
        # would collapse "a>NULL>c" into a spurious "a>c" (and diverge
        # from the oracle, whose || yields NULL)
        notnull = F.lit(True)
        for c in cols:
            notnull = notnull & F.col(c).isNotNull()
        part = seq.filter(notnull).select(
            F.lit(int(k)).cast("int").alias("k"),
            "u",
            F.concat_ws(">", *cols).alias("pattern"),
        )
        grams = part if grams is None else grams.unionByName(part)
    sup = (
        grams.distinct()
        .groupBy("k", "pattern")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    return (
        sup.crossJoin(F.broadcast(n_users))
        .withColumn(
            "support_fp",
            F.expr("(1000000 * support) DIV n_users").cast("long"),
        )
        .filter(F.col("support_fp") >= F.lit(int(min_support_fp)))
        .select("k", "pattern", "support", "support_fp")
        .orderBy("k", F.desc("support"), "pattern")
    )


def interval_coverage(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Exact per-key union length of overlapping integer intervals —
    the classic sweep ("how much wall-clock was this user/session/host
    actually active, counting overlaps once?") that sessionize (q16)
    cannot answer: gap-based sessions tell you how many bursts there
    were, coverage tells you how much of the clock the bursts covered.

    The sweep is ONE window partitioned by key, ordered by
    (start, end): with reach = running max of PRIOR ends, each interval
    contributes max(0, end - max(reach, start)) — exact int64 — and
    opens a new merged block iff start > reach. Touching intervals
    ([1,2], [2,3]) merge (coverage 2, one block), the half-open
    [start, end) convention. Zero/negative-length and NULL-bounded
    intervals are dropped before the sweep (they cover nothing and
    would otherwise seed phantom blocks).

    Scale shape: the window partitions BY KEY — per-user partitions,
    never SinglePartition; skewed power-users are bounded by their own
    event counts, and AQE's skew split handles the outliers. All
    arithmetic is int64 (microseconds): no float time math anywhere.
    Output: (key, n_intervals, covered, n_blocks)."""
    iv = df.select(
        F.col(key_col).alias("k"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    ).where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) > F.col(start_col))
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.asc("s"), F.asc("e"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = iv.select(
        "k",
        "s",
        "e",
        F.coalesce(F.max("e").over(w), F.lit(-(1 << 62))).alias("reach"),
    )
    return (
        swept.groupBy(F.col("k").alias(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum(
                F.greatest(
                    F.col("e") - F.greatest(F.col("reach"), F.col("s")),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("covered"),
            F.sum(
                F.when(F.col("s") > F.col("reach"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_blocks"),
        )
    )


def allen_relation_counts(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    start_col: str = "start",
    end_col: str = "end",
    id_col: str = "event_id",
    max_per_key: int | None = None,
) -> DataFrame:
    """Per-key census of Allen's interval relations — for every pair of
    a key's activity intervals, WHICH temporal relation holds (precedes,
    meets, overlaps, starts, contains, finished_by, equals), not just
    how much time they cover (interval_coverage) or how they merge
    (asof/range join). The profile is the temporal texture of a user:
    bursty overlappers vs serial task-switchers look identical in total
    coverage but opposite here.

    Pairs are canonicalized by the lexicographic order (start, end, id)
    — the earlier interval is A — which makes the 7-relation set
    exhaustive and each unordered pair counted exactly once:
      A.e < B.s precedes | A.e = B.s meets | A.s < B.s < A.e < B.e
      overlaps | A.s=B.s, A.e<B.e starts | B inside A contains |
      A.s<B.s, A.e=B.e finished_by | identical equals.

    Scale shape: the pair join is an equi-join ON KEY ONLY — per-key
    work is quadratic in that key's interval count, which is the
    honest cost of a pairwise census. `max_per_key` bounds it: keep the
    first N intervals per key by (start, end, id) via one row_number
    window and REPORT the per-key drop count in `n_dropped` (no silent
    caps) — at web scale set it to the p99 intervals-per-user and the
    join's fan-out is capped at N^2/2 per key while the drop column
    says exactly which users were truncated.
    Output: (key, relation, n_pairs, n_dropped)."""
    iv = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("i"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    ).where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) > F.col(start_col))
    )
    if max_per_key is not None:
        w = Window.partitionBy("k").orderBy("s", "e", "i")
        ranked = iv.select("*", F.row_number().over(w).alias("_rn"))
        iv = ranked.where(F.col("_rn") <= max_per_key).drop("_rn")
        dropped = (
            ranked.where(F.col("_rn") > max_per_key)
            .groupBy("k")
            .agg(F.count(F.lit(1)).cast("long").alias("n_dropped"))
        )
    else:
        dropped = None
    a, b = iv.alias("a"), iv.alias("b")
    sa, ea, ia = F.col("a.s"), F.col("a.e"), F.col("a.i")
    sb, eb, ib = F.col("b.s"), F.col("b.e"), F.col("b.i")
    lex = (
        (sa < sb)
        | ((sa == sb) & (ea < eb))
        | ((sa == sb) & (ea == eb) & (ia < ib))
    )
    rel = (
        F.when(ea < sb, "precedes")
        .when(ea == sb, "meets")
        .when((sa == sb) & (ea == eb), "equals")
        .when((sa == sb) & (ea < eb), "starts")
        .when(ea < eb, "overlaps")
        .when(ea == eb, "finished_by")
        .otherwise("contains")
    )
    counts = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & lex)
        .select(F.col("a.k").alias("k"), rel.alias("relation"))
        .groupBy("k", "relation")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    if dropped is not None:
        counts = counts.join(dropped, "k", "left")
        nd = F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long")
    else:
        nd = F.lit(0).cast("long")
    return counts.select(
        F.col("k").alias(key_col),
        "relation",
        "n_pairs",
        nd.alias("n_dropped"),
    )


def decayed_engagement(
    df: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    value_col: str = "value",
    halflife_us: int = 7 * 24 * 3600 * 1_000_000,
    anchor_us: int | None = None,
    max_shift: int = 40,
) -> DataFrame:
    """Half-life-decayed engagement score — the freshness-weighted sum
    behind "recent activity counts more": each event contributes
    value_cents / 2^age where age = whole half-lives between the event
    and the anchor. EXACT integers throughout: value_cents =
    floor(value*100), age = (anchor_us - ts_us) // halflife_us (int64
    floor division), and the decay is floor(v / 2^age) — a power-of-two
    double division is exact for v < 2^53, so floor matches pure integer
    shifting on any engine. Events after the anchor clamp to age 0;
    shifts clamp at `max_shift` (contribution already 0 for any real
    value). No float accumulates across rows: the groupBy sums int64.

    Scale shape: the decay is a per-row map expression + ONE
    combiner-friendly groupBy — the cheapest possible distributed shape
    (map-side partial sums, no window, no join). anchor_us=None derives
    the anchor from max(ts) via a single scalar collect.
    Output: (*key_cols, n_events, raw_cents, decayed_cents)."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    if anchor_us is None:
        anchor_us = df.agg(
            F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
        ).collect()[0][0]
        if anchor_us is None:  # empty input: any anchor yields no rows
            anchor_us = 0
    age = F.floor(
        (F.lit(int(anchor_us)) - ts_us) / F.lit(int(halflife_us))
    ).cast("long")
    age = F.least(
        F.greatest(age, F.lit(0)), F.lit(int(max_shift))
    ).cast("int")
    cents = F.floor(F.col(value_col) * F.lit(100.0)).cast("long")
    contrib = F.floor(
        cents / F.pow(F.lit(2.0), age.cast("double"))
    ).cast("long")
    return (
        df.where(
            F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .select(*key_cols, cents.alias("_c"), contrib.alias("_d"))
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("_c").cast("long").alias("raw_cents"),
            F.sum("_d").cast("long").alias("decayed_cents"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    censor_margin_us: int = 7 * 24 * 3600 * 1_000_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Kaplan-Meier product-limit survival over user lifetimes — the
    churn curve: S(t) = prod over death times t' <= t of (1 - d/n),
    where a user's lifetime is last-event minus first-event (whole
    hours) and users whose last event falls within `censor_margin_us`
    of the study end (global max ts) are right-CENSORED: they leave the
    risk set at their observed lifetime without counting as a death —
    dropping them instead would bias churn down, the classic mistake.

    Exactness: the product is int64 fixed-point, S_fp <- floor(
    S_fp * (n - d) / n) stepped over death times in order — no float
    product, no ln-sum whose association order an engine could change.
    The step runs on the DRIVER over the collected lifetime histogram,
    which is DOMAIN-bounded (distinct whole-hour lifetimes <= the study
    window in hours), not corpus-bounded — the q45 histogram-walk
    discipline; the oracle replays the identical recurrence as a
    recursive CTE. Everything corpus-sized (per-user min/max, the
    histogram groupBy) is distributed and combiner-friendly.

    At-risk n(t) counts every user with observed lifetime >= t (deaths
    and censored alike — ties resolve deaths-before-censoring, the
    standard convention). Output, death times only:
    (t_hours, n_at_risk, n_deaths, surv_fp, surv)."""
    spark = df.sparkSession
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lives = (
        df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(key_col)
        .agg(F.min(ts_us).alias("t0"), F.max(ts_us).alias("t1"))
    )
    end_us = lives.agg(F.max("t1")).collect()[0][0]
    if end_us is None:  # empty input: no lifetimes, empty curve
        return spark.createDataFrame(
            [],
            "t_hours long, n_at_risk long, n_deaths long, surv_fp long,"
            " surv double",
        )
    hist = (
        lives.select(
            F.floor((F.col("t1") - F.col("t0")) / F.lit(3_600_000_000))
            .cast("long")
            .alias("t_hours"),
            F.when(
                F.lit(int(end_us)) - F.col("t1") < F.lit(int(censor_margin_us)),
                0,
            )
            .otherwise(1)
            .alias("is_death"),
        )
        .groupBy("t_hours")
        .agg(
            F.sum("is_death").cast("long").alias("d"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        .orderBy("t_hours")
        .collect()
    )
    total = sum(r["c"] for r in hist)
    rows, at_risk, s_fp = [], total, int(scale)
    for r in hist:
        if r["d"] > 0:
            s_fp = s_fp * (at_risk - r["d"]) // at_risk
            rows.append((int(r["t_hours"]), int(at_risk), int(r["d"]), s_fp))
        at_risk -= r["c"]
    out = spark.createDataFrame(
        rows, "t_hours long, n_at_risk long, n_deaths long, surv_fp long"
    )
    return out.select(
        "t_hours",
        "n_at_risk",
        "n_deaths",
        "surv_fp",
        (F.col("surv_fp").cast("double") / F.lit(float(scale))).alias("surv"),
    )


def cusum_changepoints(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    k_div: int = 20,
    h_mult: int = 8,
) -> DataFrame:
    """Two-sided CUSUM drift detection over the daily event-volume
    series — the changepoint question the pointwise z-score anomaly scan
    (rate_anomalies) cannot answer: a sustained small shift never trips
    a per-day threshold but ACCUMULATES here. S+ tracks upward drift
    (S+ <- max(0, S+ + x - mean - k)), S- downward; an alarm fires when
    either side crosses h. Reference/allowance/threshold derive from the
    data as pure integers: mean = total // n_days, k = max(1,
    mean // k_div), h = h_mult * k — so the whole statistic is int64
    end-to-end, NO floats anywhere (the strongest determinism class in
    the repo; even the fixed-point queries keep one rounded double).

    The recurrence is sequential, but over the DAY domain — bounded by
    the study window, corpus-size-independent (the q45/Kaplan-Meier
    histogram-walk discipline): daily counts are one combiner groupBy;
    the fold walks the collected day series on the driver; the oracle
    replays it as a recursive CTE. Days with no events simply don't
    appear (the series walks observed days in order).
    Output: (day DATE, x, s_pos, s_neg, alarm)."""
    daily = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    return cusum_from_daily(daily, k_div=k_div, h_mult=h_mult)


def cusum_from_daily(
    daily: DataFrame,
    *,
    day_col: str = "day",
    x_col: str = "x",
    k_div: int = 20,
    h_mult: int = 8,
) -> DataFrame:
    """The CUSUM fold over an ALREADY-AGGREGATED (day, x) series — the
    consumable half of cusum_changepoints, so the same detector runs on
    a batch derivation OR on streaming_daily_counts output read back
    from the warehouse (stream -> daily counts -> exactly-once commit ->
    THIS; parity with the batch path asserted in tests/test_streaming).
    Semantics and integer discipline identical to cusum_changepoints."""
    spark = daily.sparkSession
    days = (
        daily.select(
            F.col(day_col).alias("day"), F.col(x_col).cast("long").alias("x")
        )
        .orderBy("day")
        .collect()
    )
    n = len(days)
    total = sum(r["x"] for r in days)
    mean = total // n if n else 0
    k = max(1, mean // k_div)
    h = h_mult * k
    rows, sp, sn = [], 0, 0
    for r in days:
        sp = max(0, sp + r["x"] - mean - k)
        sn = max(0, sn + mean - r["x"] - k)
        rows.append((r["day"], int(r["x"]), sp, sn, sp >= h or sn >= h))
    out = spark.createDataFrame(
        rows, "day date, x long, s_pos long, s_neg long, alarm boolean"
    )
    return out.orderBy("day")


def holt_forecast(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    scale: int = 1000,
) -> DataFrame:
    """Holt linear-trend smoothing over the daily event-volume series —
    the FORECASTING primitive (one-step-ahead prediction + backtest
    error) that the descriptive OLS trend (volume_trend) is not: OLS
    fits one global line after the fact; Holt tracks level and trend
    recursively so the forecast adapts to drift, and the per-day
    one-step error IS the backtest.

    Exact fixed-point with alpha = beta = 1/2: states live in int64
    `scale` units and each update is a floor of an integer half —
    l_t = (x_t + l_prev + b_prev) // 2,
    b_t = (b_prev + (l_t − l_prev)) // 2 — so the walk is bit-portable
    (no float smoothing constants anywhere). Init: l = x_1,
    b = x_2 − x_1, the standard two-point start. Forecast for day t is
    l_{t−1} + b_{t−1}; output rows start at day 2 (day 1 has no prior
    state).

    Sequential over the DAY domain only (q206's argument): combiner
    groupBy to daily counts, driver fold over ≤ window-days rows,
    recursive-CTE oracle. Output: (day, x, forecast_fp, abs_err_fp) in
    scale units."""
    spark = df.sparkSession
    days = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .orderBy("day")
        .collect()
    )
    rows = []
    if len(days) >= 2:
        xs = [int(r["x"]) * scale for r in days]
        lev, tr = xs[0], xs[1] - xs[0]
        for t in range(1, len(days)):
            fc = lev + tr
            new_lev = (xs[t] + lev + tr) // 2
            tr = (tr + (new_lev - lev)) // 2
            lev = new_lev
            rows.append(
                (days[t]["day"], int(days[t]["x"]), fc, abs(xs[t] - fc))
            )
    out = spark.createDataFrame(
        rows, "day date, x long, forecast_fp long, abs_err_fp long"
    )
    return out.orderBy("day")


def theil_sen_trend(
    df: DataFrame,
    *,
    ts_col: str = "ts",
) -> DataFrame:
    """Theil-Sen robust trend of the daily event-volume series — the
    MEDIAN of all pairwise slopes, the breakdown-resistant complement
    to the per-group OLS trend (volume_trend): one corrupted day drags
    an OLS fit arbitrarily; Theil-Sen tolerates ~29% outliers. The
    intercept is the median residual y − m·x (the standard companion
    estimator).

    Everything lives on the DAY domain: C(days, 2) slope pairs
    (~435 for a 30-day window) — the global median sort is over this
    DOMAIN-bounded table, never corpus rows (the q45 exemption to the
    no-global-sort rule). Slopes are IEEE doubles from integer
    (dy, dx); both engines compute the identical division and sort by
    (slope, i, j), so the median element choice is bit-portable; even
    counts average the two middles.
    Output: one row (n_days, n_pairs, slope, intercept)."""
    daily = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    wd = Window.orderBy("day")
    pts = daily.select(
        F.row_number().over(wd).cast("long").alias("i"), "y"
    ).localCheckpoint(eager=False)
    a, b = pts.alias("a"), pts.alias("b")
    pairs = a.join(b, F.col("a.i") < F.col("b.i")).select(
        F.col("a.i").alias("i"),
        F.col("b.i").alias("j"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.i") - F.col("a.i")).cast("double")
        ).alias("slope"),
    )
    ws = Window.orderBy("slope", "i", "j")
    np_ = pairs.count()
    if np_ == 0:
        return daily.sparkSession.createDataFrame(
            [], "n_days long, n_pairs long, slope double, intercept double"
        )
    mid = [(np_ + 1) // 2, (np_ + 2) // 2]
    m = (
        pairs.withColumn("_rn", F.row_number().over(ws))
        .where(F.col("_rn").isin(mid))
        .agg(F.avg("slope").alias("slope"))
    )
    res = pts.crossJoin(F.broadcast(m)).select(
        "i",
        (F.col("y").cast("double") - F.col("slope") * F.col("i").cast("double"))
        .alias("b"),
        "slope",
    )
    nd = pts.count()
    midb = [(nd + 1) // 2, (nd + 2) // 2]
    wb = Window.orderBy("b", "i")
    icept = (
        res.withColumn("_rn", F.row_number().over(wb))
        .where(F.col("_rn").isin(midb))
        .agg(
            F.min("slope").alias("slope"),
            F.avg("b").alias("intercept"),
        )
    )
    return icept.select(
        F.lit(int(nd)).cast("long").alias("n_days"),
        F.lit(int(np_)).cast("long").alias("n_pairs"),
        "slope",
        "intercept",
    )


def best_sse_split(
    df: DataFrame,
    *,
    ts_col: str = "ts",
) -> DataFrame:
    """Optimal OFFLINE single changepoint of the daily volume series:
    the split minimizing total within-segment SSE — the retrospective
    complement to CUSUM (q-online detection answers "is it drifting
    NOW"; this answers "WHERE did the level change, exactly"). Fitting
    a piecewise-constant mean with one break is the 2-segment Jenks /
    1-changepoint least-squares classic.

    Exactness: prefix sums Σy and Σy² are int64 cumulative windows over
    the DAY-domain table; each candidate split's SSE =
    (Σy²_L − (Σy_L)²/n_L) + (Σy²_R − (Σy_R)²/n_R) is one fixed scalar
    expression of those integers — identical bits on both engines — and
    the argmin orders by (sse, split_idx). No corpus-row work beyond
    the one combiner groupBy to daily counts.
    Output: one row (n_days, split_idx, split_day, sse_one, sse_two)
    where sse_one is the no-split SSE and split_idx is the last day of
    the left segment."""
    daily = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    wd = Window.orderBy("day")
    pts = daily.select(
        "day",
        F.row_number().over(wd).cast("long").alias("i"),
        "y",
        F.sum("y").over(wd).cast("long").alias("cy"),
        F.sum(F.col("y") * F.col("y")).over(wd).cast("long").alias("cy2"),
    ).localCheckpoint(eager=False)
    tot = pts.agg(
        F.max("i").alias("n"),
        F.max("cy").alias("ty"),
        F.max("cy2").alias("ty2"),
    )
    cand = pts.crossJoin(F.broadcast(tot)).where(F.col("i") < F.col("n"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    sse_two = (
        (d("cy2") - d("cy") * d("cy") / d("i"))
        + (
            (d("ty2") - d("cy2"))
            - (d("ty") - d("cy")) * (d("ty") - d("cy")) / (d("n") - d("i"))
        )
    )
    wbest = Window.orderBy("sse_two", "i")
    best = (
        cand.select(
            "day", "i", "n", "ty", "ty2", sse_two.alias("sse_two")
        )
        .withColumn("_rn", F.row_number().over(wbest))
        .where(F.col("_rn") == 1)
    )
    return best.select(
        F.col("n").alias("n_days"),
        F.col("i").alias("split_idx"),
        F.col("day").alias("split_day"),
        (d("ty2") - d("ty") * d("ty") / d("n")).alias("sse_one"),
        "sse_two",
    )


def _journey_edge_counts(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    conv_type: str,
) -> dict:
    """Shared journey derivation for the attribution operators
    (markov_attribution, shapley_attribution): per-user event streams
    cut at the first `conv_type`, folded into absorbing-chain
    transition counts {(src, dst): n} with START / NULL sentinels.
    The windows partition BY USER; the returned dict is the
    DOMAIN-bounded ≤ (|types|+2)² transition table."""
    w = Window.partitionBy("u").orderBy("ts_", "eid")
    ev = df.where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts_"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("t"),
    )
    ranked = ev.select(
        "u", "t", F.row_number().over(w).alias("rn")
    )
    firstc = (
        ranked.where(F.col("t") == conv_type)
        .groupBy("u")
        .agg(F.min("rn").alias("crn"))
    )
    kept = ranked.join(firstc, "u", "left").where(
        F.col("crn").isNull() | (F.col("rn") <= F.col("crn"))
    )
    wk = Window.partitionBy("u").orderBy("rn")
    hops = kept.select(
        "u",
        "t",
        "rn",
        F.lead("t").over(wk).alias("nxt"),
    )
    trans = (
        hops.select(
            F.when(F.col("rn") == 1, True).otherwise(False).alias("is_first"),
            "t",
            "nxt",
        )
    )
    edges = (
        trans.select(
            F.lit("START").alias("s"),
            F.col("t").alias("d"),
        ).where(F.col("is_first"))
        .union(
            trans.where(F.col("nxt").isNotNull()).select(
                F.col("t").alias("s"), F.col("nxt").alias("d")
            )
        )
        .union(
            trans.where(
                F.col("nxt").isNull() & (F.col("t") != conv_type)
            ).select(F.col("t").alias("s"), F.lit("NULL").alias("d"))
        )
    )
    return {
        (r["s"], r["d"]): r["c"]
        for r in edges.groupBy("s", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }


def markov_attribution(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conv_type: str = "purchase",
    channels: tuple[str, ...] = ("click", "error", "signup", "view"),
    iterations: int = 12,
    scale: int = 1_000_000,
) -> DataFrame:
    """Markov removal-effect attribution — WHICH touchpoint channels
    actually drive conversion, by the counterfactual the last-click /
    funnel views (q164/q168) cannot ask: how much does START→CONV
    probability DROP if a channel is deleted from the graph? Journeys
    are each user's events up to the first `conv_type` (users without
    one end in NULL); transitions feed an absorbing Markov chain and
    the per-channel removal effect is (V_base − V_removed) / V_base.

    Exact fixed-point: conversion values live in int64 `scale` units
    and each iteration step is v_s ← (Σ_j c_sj·v_j) // c_s — one
    integer dot product and ONE floor division per state (exact because
    Σ_j c_sj = c_s), with CONV pinned at scale, NULL and the removed
    channel pinned at 0. Truncated at `iterations` — the truncation IS
    the defined semantics, so both engines replay identical integers
    (the q51 unrolled-round trick, one chain per removal scenario).
    Overflow bound: c_sj·scale must stay < 2^63 — fine to ~9e12
    transitions per edge; normalize counts upstream past that.

    Scale shape: journey windows partition BY USER; transition counts
    are one combiner groupBy to a ≤ (|channels|+2)² table — the chain
    math walks that DOMAIN-bounded table on the driver. Output one row
    per channel: (channel, conv_base_fp, conv_removed_fp,
    removal_effect, share)."""
    counts = _journey_edge_counts(
        df,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        id_col=id_col,
        conv_type=conv_type,
    )
    states = ["START", *channels]
    out_tot = {}
    for (s, _d), c in counts.items():
        out_tot[s] = out_tot.get(s, 0) + c

    def solve(removed: str | None) -> int:
        v = {s: 0 for s in states}
        for _ in range(iterations):
            nv = {}
            for s in states:
                if s == removed or s not in out_tot:
                    nv[s] = 0
                    continue
                acc = 0
                for d in states:
                    if d == removed:
                        continue
                    acc += counts.get((s, d), 0) * v[d]
                acc += counts.get((s, conv_type), 0) * scale
                nv[s] = acc // out_tot[s]
            v = nv
        return v["START"]

    base = solve(None)
    rows = []
    effects = {}
    for ch in channels:
        vr = solve(ch)
        effects[ch] = base - vr
        rows.append((ch, base, vr))
    tot_eff = sum(effects.values())
    spark = df.sparkSession
    out = spark.createDataFrame(
        [
            (
                ch,
                b,
                vr,
                (float(b - vr) / float(b)) if b else None,
                (float(effects[ch]) / float(tot_eff)) if tot_eff else None,
            )
            for ch, b, vr in rows
        ],
        "channel string, conv_base_fp long, conv_removed_fp long,"
        " removal_effect double, share double",
    )
    return out.orderBy("channel")


def shapley_attribution(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conv_type: str = "purchase",
    channels: tuple[str, ...] = ("click", "error", "signup", "view"),
    iterations: int = 12,
    scale: int = 1_000_000,
) -> DataFrame:
    """Shapley-value channel attribution — the AXIOMATIC answer to
    "how much credit does each channel deserve", where q214's removal
    effect is a single counterfactual: the Shapley value averages a
    channel's marginal contribution v(S∪{c}) − v(S) over ALL 2^(n-1)
    coalitions S, weighted |S|!(n−1−|S|)!/n!, and is the unique
    efficiency+symmetry+dummy-consistent split. The characteristic
    function v(S) is the same absorbing-chain conversion probability
    as q214, computed with every channel OUTSIDE S deleted.

    Exact end-to-end: each of the 2^n coalition values is the q214
    int64 fixed-point chain (truncation-as-semantics); Shapley weights
    are rationals with denominator n!, so the value is carried as an
    exact integer numerator phi_num = Σ w·Δ with w =
    |S|!(n−1−|S|)! and divided by n! only in the final reported
    double. Efficiency (Σφ = v(all) − v(∅)) is an exact integer
    identity, testable to the unit.

    Scale shape: ONE distributed journey pass (shared with q214 via
    _journey_edge_counts); the 2^n chain solves walk the tiny
    transition dict on the driver — 2^n is exponential in CHANNELS,
    not data (n ≤ ~10 is the practical envelope; grouped-channel
    rollups beyond that). Output: (channel, phi_num, phi, v_all_fp,
    v_none_fp)."""
    import math

    counts = _journey_edge_counts(
        df,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        id_col=id_col,
        conv_type=conv_type,
    )
    states = ["START", *channels]
    out_tot = {}
    for (s, _d), c in counts.items():
        out_tot[s] = out_tot.get(s, 0) + c
    n = len(channels)

    def solve(mask: int) -> int:
        removed = {
            ch for i, ch in enumerate(channels) if not (mask >> i) & 1
        }
        v = {s: 0 for s in states}
        for _ in range(iterations):
            nv = {}
            for s in states:
                if s in removed or s not in out_tot:
                    nv[s] = 0
                    continue
                acc = 0
                for d in states:
                    if d in removed:
                        continue
                    acc += counts.get((s, d), 0) * v[d]
                acc += counts.get((s, conv_type), 0) * scale
                nv[s] = acc // out_tot[s]
            v = nv
        return v["START"]

    vals = {m: solve(m) for m in range(1 << n)}
    rows = []
    for i, ch in enumerate(channels):
        phi_num = 0
        for m in range(1 << n):
            if (m >> i) & 1:
                continue
            ssize = bin(m).count("1")
            w = math.factorial(ssize) * math.factorial(n - 1 - ssize)
            phi_num += w * (vals[m | (1 << i)] - vals[m])
        rows.append(
            (
                ch,
                phi_num,
                float(phi_num) / float(math.factorial(n)),
                vals[(1 << n) - 1],
                vals[0],
            )
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        rows,
        "channel string, phi_num long, phi double, v_all_fp long,"
        " v_none_fp long",
    ).orderBy("channel")


def seasonal_decompose_daily(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    period: int = 7,
) -> DataFrame:
    """Classical seasonal decomposition of daily volume (STL-lite):
    trend = centered `period`-day moving average, seasonal = per-
    day-of-week mean of the detrended series, remainder = what's left —
    the decomposition family next to forecasting (q209), online drift
    (q206) and offline changepoints (q212): "is Monday always low, or
    is this week anomalous?" is unanswerable without splitting the
    three components.

    Exact integer throughout by SCALING instead of dividing: the trend
    is carried as the 7-day SUM (int64; trend = sum/7 only in the one
    reported rounded double); detrended r = 7·x − trend_sum (int64);
    the seasonal index is the floor-mean of r per weekday slot; the
    remainder is r − seasonal (still ×7-scaled). Weekday slots come
    from epoch-day % 7 — pure integer arithmetic, immune to the
    Spark-vs-DuckDB dayofweek origin mismatch (1=Sunday vs 0=Sunday).
    Only days with a full centered window emit (the standard edge
    convention). All windows run on the DAY domain.
    Output: (day, x, trend_sum, trend, dow, seasonal_fp,
    remainder_fp)."""
    half = period // 2
    daily = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    wd = Window.orderBy("day").rowsBetween(-half, half)
    trended = (
        daily.select(
            "day",
            "x",
            F.sum("x").over(wd).cast("long").alias("trend_sum"),
            F.count(F.lit(1)).over(wd).alias("_wn"),
            (F.datediff(F.col("day"), F.lit("1970-01-01")) % period)
            .cast("int")
            .alias("dow"),
        )
        .where(F.col("_wn") == period)
        .drop("_wn")
        .localCheckpoint(eager=False)
    )
    detr = trended.select(
        "day",
        "x",
        "trend_sum",
        "dow",
        (F.lit(int(period)) * F.col("x") - F.col("trend_sum")).alias("r"),
    )
    seas = detr.groupBy("dow").agg(
        F.floor(
            F.sum("r") / F.count(F.lit(1))
        ).cast("long").alias("seasonal_fp")
    )
    return (
        detr.join(seas, "dow")
        .select(
            "day",
            "x",
            "trend_sum",
            (F.col("trend_sum").cast("double") / F.lit(float(period)))
            .alias("trend"),
            "dow",
            "seasonal_fp",
            (F.col("r") - F.col("seasonal_fp")).cast("long")
            .alias("remainder_fp"),
        )
        .orderBy("day")
    )


def pla_segments(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    eps: int = 10,
) -> DataFrame:
    """Error-bounded piecewise-linear segmentation of the daily volume
    series (the swing/slope-cone filter behind time-series compression
    à la PMC/Swing): a segment extends while SOME line from its anchor
    passes within ±eps of every point — the slope cone [lo, hi]
    narrows with each point and the segment closes when it empties.
    The segment count IS the compression story: a stable series
    collapses to a few (anchor, end) pairs; level shifts and ramps
    each cost one segment — a compression-shaped complement to the
    changepoint ops (a changepoint is where a new segment STARTS).

    Determinism: the cone bounds are divisions of exact integers
    ((y ± eps − y_a) / (t − t_a)); both engines run the identical
    sequence of double ops and comparisons, so the segmentation is
    bit-reproducible (the oracle replays it as a recursive CTE with
    the cone carried in the state row). Sequential, but over the DAY
    domain only — combiner groupBy to daily counts, driver fold,
    ±inf sentinels as literal ±1e308 on both engines.
    Output: (seg, t_start, t_end, n_points, y_start, y_end)."""
    daily = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        .orderBy("day")
        .collect()
    )
    pts = [(i + 1, int(r["x"])) for i, r in enumerate(daily)]
    spark = df.sparkSession
    if not pts:
        return spark.createDataFrame(
            [],
            "seg long, t_start long, t_end long, n_points long,"
            " y_start long, y_end long",
        )
    segs = []
    seg_id = 1
    ta, ya = pts[0]
    lo, hi = -1e308, 1e308
    for j in range(1, len(pts)):
        t, y = pts[j]
        cl = (y - eps - ya) / (t - ta)
        ch = (y + eps - ya) / (t - ta)
        nlo, nhi = max(lo, cl), min(hi, ch)
        if nlo > nhi:
            pt, py = pts[j - 1]
            segs.append((seg_id, ta, pt, pt - ta + 1, ya, py))
            seg_id += 1
            ta, ya = pt, py
            lo = (y - eps - ya) / (t - ta)
            hi = (y + eps - ya) / (t - ta)
        else:
            lo, hi = nlo, nhi
    te, ye = pts[-1]
    segs.append((seg_id, ta, te, te - ta + 1, ya, ye))
    return spark.createDataFrame(
        segs,
        "seg long, t_start long, t_end long, n_points long,"
        " y_start long, y_end long",
    ).orderBy("seg")
