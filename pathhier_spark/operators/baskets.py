"""Market-basket co-occurrence analytics: association rules over
(basket, item) pairs — support / confidence / lift with min-support
pruning. The KG-pipeline analogue of the reference's xref co-occurrence
pair generation (pathhier/utils/pathway_utils.py cooccurrence loops,
re-expressed as one self-join + combiner aggregates), generalized to the
standard Apriori-style pair statistics a corpus/behavior pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assoc_rules(
    baskets: DataFrame,
    *,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_support: int = 2,
) -> DataFrame:
    """Pairwise association rules: for every UNORDERED item pair (a < b)
    co-occurring in >= min_support baskets, emit co-count, per-item counts,
    and confidence/lift. Confidence and lift are each ONE IEEE double
    division whose operands are exact integers (products stay under 2^53),
    so the result is correctly-rounded and bit-identical on any engine — no
    round() needed (and round() would be WRONG: lift lands on half-way ties
    like 1.0015625 where Spark's HALF_UP and DuckDB's HALF_EVEN diverge).

    confidence(a->b) = c_ab / c_a          (P(b | a))
    lift(a, b)       = n * c_ab / (c_a * c_b)   (>1 = positive association)

    Scale shape: the (basket, item) distinct is one shuffle; pair
    generation is a basket-keyed self-join — work is sum over baskets of
    |basket|^2, so a size cap on pathological mega-baskets (not applied
    here; the caller filters) is the skew lever, the same argument as the
    LSH bucket cap in dedup.lsh_candidate_pairs. Pair counts and item
    counts are combiner-friendly aggregates; the small item-count table
    broadcasts onto the surviving (>= min_support) pairs — pruning happens
    BEFORE the join, so the heavy pair table never carries float columns
    through the shuffle. The integer lift numerator n * c_ab stays under
    int64 for any realistic corpus (n < 2^31 baskets, c_ab <= n)."""
    # The deduped (basket, item) table is read FOUR times (both self-join
    # sides, item counts, basket count) — materialize it once so the
    # upstream scan+distinct shuffle doesn't run per branch (the q68 /
    # connected-components localCheckpoint discipline; post-distinct it is
    # far smaller than the raw input).
    lp = (
        baskets.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("i")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = (
        lp.alias("x")
        .join(lp.alias("y"), "b")
        .filter(F.col("x.i") < F.col("y.i"))
        .select(F.col("x.i").alias("ia"), F.col("y.i").alias("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_support)
    )
    item_counts = lp.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
    n_baskets = lp.select("b").distinct().count()
    joined = (
        pairs.join(
            F.broadcast(item_counts.withColumnRenamed("i", "ia")), "ia"
        )
        .withColumnRenamed("c", "c_a")
        .join(F.broadcast(item_counts.withColumnRenamed("i", "ib")), "ib")
        .withColumnRenamed("c", "c_b")
    )
    return joined.select(
        "ia",
        "ib",
        "c_ab",
        "c_a",
        "c_b",
        (F.col("c_ab").cast("double") / F.col("c_a")).alias("confidence"),
        (
            (F.lit(int(n_baskets)).cast("long") * F.col("c_ab")).cast(
                "double"
            )
            / (F.col("c_a") * F.col("c_b")).cast("double")
        ).alias("lift"),
    )
