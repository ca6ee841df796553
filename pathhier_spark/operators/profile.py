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

from pyspark.sql import DataFrame
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
