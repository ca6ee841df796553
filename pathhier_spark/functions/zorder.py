"""Z-order (Morton) interleave key — multi-dimensional file clustering.

`Warehouse.compact(sort_within_by=[...])` clusters rows within output files
on a LINEAR key: great min/max pruning on the leading column, none on the
others. Interleaving the bits of several dimensions into one sort key keeps
every dimension's per-file min/max range bounded (~domain / files^(1/d)),
so parquet row-group/file skipping works for predicates on ANY of the
z-ordered columns — the standard lakehouse OPTIMIZE ZORDER BY layout,
expressed as one pure column expression (whole-stage codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(*cols: Column | str, bits: int = 21) -> Column:
    """Morton key of N non-negative integer columns: bit b of column j
    lands at position b*N + j. bits*N must stay within a signed int64
    (<= 62); 21 bits x 2 cols (the default) covers domains to ~2M per
    dimension. Values are truncated to `bits` low bits — map wider
    domains down first (e.g. divide into range buckets). Negative inputs
    are clamped to 0 (define your own offset upstream for signed data)."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} exceeds int64")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        v = F.greatest(col.cast("long"), F.lit(0).cast("long"))
        for b in range(bits):
            out = out + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + j
            )
    return out
