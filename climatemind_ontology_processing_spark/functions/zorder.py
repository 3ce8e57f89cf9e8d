"""Z-order (Morton) clustering keys — multi-dimensional data layout.

At 100 TB the dominant cost is what the scan can SKIP.  Partitioning
prunes one dimension; a Z-order key bit-interleaves several low-
cardinality-ish dimensions into one sort key so that range predicates on
ANY of them map to contiguous-ish key ranges — the standard lakehouse
layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`), here as a plain
column expression usable with ``repartitionByRange``/``sortWithinPartitions``
before a parquet write.

Pure JVM integer bit algebra, fully unrolled at plan-build time (the
PQ-literal precedent: bits*ncols terms, well under the analysis-cost
budget) — no UDF, engine-exact, DuckDB-replayable with ``(x >> i) & 1``.

Inputs must be nonnegative and < 2^bits; violations RAISE at execution
time via lazy ``raise_error`` (packing precedent — a silently masked
high bit would interleave wrongly and corrupt the layout invisibly).
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column (column 0
    contributes the least-significant bit of each group).  Requires
    ``len(cols) * bits <= 63``."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs >= 2 columns")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits > 63 — shrink bits")
    lim = 1 << bits
    checked = []
    for j, c in enumerate(cols):
        v = c.cast("long")
        checked.append(
            F.when(v.isNull() | (v < 0) | (v >= lim),
                   F.raise_error(F.concat(
                       F.lit(f"zorder_key: column {j} out of [0, {lim}): "),
                       v.cast("string"))).cast("long"))
            .otherwise(v))
    terms = []
    for i in range(bits):
        for j, v in enumerate(checked):
            shift = i * n + j
            terms.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), shift))
    return reduce(lambda a, b: a + b, terms).cast("long")
