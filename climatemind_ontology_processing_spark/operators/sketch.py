"""HyperLogLog distinct-count sketch — mergeable cardinality profiling.

At 100 TB, exact count-distinct of high-cardinality columns (urls, token
types, fingerprints) shuffles every distinct value; an HLL sketch is a
fixed 2^p-register summary with map-side combine (the shuffle carries
(register, max-rho) pairs, at most 2^p per partition) and registers from
disjoint corpus shards MERGE by register-wise max — the incremental /
multi-segment profiling shape.  Spark's own ``approx_count_distinct`` is
HLL++ with an opaque register layout; this implementation exposes the
registers and pins the estimate DETERMINISTICALLY to the hash family, so
the DuckDB oracle replays it bit-for-bit (the task brief's "novel sketch"
slot: engine-exact, auditable).

Flajolet et al. 2007 estimator with the standard small-range correction:

  E = alpha_m * m^2 / sum_j 2^(-M_j);  if E <= 2.5m and V empty registers
  exist: E = m * ln(m / V)   (linear counting)

Hash: ``dedup.token_hash`` (md5_60 -> 60 deterministic bits; the top ``p``
bits pick the register, the next ``60 - p`` bits feed rho = leading-zero
count + 1).  rho uses the BIT LENGTH of the remainder via base-2 string
conversion (Spark ``conv(x, 10, 2)``, DuckDB ``bin(x)``) — pure
integer/string arithmetic with no float anywhere in the sketch, because
``floor(log2(x))`` can flip across engines by one ulp exactly at the
powers of two where the floor changes.
"""
from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import token_hash

_HASH_BITS = 60          # md5_60: 15 hex chars


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str | Column, p: int = 9,
                  hash_family: str = "md5_60") -> DataFrame:
    """(register, max_rho) — the sketch itself, one row per NON-EMPTY
    register (empty registers are implicit zeros; the estimator counts
    them as ``m - rows``).  Map-side combinable (max), mergeable across
    shards by unioning and re-aggregating."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    c = F.col(col) if isinstance(col, str) else col
    h = token_hash(c.cast("string"), hash_family)
    rem_bits = _HASH_BITS - p
    reg = F.shiftright(h, rem_bits)                  # top p bits (int pos ok)
    rem = h.bitwiseAND(F.lit(2 ** rem_bits - 1))     # low bits, >= 0
    # rho = leading zeros + 1 = rem_bits + 1 - bit_length(rem); bit length
    # via base-2 string conversion (exact integers, no float)
    rho = F.when(rem > 0,
                 F.lit(rem_bits + 1) - F.length(F.conv(rem.cast("string"),
                                                       10, 2))) \
        .otherwise(F.lit(rem_bits + 1)).cast("int")
    return (df.filter(c.isNotNull())
            .select(reg.alias("register"), rho.alias("rho"))
            .groupBy("register").agg(F.max("rho").alias("max_rho")))


def hll_estimate(registers: DataFrame, p: int = 9) -> float:
    """Cardinality estimate from a register table (driver-side scalar —
    the table is at most 2^p rows).  The harmonic sum is computed over
    INTEGER-scaled terms (each 2^-rho becomes the exact long
    2^(S - rho), S = hash_bits - p + 1), so it is order-independent and
    bit-identical to the in-plan variant and the SQL oracle."""
    m = 2 ** p
    s_exp = _HASH_BITS - p + 1
    rows = [(r["register"], r["max_rho"]) for r in registers.collect()]
    total = sum(2 ** (s_exp - rho) for _, rho in rows) \
        + (m - len(rows)) * 2 ** s_exp          # exact integer arithmetic
    harm = total / float(2 ** s_exp)
    est = _alpha(m) * m * m / harm
    zeros = m - len(rows)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def hll_count_distinct(df: DataFrame, col: str | Column, p: int = 9,
                       hash_family: str = "md5_60") -> DataFrame:
    """One-row DataFrame (n_registers, estimate) — the in-plan variant:
    the estimator runs as an aggregation over the register table, so no
    driver collect is needed and the whole thing composes into larger
    plans.  The harmonic sum aggregates integer-scaled powers of two as
    BIGINTs (order-independent, engine-exact — a float sum of 2^-rho
    terms spanning > 53 bits would be partition-order-dependent)."""
    m = 2 ** p
    s_exp = _HASH_BITS - p + 1
    regs = hll_registers(df, col, p, hash_family)
    # 2^(S - rho) is exact in doubles (exponent <= S <= 57) -> exact long
    term = F.pow(F.lit(2.0), F.lit(s_exp) - F.col("max_rho")).cast("long")
    agg = regs.agg(F.count("*").alias("n_registers"),
                   F.sum(term).alias("_t"))
    total = (F.col("_t")
             + (F.lit(m) - F.col("n_registers")) * F.lit(2 ** s_exp))
    harm = total.cast("double") / F.lit(float(2 ** s_exp))
    est_raw = F.lit(_alpha(m) * m * m) / harm
    zeros = F.lit(m) - F.col("n_registers")
    est = F.when((est_raw <= 2.5 * m) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))) \
        .otherwise(est_raw)
    return agg.select("n_registers", est.alias("estimate"))
