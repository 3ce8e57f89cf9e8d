"""Deterministic sampling for training-mix construction (task brief:
training-data-pipeline operations).

Web-corpus pipelines need REPRODUCIBLE sampling — `df.sample()` draws from a
per-task RNG whose output depends on partitioning and task retries, so two
runs of the same job can ship different corpora (same reason salts are
row-derived, operators/skew.py).  Here membership is a pure function of the
row key: keep a row iff ``hash(key, seed) mod M < rate * M``.  Properties:

* exact resume / retry stability: a row's fate never changes;
* nested subsets: rate 0.1 is a SUBSET of rate 0.2 at the same seed — grow a
  training set without resampling what was already shipped;
* no coordination: the predicate is map-side, pushed into the scan — no
  shuffle, no count pass;
* stratified mixes (per-language / per-domain rates) are the same predicate
  with the rate looked up from a broadcast literal map.

Hash family is ``dedup.token_hash`` — xxhash64 default; md5_60 lets the
driver's DuckDB oracle replay membership bit-exactly.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import token_hash

_M = 1_000_000          # rate resolution: 1e-6


def _rate_threshold(rate: float, what: str = "rate") -> int:
    """Rate -> integer bucket threshold.  round(), not int(): float
    truncation made 0.29 sample one-millionth low (0.29*1e6 =
    289999.99999...), and sub-resolution positive rates silently kept
    NOTHING — that case now raises."""
    thr = int(round(rate * _M))
    if rate > 0.0 and thr == 0:
        raise ValueError(
            f"{what}={rate} is below the 1e-6 sampling resolution "
            "(would keep nothing); use 0.0 explicitly or a larger rate")
    return thr


def sample_bucket(key: Column, seed: int = 42,
                  hash_family: str = "xxhash64") -> Column:
    """Uniform bucket in [0, 1e6) derived from (seed, key) — the membership
    primitive shared by both samplers."""
    return F.pmod(token_hash(F.concat_ws("\x1f", F.lit(str(seed)), key),
                             hash_family), F.lit(_M))


def hash_sample(df: DataFrame, rate: float, key: str | Column,
                seed: int = 42, hash_family: str = "xxhash64") -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows keyed by ``key``.
    Same (key, seed) -> same decision on every run, partitioning, and retry;
    smaller rates select nested subsets of larger ones."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    key_col = F.col(key) if isinstance(key, str) else key
    return df.filter(
        sample_bucket(key_col.cast("string"), seed, hash_family)
        < F.lit(_rate_threshold(rate)))


def stratified_sample(df: DataFrame, strata_col: str, rates: dict[str, float],
                      key: str | Column, default_rate: float = 0.0,
                      seed: int = 42,
                      hash_family: str = "xxhash64") -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix operator
    ("50% of en, 25% of de, drop the rest").  ``rates`` maps stratum value
    -> keep fraction; unlisted strata get ``default_rate``.  The rate table
    rides the plan as a literal map (strata counts are small by definition);
    membership stays a map-side scan predicate."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    key_col = F.col(key) if isinstance(key, str) else key
    rate_map = F.create_map(*[
        x for s, r in sorted(rates.items())
        for x in (F.lit(s), F.lit(_rate_threshold(r, f"rate[{s}]")))])
    threshold = F.coalesce(
        F.element_at(rate_map, F.col(strata_col)),
        F.lit(_rate_threshold(default_rate, "default_rate")))
    return df.filter(
        sample_bucket(key_col.cast("string"), seed, hash_family) < threshold)


def stratified_take_k(df: DataFrame, strata_col: str, k: int,
                      key: str | Column, seed: int = 42,
                      hash_family: str = "xxhash64") -> DataFrame:
    """EXACT-k per stratum (rate-based sampling gives ~rate*n with binomial
    wiggle; eval-set construction wants exactly k): rank rows within each
    stratum by their deterministic sample bucket (ties broken by key) and
    keep the first ``k``.

    Still fully reproducible — the rank is a pure function of (seed, key) —
    but unlike ``hash_sample`` it costs one per-stratum window (a shuffle
    keyed on the stratum).  Strata are typically few and large; for skewed
    mega-strata the window sort is the price of exactness — use
    ``hash_sample`` when ~rate is acceptable."""
    from pyspark.sql import Window
    if k < 1:
        raise ValueError("k must be >= 1")
    key_col = F.col(key) if isinstance(key, str) else key
    bucket = sample_bucket(key_col.cast("string"), seed, hash_family)
    w = Window.partitionBy(strata_col).orderBy(
        bucket.asc(), key_col.cast("string").asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))


def temperature_quotas(df: DataFrame, strata_col: str, total_k: int,
                       alpha: float = 0.5) -> DataFrame:
    """Per-stratum quotas for a TEMPERATURE-FLATTENED training mix:
    ``w_d = n_d^alpha`` (alpha < 1 flattens the head-heavy web
    distribution — the standard multilingual/data-mixture rule), then the
    weights apportion EXACTLY ``total_k`` samples via largest-remainder
    (Hamilton): ``base_d = floor(total_k * w_d / W)``, and the
    ``total_k - sum(base)`` leftovers go to the largest remainders
    (ties -> stratum ascending).

    ENGINE-EXACT arithmetic: weights become micro-BIGINTs
    (``floor(n^alpha * 1e6 + 0.5)``; with the default ``alpha=0.5`` the
    power is ``sqrt``, IEEE correctly-rounded and therefore identical
    across engines — other alphas go through ``pow``, whose last-ulp is
    implementation-defined: still deterministic per engine, but only
    alpha=0.5 is oracle-safe), and every share/remainder after that is
    integer products and divisions.  The remainder ranking is one window
    over the STRATA table (strata are few by definition).  A tiny
    stratum's quota can exceed its row count — composition with
    ``temperature_mix`` naturally yields min(n_d, quota_d) rows.
    Returns (stratum, n, quota)."""
    if total_k < 1:
        raise ValueError("total_k must be >= 1")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from pyspark.sql import Window
    counts = df.groupBy(F.col(strata_col).alias("stratum")) \
        .agg(F.count("*").alias("n"))
    w_expr = (F.sqrt(F.col("n").cast("double")) if alpha == 0.5
              else F.pow(F.col("n").cast("double"), F.lit(alpha)))
    wt = counts.withColumn(
        "_w", F.floor(w_expr * 1e6 + 0.5).cast("long"))
    tot = wt.agg(F.sum("_w").alias("_tw"))
    shares = (wt.crossJoin(F.broadcast(tot))
              .withColumn("_base", F.expr(f"({total_k} * _w) DIV _tw"))
              .withColumn("_rem", F.lit(total_k) * F.col("_w")
                          - F.col("_base") * F.col("_tw")))
    leftover = (shares.agg((F.lit(total_k) - F.sum("_base")).alias("_l")))
    rk = Window.orderBy(F.col("_rem").desc(),
                        F.col("stratum").cast("string").asc())
    return (shares.withColumn("_rk", F.row_number().over(rk))
            .crossJoin(F.broadcast(leftover))
            .select("stratum", "n",
                    (F.col("_base")
                     + (F.col("_rk") <= F.col("_l")).cast("long"))
                    .alias("quota")))


def temperature_mix(df: DataFrame, strata_col: str, total_k: int,
                    key: str | Column, alpha: float = 0.5, seed: int = 42,
                    hash_family: str = "xxhash64") -> DataFrame:
    """The composed temperature-mix sampler: ``temperature_quotas`` decides
    how many rows each stratum contributes; within a stratum rows rank by
    the deterministic sample bucket (``stratified_take_k``'s rule —
    reproducible across runs/partitionings/retries, nested under a larger
    ``total_k`` re-apportionment only per-stratum).  One keys-only count
    aggregation + one broadcast quota join + one per-stratum window."""
    from pyspark.sql import Window
    quotas = temperature_quotas(df, strata_col, total_k, alpha)
    key_col = F.col(key) if isinstance(key, str) else key
    bucket = sample_bucket(key_col.cast("string"), seed, hash_family)
    w = Window.partitionBy(strata_col).orderBy(
        bucket.asc(), key_col.cast("string").asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .join(F.broadcast(quotas.withColumnRenamed("stratum",
                                                       strata_col)
                              .select(strata_col, "quota")), strata_col)
            .filter(F.col("_rk") <= F.col("quota"))
            .drop("_rk", "quota"))
