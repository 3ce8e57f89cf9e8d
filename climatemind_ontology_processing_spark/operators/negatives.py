"""Negative sampling for KG-embedding training (TransE-family).

Bordes et al. 2013 trains on corrupted triples: for each true (s, p, o),
replace the tail with a random entity, FILTERED against the true triple
set.  At KG scale the two naive shapes both fail: driver-side vocab
sampling doesn't distribute, and `F.rand()` breaks the repo's
retry-reproducibility invariant (operators/skew.py).  So the "random"
pick is fully hash-derived and BUCKETED:

  1. the entity vocabulary is hashed into ``buckets`` groups (one narrow
     pass, no global numbering, no collect);
  2. each (triple, j) corruption slot hash-selects a target bucket and
     joins only that bucket's entities;
  3. within the bucket, the candidate is the argmin of a second per-slot
     hash — deterministic, uniform-ish, O(|triples| * vocab/buckets)
     join work instead of |triples| x vocab.

md5_60 family keeps every choice DuckDB-replayable (CLAUDE.md idiom);
xxhash64 is the production default.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h(key_col, hash_family: str):
    if hash_family == "xxhash64":
        return F.xxhash64(key_col)
    return F.conv(F.substring(F.md5(key_col), 1, 15), 16, 10).cast("long")


def negative_triples(triples: DataFrame, k: int = 2, buckets: int = 64,
                     seed: str = "neg", hash_family: str = "md5_60",
                     s: str = "subj", p: str = "pred",
                     o: str = "obj") -> DataFrame:
    """Filtered tail-corruption negatives: up to ``k`` rows
    (s, p, o_neg, j) per true triple, ``j`` the corruption slot.

    Fewer than ``k`` can survive per triple: a corruption colliding with
    the true tail, matching ANY true (s, p, ·) triple (the standard
    "filtered" setting), or drawing an empty bucket is dropped — callers
    needing exact-k oversample ``k`` and take_k downstream.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if hash_family not in ("md5_60", "xxhash64"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    t = triples.select(F.col(s).alias("s"), F.col(p).alias("p"),
                       F.col(o).alias("o")).distinct()
    ents = (t.select(F.col("s").alias("n"))
            .unionByName(t.select(F.col("o").alias("n")))
            .distinct())
    nb = ents.withColumn(
        "b", F.pmod(_h(F.concat_ws("|", F.lit(seed), F.lit("vocab"),
                                   F.col("n").cast("string")),
                       hash_family), F.lit(buckets)))
    slot_key = F.concat_ws("|", F.lit(seed), F.col("s").cast("string"),
                           F.col("p").cast("string"),
                           F.col("o").cast("string"),
                           F.col("j").cast("string"))
    slots = (t.select("s", "p", "o",
                      F.explode(F.array(*[F.lit(j) for j in range(k)]))
                       .alias("j"))
             .withColumn("b", F.pmod(_h(slot_key, hash_family),
                                     F.lit(buckets))))
    cand_key = F.concat_ws("|", F.lit(seed), F.lit("pick"),
                           F.col("s").cast("string"),
                           F.col("p").cast("string"),
                           F.col("o").cast("string"),
                           F.col("j").cast("string"),
                           F.col("n").cast("string"))
    picked = (slots.join(nb, "b")
              .groupBy("s", "p", "o", "j")
              .agg(F.min_by("n", F.struct(_h(cand_key, hash_family)
                                          .alias("h"),
                                          F.col("n").alias("n")))
                    .alias("o_neg")))
    filtered = (picked
                .filter(F.col("o_neg") != F.col("o"))
                .join(t.select(F.col("s"), F.col("p"),
                               F.col("o").alias("o_neg")),
                      ["s", "p", "o_neg"], "left_anti"))
    return filtered.select(F.col("s").alias(s), F.col("p").alias(p),
                           F.col("o").alias(o), "o_neg", "j")
