"""Similarity search over embedding columns (task brief).

* brute-force cosine top-k — the exactness baseline: one broadcast of the
  query vectors, JVM-side ``F.zip_with`` dot products, per-query top-k via
  window rank (no driver loop);
* LSH-bucketed variant (random hyperplane signatures) — the scale path: a
  64-bit SimHash-style signature per vector, candidates share a band bucket,
  exact cosine re-ranking on candidates only.  At 10^9+ vectors this turns an
  O(N·Q) scan into bucket-local joins;
* IVF-style variant: coarse quantization by nearest of K seeded centroids
  (deterministic pseudo-centroids from hashed ids — a real k-means fit would
  slot in here), probe the query's centroid bucket only.

Embeddings are ``array<float>`` columns (driver table:
embeddings(vec_id, embedding, label)).
"""
from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "qid") -> DataFrame:
    """(qid, vec_id, cos_sim, rank<=k), excluding self-matches when ids align.

    queries: DataFrame[qid, embedding].  The query side is broadcast; the big
    vector table streams through one narrow pass + a per-qid top-k shuffle.
    """
    q = queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("qvec"))
    pairs = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col)) \
        .crossJoin(F.broadcast(q)) \
        .filter(F.col("vec_id") != F.col("qid")) \
        .select("qid", "vec_id",
                F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(),
                                          F.col("vec_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_signature(vec_col, dim: int, bits: int = 16, seed: int = 42):
    """Random-hyperplane signature as an int column (sign bits packed)."""
    planes = _hyperplanes(dim, bits, seed)
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(p) for p in plane]),
                       lambda x, c: x * c),
            F.lit(0.0), lambda a, v: a + v)
        acc = acc.bitwiseOR(F.shiftleft(
            F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), i))
    return acc


def lsh_topk(vectors: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             bits: int = 16, bands: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid") -> DataFrame:
    """Approximate top-k: candidates = vectors sharing >=1 signature band with
    the query, re-ranked by exact cosine.  Recall grows with bands."""
    rows = bits // bands
    mask = (1 << rows) - 1

    def banded(df, idc, vc):
        sig = lsh_signature(F.col(vc), dim, bits)
        return df.select(
            F.col(idc), F.col(vc), sig.alias("sig"),
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.shiftright(sig, b * rows).bitwiseAND(F.lit(mask)).alias("bh"))
                for b in range(bands)
            ])).alias("bk")).select(idc, vc, "bk.band", "bk.bh")

    vb = banded(vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col)),
                "vec_id", vec_col)
    qb = banded(queries.select(F.col(qid_col).alias("qid"),
                               F.col(vec_col).alias("qvec")), "qid", "qvec")
    cand = (vb.join(F.broadcast(qb), ["band", "bh"])
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "qvec", "vec_id", vec_col).distinct())
    scored = cand.select(
        "qid", "vec_id",
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(),
                                          F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def embedding_near_dups(vectors: DataFrame, dim: int, threshold: float = 0.9,
                        bits: int = 16, bands: int = 8,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (task brief: "embedding-cosine
    near-dup"): random-hyperplane LSH bucketing -> exact cosine verification
    on band collisions only.  Returns (a, b, cos_sim) with a < b.

    High thresholds need few bits per band (here 2): vectors within angle
    arccos(t) collide in a band with prob (1 - angle/pi)^rows.
    """
    rows = bits // bands
    mask = (1 << rows) - 1
    v = vectors.select(F.col(id_col).alias("vid"),
                       F.transform(vec_col, lambda x: x.cast("double")).alias("v"))
    sig = lsh_signature(F.col("v"), dim, bits)
    banded = v.select(
        "vid", "v",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright(sig, b * rows).bitwiseAND(F.lit(mask)).alias("bh"))
            for b in range(bands)
        ])).alias("bk")).select("vid", "v", "bk.band", "bk.bh") \
        .localCheckpoint(eager=True)
    cand = (banded.alias("l").join(
                banded.alias("r"),
                (F.col("l.band") == F.col("r.band")) &
                (F.col("l.bh") == F.col("r.bh")) &
                (F.col("l.vid") < F.col("r.vid")))
            .select(F.col("l.vid").alias("a"), F.col("r.vid").alias("b"),
                    F.col("l.v").alias("va"), F.col("r.v").alias("vb"))
            .dropDuplicates(["a", "b"]))
    return (cand.withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
            .filter(F.col("cos_sim") >= threshold)
            .select("a", "b", "cos_sim"))


def ivf_assign(vectors: DataFrame, dim: int, n_cells: int = 16, seed: int = 42,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Coarse IVF cell assignment: nearest of n_cells deterministic unit
    pseudo-centroids (seeded Gaussian, normalized).  Returns (vec_id, cell)."""
    rng = random.Random(seed)
    cents = []
    for _ in range(n_cells):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([x / n for x in v])
    scored = F.array(*[
        F.struct(
            F.round(_dot(F.col(vec_col), F.array(*[F.lit(x) for x in c])), 6).alias("sim"),
            F.lit(i).alias("cell"))
        for i, c in enumerate(cents)
    ])
    best = F.array_max(scored)
    return vectors.select(F.col(id_col).alias("vec_id"),
                          best.getField("cell").alias("cell"))
