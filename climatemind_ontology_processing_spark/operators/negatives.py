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


def hash_embeddings(ids: DataFrame, dim: int = 8, prefix: str = "e",
                    modulus: int = 1009, hash_family: str = "md5_60",
                    id_col: str = "id") -> DataFrame:
    """Deterministic integer 'embeddings': element i of id's vector is
    ``md5_60(prefix|id|i) % modulus`` — a BIGINT in [0, modulus).  Used by
    ``transe_rank_eval`` so the whole ranking protocol is engine-exact
    (no float training state inside a hash-compared query); swap in real
    trained vectors for production scoring, the plan shape is identical."""
    # pmod: xxhash64 is signed, plain % would yield negative elements
    elems = [F.pmod(_h(F.concat_ws("|", F.lit(prefix),
                                   F.col(id_col).cast("string"),
                                   F.lit(str(i))), hash_family),
                    F.lit(modulus))
             for i in range(dim)]
    return ids.select(F.col(id_col).alias("id"), F.array(*elems).alias("emb"))


def transe_rank_eval(triples: DataFrame, dim: int = 8, modulus: int = 1009,
                     k_hits: int = 10, max_candidates: int = 100_000,
                     hash_family: str = "md5_60", s: str = "subj",
                     p: str = "pred", o: str = "obj") -> DataFrame:
    """Link-prediction ranking evaluation (the TransE eval protocol,
    Bordes et al. 2013): for every triple (h, r, t), score ALL entities
    as candidate tails with the L1 translation distance
    ``sum_i |h_i + r_i - t_i|`` and report the RAW rank of the true tail
    (1 = best; ties break toward smaller candidate id, so the rank is
    deterministic).  Returns (subj, pred, obj, rank, hit) with ``hit`` =
    1 if rank <= k_hits.

    All-candidate ranking is the published eval protocol and is
    inherently |triples| x |entities|; the entity side is broadcast (it
    is vocabulary-sized) and ``max_candidates`` guards against feeding a
    corpus-sized id set — at 10^12-triple scale you evaluate on a
    sampled test slice and/or rank against ``negative_triples``
    corruptions instead of the full vocabulary (same join, smaller
    candidate side).  Integer vectors (``hash_embeddings``) keep every
    score a BIGINT: no float, no summation-order drift.
    """
    ents = (triples.select(F.col(s).alias("id"))
            .unionByName(triples.select(F.col(o).alias("id")))
            .distinct())
    n = ents.count()
    if n > max_candidates:
        raise ValueError(
            f"{n} candidate entities > max_candidates={max_candidates}; "
            "rank against sampled corruptions at this scale")
    ent_emb = hash_embeddings(ents, dim, "e", modulus, hash_family)
    rel_emb = hash_embeddings(triples.select(F.col(p).alias("id")).distinct(),
                              dim, "r", modulus, hash_family)

    def l1(h, r, t):
        trans = F.zip_with(h, r, lambda a, b: a + b)
        return F.aggregate(F.zip_with(trans, t, lambda a, b: F.abs(a - b)),
                           F.lit(0).cast("long"), lambda acc, x: acc + x)

    base = (triples.select(s, p, o)
            .join(F.broadcast(ent_emb.select(F.col("id").alias(s),
                                             F.col("emb").alias("h_emb"))), s)
            .join(F.broadcast(rel_emb.select(F.col("id").alias(p),
                                             F.col("emb").alias("r_emb"))), p))
    cands = (base.crossJoin(F.broadcast(
                ent_emb.select(F.col("id").alias("cand"),
                               F.col("emb").alias("c_emb"))))
             .select(s, p, o, "cand",
                     l1(F.col("h_emb"), F.col("r_emb"), F.col("c_emb"))
                     .alias("score")))
    better = (F.col("score") < F.col("true_score")) | \
             ((F.col("score") == F.col("true_score")) &
              (F.col("cand") < F.col(o)))
    trues = (cands.filter(F.col("cand") == F.col(o))
             .select(s, p, o, F.col("score").alias("true_score")))
    return (cands.join(trues, [s, p, o])
            .groupBy(s, p, o)
            .agg((F.lit(1) + F.sum(better.cast("long"))).alias("rank"))
            .select(s, p, o, "rank",
                    (F.col("rank") <= k_hits).cast("int").alias("hit")))


def distmult_rank_eval(triples: DataFrame, dim: int = 8, modulus: int = 1009,
                       k_hits: int = 10, max_candidates: int = 100_000,
                       hash_family: str = "md5_60", s: str = "subj",
                       p: str = "pred", o: str = "obj") -> DataFrame:
    """DistMult ranking evaluation (Yang et al. 2015, "Embedding Entities
    and Relations..."): the bilinear-diagonal score
    ``sum_i h_i * r_i * t_i`` — HIGHER is better, unlike TransE's
    distance — with the same all-candidate protocol, deterministic
    tie-break (equal score ranks the smaller candidate id first) and
    integer hash embeddings as :func:`transe_rank_eval`, so the ranks are
    engine-exact.  Per-term bound: (modulus-1)^3 * dim must stay below
    2^63 — the default 1009^3 * 8 ≈ 8.2e9 has 9 orders of headroom.

    Same scale contract as TransE eval: the candidate side is
    vocabulary-sized and broadcast; ``max_candidates`` guards against a
    corpus-sized id set (rank against sampled corruptions at 10^12).
    """
    if (modulus - 1) ** 3 * dim >= 2 ** 63:
        raise ValueError("modulus^3 * dim overflows BIGINT scores")
    ents = (triples.select(F.col(s).alias("id"))
            .unionByName(triples.select(F.col(o).alias("id")))
            .distinct())
    n = ents.count()
    if n > max_candidates:
        raise ValueError(
            f"{n} candidate entities > max_candidates={max_candidates}; "
            "rank against sampled corruptions at this scale")
    ent_emb = hash_embeddings(ents, dim, "e", modulus, hash_family)
    rel_emb = hash_embeddings(triples.select(F.col(p).alias("id")).distinct(),
                              dim, "r", modulus, hash_family)

    def trilinear(h, r, t):
        return F.aggregate(
            F.zip_with(F.zip_with(h, r, lambda a, b: a * b), t,
                       lambda hr, c: hr * c),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    base = (triples.select(s, p, o)
            .join(F.broadcast(ent_emb.select(F.col("id").alias(s),
                                             F.col("emb").alias("h_emb"))), s)
            .join(F.broadcast(rel_emb.select(F.col("id").alias(p),
                                             F.col("emb").alias("r_emb"))), p))
    cands = (base.crossJoin(F.broadcast(
                ent_emb.select(F.col("id").alias("cand"),
                               F.col("emb").alias("c_emb"))))
             .select(s, p, o, "cand",
                     trilinear(F.col("h_emb"), F.col("r_emb"),
                               F.col("c_emb")).alias("score")))
    better = (F.col("score") > F.col("true_score")) | \
             ((F.col("score") == F.col("true_score")) &
              (F.col("cand") < F.col(o)))
    trues = (cands.filter(F.col("cand") == F.col(o))
             .select(s, p, o, F.col("score").alias("true_score")))
    return (cands.join(trues, [s, p, o])
            .groupBy(s, p, o)
            .agg((F.lit(1) + F.sum(better.cast("long"))).alias("rank"))
            .select(s, p, o, "rank",
                    (F.col("rank") <= k_hits).cast("int").alias("hit")))


def complex_rank_eval(triples: DataFrame, dim: int = 8, modulus: int = 1009,
                      k_hits: int = 10, max_candidates: int = 100_000,
                      hash_family: str = "md5_60", s: str = "subj",
                      p: str = "pred", o: str = "obj") -> DataFrame:
    """ComplEx ranking evaluation (Trouillon et al. 2016, "Complex
    Embeddings for Simple Link Prediction"): entities and relations get a
    COMPLEX vector (re, im) and the score is

        Re(<w_r, e_s, conj(e_o)>) = sum_i [ re_r(re_h re_t + im_h im_t)
                                          + im_r(re_h im_t - im_h re_t) ]

    HIGHER is better.  Unlike DistMult the imaginary part makes the score
    ANTISYMMETRIC in (h, t), so ComplEx can rank directed relations that
    DistMult provably cannot.  Same all-candidate protocol, deterministic
    tie-break, integer hash embeddings, and scale contract (broadcast
    vocabulary-sized candidate side, ``max_candidates`` guard) as
    :func:`transe_rank_eval` / :func:`distmult_rank_eval`.  Per-term
    bound: 2 * (modulus-1)^3 * dim must stay below 2^63.
    """
    if 2 * (modulus - 1) ** 3 * dim >= 2 ** 63:
        raise ValueError("2 * modulus^3 * dim overflows BIGINT scores")
    ents = (triples.select(F.col(s).alias("id"))
            .unionByName(triples.select(F.col(o).alias("id")))
            .distinct())
    n = ents.count()
    if n > max_candidates:
        raise ValueError(
            f"{n} candidate entities > max_candidates={max_candidates}; "
            "rank against sampled corruptions at this scale")
    rels = triples.select(F.col(p).alias("id")).distinct()

    def cemb(ids, re_prefix, im_prefix):
        re = hash_embeddings(ids, dim, re_prefix, modulus, hash_family)
        im = (hash_embeddings(ids, dim, im_prefix, modulus, hash_family)
              .withColumnRenamed("emb", "emb_im"))
        return re.join(im, "id")

    ent_emb = cemb(ents, "er", "ei")
    rel_emb = cemb(rels, "rr", "ri")

    def rescore(hr, hi, rr, ri, tr, ti):
        # four trilinear folds over aligned arrays; all BIGINT
        def tri(a, b, c):
            return F.aggregate(
                F.zip_with(F.zip_with(a, b, lambda x, y: x * y), c,
                           lambda xy, z: xy * z),
                F.lit(0).cast("long"), lambda acc, x: acc + x)
        return (tri(rr, hr, tr) + tri(rr, hi, ti)
                + tri(ri, hr, ti) - tri(ri, hi, tr))

    base = (triples.select(s, p, o)
            .join(F.broadcast(ent_emb.select(F.col("id").alias(s),
                                             F.col("emb").alias("h_re"),
                                             F.col("emb_im").alias("h_im"))),
                  s)
            .join(F.broadcast(rel_emb.select(F.col("id").alias(p),
                                             F.col("emb").alias("r_re"),
                                             F.col("emb_im").alias("r_im"))),
                  p))
    cands = (base.crossJoin(F.broadcast(
                ent_emb.select(F.col("id").alias("cand"),
                               F.col("emb").alias("c_re"),
                               F.col("emb_im").alias("c_im"))))
             .select(s, p, o, "cand",
                     rescore(F.col("h_re"), F.col("h_im"),
                             F.col("r_re"), F.col("r_im"),
                             F.col("c_re"), F.col("c_im")).alias("score")))
    better = (F.col("score") > F.col("true_score")) | \
             ((F.col("score") == F.col("true_score")) &
              (F.col("cand") < F.col(o)))
    trues = (cands.filter(F.col("cand") == F.col(o))
             .select(s, p, o, F.col("score").alias("true_score")))
    return (cands.join(trues, [s, p, o])
            .groupBy(s, p, o)
            .agg((F.lit(1) + F.sum(better.cast("long"))).alias("rank"))
            .select(s, p, o, "rank",
                    (F.col("rank") <= k_hits).cast("int").alias("hit")))
