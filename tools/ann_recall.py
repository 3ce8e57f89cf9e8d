"""Measure recall@k of the ANN paths (ivf/pq/lsh) vs brute_force_topk on a
seeded clustered corpus — the numbers behind the recall pins in
tests/test_scale_ops.py and the BENCH.md recall table.

Usage: python tools/ann_recall.py [n_clusters] [per_cluster] [dim] [k]
"""
from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clustered_corpus(n_clusters: int, per_cluster: int, dim: int,
                     noise: float = 0.25, seed: int = 7):
    """Deterministic gaussian-cluster corpus: centers ~ N(0,1), members =
    center + noise*N(0,1).  Returns (rows, query_ids): one query per
    cluster (its first member)."""
    import math
    rng = random.Random(seed)
    centers = [[rng.gauss(0, 1) for _ in range(dim)]
               for _ in range(n_clusters)]
    rows = []
    for ci, c in enumerate(centers):
        for j in range(per_cluster):
            vec = [x + noise * rng.gauss(0, 1) for x in c]
            # unit-normalize: cosine rank == L2 rank, so the ADC (L2) path
            # is graded on the same ordering as the cosine paths
            nv = math.sqrt(sum(x * x for x in vec)) or 1.0
            rows.append((ci * per_cluster + j, [x / nv for x in vec]))
    qids = [ci * per_cluster for ci in range(n_clusters)]
    return rows, qids


def clustered_corpus_np(n_clusters: int, per_cluster: int, dim: int,
                        noise: float = 0.25, seed: int = 7):
    """numpy variant for REALISTIC shapes (>=100k vectors, dim >=256) —
    same cluster structure as ``clustered_corpus``, vectorized generation
    (26M driver-side ``rng.gauss`` calls would dominate the run).  Returns
    (ids, float32 matrix, query_ids).  float32 BEFORE normalization so the
    matrix is bit-identical to what Spark's array<float> column holds."""
    import numpy as np
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    mat = (np.repeat(centers, per_cluster, axis=0)
           + noise * rng.standard_normal((n_clusters * per_cluster, dim)))
    mat = mat.astype(np.float32)
    norms = np.sqrt((mat.astype(np.float64) ** 2).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    mat = (mat / norms).astype(np.float32)
    ids = np.arange(n_clusters * per_cluster, dtype=np.int64)
    qids = ids[::per_cluster].copy()
    return ids, mat, qids


def exact_topk_np(ids, mat, qids, k: int) -> dict:
    """Ground-truth cosine top-k via one float64 matmul — the exactness
    baseline when the corpus is too big for the JVM-fold brute force.
    Excludes self-matches, mirroring ``brute_force_topk``."""
    import numpy as np
    m64 = mat.astype(np.float64)
    qidx = np.searchsorted(ids, qids)
    sims = m64[qidx] @ m64.T                      # queries x corpus
    out = {}
    for row, qid in zip(sims, qids):
        row = row.copy()
        row[np.searchsorted(ids, qid)] = -np.inf  # no self-match
        top = np.argpartition(-row, k)[:k]
        out[int(qid)] = {int(ids[i]) for i in top}
    return out


def recall_at_k(exact: dict, approx: dict, k: int) -> float:
    """mean over queries of |approx top-k ∩ exact top-k| / k."""
    tot = 0.0
    for qid, ex in exact.items():
        ap = approx.get(qid, set())
        tot += len(ex & ap) / k
    return tot / len(exact)


def main() -> None:
    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_cluster = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    # PQ geometry: the toy default (m=8 -> subdim dim/8, 16 codes) only
    # works at toy dims; realistic dims need subdim ~8 and 256 codes
    # (the standard 8-bit-code FAISS shape) — see BENCH.md §8.2
    m = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    n_codes = int(sys.argv[6]) if len(sys.argv) > 6 else 16

    from pyspark.sql import functions as F

    from climatemind_ontology_processing_spark.operators.similarity import (
        brute_force_topk, ivf_topk, ivfpq_topk, kmeans_fit, lsh_topk,
        pq_fit, pq_topk)
    from climatemind_ontology_processing_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    big = n_clusters * per_cluster > 20_000
    if big:
        ids, mat, qids = clustered_corpus_np(n_clusters, per_cluster, dim)
        rows = list(zip(ids.tolist(), mat.tolist()))
    else:
        rows, qids = clustered_corpus(n_clusters, per_cluster, dim)
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = vectors.filter(F.col("vec_id").isin([int(q) for q in qids])) \
        .select(F.col("vec_id").alias("qid"), "embedding")

    def topsets(df, score_col):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r.qid, set()).add(r.vec_id)
        return out

    t0 = time.time()
    if big:
        # JVM-fold brute force is the documented O(N*Q) baseline — at the
        # realistic shape ground truth comes from one numpy matmul instead
        exact = exact_topk_np(ids, mat, qids, k)
    else:
        exact = topsets(brute_force_topk(vectors, queries, k=k), "cos_sim")
    t_exact = time.time() - t0

    cents = kmeans_fit(vectors, dim=dim, n_cells=n_clusters, iters=3, seed=42)
    t0 = time.time()
    ivf = topsets(ivf_topk(vectors, queries, dim=dim, k=k,
                           n_cells=n_clusters, n_probe=2, centroids=cents),
                  "cos_sim")
    t_ivf = time.time() - t0

    cbs = pq_fit(vectors, dim=dim, m=m, n_codes=n_codes, iters=3, seed=42)
    t0 = time.time()
    pq = topsets(pq_topk(vectors, queries, dim=dim, codebooks=cbs, k=k,
                         m=m, n_codes=n_codes), "adc_dist")
    t_pq = time.time() - t0
    # the production PQ shape: ADC shortlist (5k) -> exact rerank; grade the
    # shortlist on whether it CONTAINS the exact top-k
    pq_short = topsets(pq_topk(vectors, queries, dim=dim, codebooks=cbs,
                               k=5 * k, m=m, n_codes=n_codes), "adc_dist")

    t0 = time.time()
    lsh = topsets(lsh_topk(vectors, queries, dim=dim, k=k, bits=16, bands=8),
                  "cos_sim")
    t_lsh = time.time() - t0

    # the composed scale path: trained cells + trained codes, shortlist
    t0 = time.time()
    ivfpq_s = topsets(ivfpq_topk(vectors, queries, dim=dim, k=5 * k,
                                 n_cells=n_clusters, n_probe=2, m=m,
                                 n_codes=n_codes, centroids=cents,
                                 codebooks=cbs), "adc_dist")
    t_ivfpq = time.time() - t0

    # residual IVFADC at the production operating point: shortlist 100*k
    # (~1% of a 100k corpus) ADC-ranked, then exact-reranked by the caller
    from climatemind_ontology_processing_spark.operators.similarity import (
        ivfpq_residuals)
    t0 = time.time()
    res = ivfpq_residuals(vectors, dim=dim, centroids=cents).localCheckpoint()
    rcbs = pq_fit(res, dim=dim, m=m, n_codes=n_codes, iters=3, seed=42)
    t_rfit = time.time() - t0
    t0 = time.time()
    ivfpq_r = topsets(ivfpq_topk(vectors, queries, dim=dim, k=100 * k,
                                 n_cells=n_clusters, n_probe=2, m=m,
                                 n_codes=n_codes, centroids=cents,
                                 codebooks=rcbs, residual=True), "adc_dist")
    t_ivfpq_r = time.time() - t0

    print(f"corpus: {len(rows)} vectors, dim {dim}, {n_clusters} clusters, "
          f"{len(qids)} queries, k={k}, pq m={m} n_codes={n_codes}")
    print(f"exact     : recall 1.000  ({t_exact:.2f}s)")
    print(f"ivf(p=2)  : recall {recall_at_k(exact, ivf, k):.3f}  ({t_ivf:.2f}s)")
    print(f"pq(m=8)   : recall {recall_at_k(exact, pq, k):.3f}  ({t_pq:.2f}s)")
    print(f"pq@{5*k} shortlist: recall {recall_at_k(exact, pq_short, k):.3f}")
    print(f"lsh(16/8) : recall {recall_at_k(exact, lsh, k):.3f}  ({t_lsh:.2f}s)")
    print(f"ivfpq@{5*k} shortlist (p=2): recall "
          f"{recall_at_k(exact, ivfpq_s, k):.3f}  ({t_ivfpq:.2f}s)")
    print(f"ivfpq-residual@{100*k} shortlist (p=2): recall "
          f"{recall_at_k(exact, ivfpq_r, k):.3f}  "
          f"(fit {t_rfit:.2f}s, query {t_ivfpq_r:.2f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
