"""Benchmark harness — one JSON line on stdout.

Runs the engine's headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32):

* ``triples_pipeline`` — the core KG-construction path: deterministic
  synthetic pages (scaled to sf) -> html->text extraction -> mention/cue
  triple extraction -> dedup -> count.  Reports triples/sec and pages/sec.
* ``graph_build`` — full annotation pipeline on the golden-derived triples
  (fixed size; measures the iterative-join machinery).
* driver-table queries — co-occurrence KG, dedup suite, traversals,
  similarity top-k on the sf dir tables.

Self-certifying (round-3 verdict #3): every query runs ``$SPARK_GRAFT_REPS``
warm repetitions (default 2); the reported time is the MIN (the least
co-tenant-contaminated pass), with the full per-rep list and
``os.getloadavg()`` before/after in the JSON so a noisy-host run is
distinguishable from a code regression at a glance — CLAUDE.md: rep spread
is the trustworthiness signal.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "reps_sec": {name: [..]},
         "loadavg_start": [..], "loadavg_end": [..], "reps": N,
         "sf": ..., "triples_per_sec": ..., "pages_per_sec": ..., "cpus": ...}
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(int(os.environ.get("SPARK_GRAFT_REPS", "2")), 1)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    from climatemind_ontology_processing_spark.session import get_spark

    spark = get_spark(app_name="cmkg-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from climatemind_ontology_processing_spark.plans.pipeline import triples_from_pages
    from climatemind_ontology_processing_spark.sources.pages import pages_df

    timings: dict[str, float] = {}
    reps_sec: dict[str, list[float]] = {}

    def timed(name: str, thunk) -> None:
        """MIN of `reps` warm passes; thunk rebuilds the plan each pass so
        analysis cost is included and nothing is accidentally cached."""
        ts = []
        for _ in range(reps):
            t0 = time.time()
            thunk()
            ts.append(round(time.time() - t0, 3))
        reps_sec[name] = ts
        timings[name] = min(ts)

    # warm-up: fork python workers / heat codegen so the first timed query
    # doesn't absorb session startup
    triples_from_pages(pages_df(spark, 1000, seed=1, partitions=cpus)).count()

    # --- core pipeline: pages -> triples ------------------------------------
    n_pages = max(int(500_000 * sf), 1000)
    counts: list[int] = []
    timed("triples_pipeline", lambda: counts.append(
        triples_from_pages(
            pages_df(spark, n_pages, seed=42, partitions=cpus * 2)).count()))
    n_triples = counts[-1]
    dt = timings["triples_pipeline"]
    triples_per_sec = round(n_triples / dt, 1)
    pages_per_sec = round(n_pages / dt, 1)

    # --- graph annotation pipeline (fixed-size golden fixture) --------------
    import json as _json
    from importlib import resources

    from climatemind_ontology_processing_spark.operators.graph_pipeline import build_graph
    from climatemind_ontology_processing_spark.sources.dictionary import concepts_df

    golden = _json.loads(
        (resources.files("climatemind_ontology_processing_spark.data")
         / "golden_graph.json").read_text())
    triples_fixture = spark.createDataFrame(
        [(e["src"], e["type"], e["dst"]) for e in golden["edges"]],
        "subj string, pred string, obj string")

    def run_graph_build() -> None:
        bundle = build_graph(triples_fixture, concepts_df(spark))
        bundle.subgraph_nodes.count()
        bundle.nodes.count()

    timed("graph_build", run_graph_build)

    # --- driver-table headline queries ---------------------------------------
    headline = [
        "cooccurrence_edges", "dedup_exact", "near_dup_pairs",
        "trade_edges", "bfs_reachable",
        "closure_counts", "connected_components", "cosine_topk",
        "quality_features", "language_id",
        # round-3 additions: compressed-domain ANN, LM quality scoring,
        # directed-cycle structure, training-sequence packing
        "pq_topk", "lm_score", "scc", "sequence_packing",
        # round-4 additions: paragraph-level dedup, exact-substring spans,
        # composed IVF+PQ ANN, label-propagation communities
        "paragraph_dedup", "duplicate_spans", "ivfpq_topk",
        "label_propagation",
        # round-5 additions: DSIR data selection, AMIE chain rules,
        # sampled Brandes betweenness, landmark distance index
        "dsir_scores", "rule_mining", "sampled_betweenness",
        "landmark_distances",
        # round-5 late additions: Hearst hypernym mining, HyperBall ANF,
        # cross-KG alignment, biased node2vec walks
        "hearst_isa", "hyperball_anf", "entity_alignment",
        "node2vec_walks",
        # round-5 session-3 additions: RDFS entailment closure, ReVerb
        # open IE, linear quality-classifier scoring, integer Katz
        "rdfs_closure", "open_triples", "quality_lr", "katz_centrality",
        # round-5 session-4 additions: prefix-filtered similarity join,
        # bipartite butterfly counting, distributed Boruvka MSF,
        # integer-micro TextRank
        "ppjoin_pairs", "butterfly_counts", "boruvka_msf",
        "textrank_keywords",
    ]
    qs = entrymod.queries()
    for name in headline:
        timed(name, lambda name=name: qs[name](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps_sec": reps_sec,
        "reps": reps,
        "loadavg_start": loadavg_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "sf": sf,
        "n_pages": n_pages,
        "n_triples": n_triples,
        "triples_per_sec": triples_per_sec,
        "pages_per_sec": pages_per_sec,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
