#!/usr/bin/env python3
"""Production entry point — the engine's ``spark-submit`` job (north_rule).

Cluster usage (the 10^12-document shape):

    # package the engine once
    cd /root/repo && zip -r /tmp/cmkg.zip climatemind_ontology_processing_spark

    spark-submit \
        --py-files /tmp/cmkg.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        bin/run_pipeline.py \
        --pages <iceberg-or-parquet pages table path/name> \
        --out /warehouse/kg \
        --run-id crawl-2026-08 --buckets 4096

Local smoke (synthetic pages):

    python bin/run_pipeline.py --synthetic 10000 --out /tmp/kg --run-id t1 --buckets 8

Stages: pages -> (bucketed, resumable) triple extraction -> canonicalization ->
graph materialization + annotation passes -> nodes/edges/subgraph tables.
Each bucket writes its own partition + lineage row; rerunning the same run-id
skips completed buckets (exact resume, plans/lineage.py).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (parquet/iceberg dir)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic pages instead of --pages")
    ap.add_argument("--onto", help="process a NEW ontology .owl file end-to-end"
                    " (the reference's processOntology entry point; ignores"
                    " --pages/--synthetic)")
    ap.add_argument("--dictionary", help="concepts.json path overriding the"
                    " checked-in dictionary for the pages pipeline")
    ap.add_argument("--out", required=True, help="output warehouse dir")
    ap.add_argument("--run-id", default=None,
                    help="resume id (required for the pages pipeline; the"
                    " --onto path doesn't use lineage)")
    ap.add_argument("--buckets", type=int, default=64,
                    help="url-hash resume buckets (cluster: 1000s)")
    ap.add_argument("--skip-graph", action="store_true",
                    help="stop after triples (extraction-only run)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from climatemind_ontology_processing_spark.operators.graph_pipeline import (
        build_graph)
    from climatemind_ontology_processing_spark.plans.lineage import run_bucketed
    from climatemind_ontology_processing_spark.sources.dictionary import concepts_df
    from climatemind_ontology_processing_spark.sources.pages import pages_df

    # under spark-submit the session is provided/configured by the submitter;
    # standalone we build one
    spark = SparkSession.builder.appName("cmkg-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.onto:
        from climatemind_ontology_processing_spark.plans.process_ontology import (
            process_ontology_file)
        bundle = process_ontology_file(args.onto, args.out, spark=spark)
        print(f"ontology processed -> {args.out} "
              f"({len(bundle.mitigation_ranked)} ranked mitigations)")
        return

    if not args.run_id:
        # a defaulted id would silently share lineage between unrelated runs
        # and resume-skip buckets that belong to a different input
        ap.error("--run-id is required for the pages pipeline")
    if args.synthetic:
        pages = pages_df(spark, args.synthetic, seed=42)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("need --pages or --synthetic")

    triples_path = os.path.join(args.out, "triples")
    lineage_path = os.path.join(args.out, "lineage")
    report = run_bucketed(pages, triples_path, lineage_path,
                          run_id=args.run_id, n_buckets=args.buckets)
    print(f"extraction: processed buckets {report.processed}, "
          f"skipped (resumed) {report.skipped}")

    if args.skip_graph:
        return

    triples = spark.read.parquet(triples_path)
    bundle = build_graph(triples, concepts_df(spark, path=args.dictionary))
    bundle.nodes.write.mode("overwrite").parquet(os.path.join(args.out, "nodes"))
    bundle.edges.write.mode("overwrite").parquet(os.path.join(args.out, "edges"))
    bundle.subgraph_nodes.write.mode("overwrite").partitionBy("subgraph_name") \
        .parquet(os.path.join(args.out, "subgraph_nodes"))
    bundle.subgraph_edges.write.mode("overwrite").partitionBy("subgraph_name") \
        .parquet(os.path.join(args.out, "subgraph_edges"))
    n_nodes = spark.read.parquet(os.path.join(args.out, "nodes")).count()
    n_edges = spark.read.parquet(os.path.join(args.out, "edges")).count()
    print(f"graph: {n_nodes} nodes, {n_edges} edges, "
          f"{len(bundle.mitigation_ranked)} ranked mitigations -> {args.out}")


if __name__ == "__main__":
    main()
