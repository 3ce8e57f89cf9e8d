"""EP1 — the engine's ``processOntology`` (process_new_ontology_file.py:10-26).

The reference's production entry point runs: extract edges to CSV ->
build+annotate NetworkX graph -> visualization subgraphs -> myths -> causal
sources -> pickle + test-ontology JSON.  The engine equivalent takes a pages
table (or pre-extracted triples) and emits the same artifact set:

    out/
      triples/              parquet (+ triples.csv parity fixture, S2)
      nodes/ edges/         materialized graph tables
      subgraph_nodes/ subgraph_edges/   S7 tables (partitioned by name)
      Climate_Mind_DiGraph.gpickle      S4 parity file (driver-side)
      Climate_Mind_Digraph_Test_Ont.json S5 parity file (P5-filtered)
      graphs_for_visualization.pickle    S7 parity file
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.graph_pipeline import GraphBundle, build_graph
from ..operators.test_ontology import filter_test_ontology
from ..sources.dictionary import concepts_df
from ..sources.sinks import (save_graph_json, save_graph_pickle,
                             save_subgraphs_pickle)
from .pipeline import triples_from_pages, write_triples


def process_ontology(pages: DataFrame | None, output_dir: str,
                     triples: DataFrame | None = None,
                     emit_parity_files: bool = True) -> GraphBundle:
    """Run the full EP1 pipeline; returns the GraphBundle.

    ``emit_parity_files`` additionally writes the reference-shaped
    pickle/JSON artifacts (driver-side collectors — curated-graph sizes only;
    the tables are the scale outputs).
    """
    spark = (pages or triples).sparkSession
    os.makedirs(output_dir, exist_ok=True)

    if triples is None:
        triples = triples_from_pages(pages)
    write_triples(triples, os.path.join(output_dir, "triples"))
    # CSV parity fixture with the reference's column order/names
    # (make_network.py:41-43 header: subject, object, predicate)
    write_triples(triples.select(F.col("subj").alias("subject"),
                                 F.col("obj").alias("object"),
                                 F.col("pred").alias("predicate")),
                  os.path.join(output_dir, "triples_csv"), fmt="csv")

    bundle = build_graph(triples, concepts_df(spark))
    bundle.nodes.write.mode("overwrite").parquet(os.path.join(output_dir, "nodes"))
    bundle.edges.write.mode("overwrite").parquet(os.path.join(output_dir, "edges"))
    bundle.subgraph_nodes.write.mode("overwrite").partitionBy("subgraph_name") \
        .parquet(os.path.join(output_dir, "subgraph_nodes"))
    bundle.subgraph_edges.write.mode("overwrite").partitionBy("subgraph_name") \
        .parquet(os.path.join(output_dir, "subgraph_edges"))

    if emit_parity_files:
        save_graph_pickle(bundle.nodes, bundle.edges,
                          os.path.join(output_dir, "Climate_Mind_DiGraph.gpickle"))
        kept_nodes, kept_edges = filter_test_ontology(bundle.nodes, bundle.edges)
        save_graph_json(kept_nodes, kept_edges,
                        os.path.join(output_dir,
                                     "Climate_Mind_Digraph_Test_Ont.json"))
        save_subgraphs_pickle(bundle.annotated_nodes, bundle.annotated_edges,
                              bundle.subgraph_nodes, bundle.subgraph_edges,
                              os.path.join(output_dir,
                                           "graphs_for_visualization.pickle"))
    return bundle
