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
                     emit_parity_files: bool = True,
                     concepts: DataFrame | None = None) -> GraphBundle:
    """Run the full EP1 pipeline; returns the GraphBundle.

    ``emit_parity_files`` additionally writes the reference-shaped
    pickle/JSON artifacts (driver-side collectors — curated-graph sizes only;
    the tables are the scale outputs).  ``concepts`` overrides the checked-in
    dictionary (e.g. one freshly built from an OWL file, S1).
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

    bundle = build_graph(triples, concepts if concepts is not None
                         else concepts_df(spark))
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


def process_ontology_file(onto_path: str, output_folder_path: str,
                          spark=None, emit_parity_files: bool = True) -> GraphBundle:
    """``processOntology(onto_path, output_folder_path)`` — the reference's
    production entry point (``process_new_ontology_file.py:10-26``), taking a
    NEW ``.owl`` file:

    1. extract edge triples from the ontology (``make_network.outputEdges``
       analog — sources/owl_reader.edge_triples) and write the CSV parity
       artifact ``output.csv`` with the reference's header,
    2. build the concept dictionary from the SAME file (S1 + the X1 subclass
       closure, computed not copied),
    3. run the full graph build + annotation passes + sinks.
    """
    from pyspark.sql import SparkSession

    from ..sources.owl_reader import concepts_df_from_owl, triples_df_from_owl

    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError("no active SparkSession; pass spark=")
    os.makedirs(output_folder_path, exist_ok=True)

    triples = triples_df_from_owl(spark, onto_path)
    # output.csv parity artifact (make_network.py:41-45 header + dedup)
    (triples.select(F.col("subj").alias("subject"),
                    F.col("obj").alias("object"),
                    F.col("pred").alias("predicate"))
     .dropDuplicates()
     .toPandas().to_csv(os.path.join(output_folder_path, "output.csv"),
                        index=False))
    concepts = concepts_df_from_owl(spark, onto_path)
    return process_ontology(None, output_folder_path, triples=triples,
                            emit_parity_files=emit_parity_files,
                            concepts=concepts)
