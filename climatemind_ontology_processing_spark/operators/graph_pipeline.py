"""EP1 orchestration — the engine's ``make_graph.make_graph`` (:28-67).

Stage order mirrors the reference exactly (each stage cites its impl):

  triples -> edges                          (make_graph_class.py:84-91)
  attach_attributes (J1 + A3)               (:93-304)
  set_edge_properties (J2)                  (:306-354)
  remove_edge_properties_from_nodes (U3)    (:357-376)
  make_acyclic -> B (G6)                    (:395-431)
  mitigations + ranking (G3/G7/O1)          (:433-513)
  adaptations (G4/G5/G8)                    (:515-559)
  annotated graph = B minus myths           (:381-393)
  cyto annotation + subgraphs (G2/G9/G10)   (process_visualization.py)
  myths (J4/A6/O2)                          (process_myths.py)
  causal sources (J3/A4/P6)                 (process_causal_sources.py)

Everything is lazily-planned DataFrames except the iterative traversals
(driver loops, SURVEY §4) and the tiny ranked lists (collected — they are
attributes of one root node in the reference).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import GREENHOUSE_EFFECT
from ..functions.arrays import flatten_source_lists
from .acyclic import make_acyclic
from .adaptation import adaptation_solutions, total_adaptation_nodes
from .attributes import attach_attributes
from .causal_sources import causal_sources
from .edge_props import remove_edge_properties_from_nodes, set_edge_properties
from .mitigation import mitigation_solutions, rank_mitigations, upstream_nodes
from .myths import general_myths_ranked, myth_sources, solution_and_impact_myths
from .visualization import (annotate_cyto_edges, annotate_cyto_nodes,
                            annotated_graph, build_subgraphs, subgraph_tables)


@dataclass
class GraphBundle:
    nodes: DataFrame            # post-removal attributes + annotations
    edges: DataFrame            # G edges with properties
    edges_b: DataFrame          # acyclic B edges
    annotated_nodes: DataFrame  # B minus myths, cyto-annotated
    annotated_edges: DataFrame
    subgraph_nodes: DataFrame   # (subgraph_name, node_id)
    subgraph_edges: DataFrame   # (subgraph_name, src, dst)
    mitigation_ranked: list[str] = field(default_factory=list)
    extras: dict = field(default_factory=dict)


def triples_to_edges(triples: DataFrame) -> DataFrame:
    """(subj, pred, obj) -> (src, dst, type); dedup mirrors the reference
    reading the already-deduped CSV (make_network.py:44)."""
    return (triples.select(F.col("subj").alias("src"),
                           F.col("obj").alias("dst"),
                           F.col("pred").alias("type"))
            .dropDuplicates(["src", "dst", "type"]))


def build_graph(triples: DataFrame, concepts: DataFrame,
                root: str = GREENHOUSE_EFFECT) -> GraphBundle:
    from .traversal import _adopt_probe, _edge_count_small

    edges0 = triples_to_edges(triples)
    # probe the PRE-dedup projection: the probe collect dedups driver-side
    # anyway, so the dropDuplicates exchange inside edges0 adds nothing to
    # the verdict or the rows — adopt them onto edges0
    raw_edges = triples.select(F.col("subj").alias("src"),
                               F.col("obj").alias("dst"),
                               F.col("pred").alias("type"))
    small0 = _edge_count_small(raw_edges)
    _adopt_probe(edges0, raw_edges)
    if not small0:
        return _build_graph_impl(edges0, concepts, root)
    # SMALL path: whole-stage codegen compilation dominates sub-threshold
    # runs (the ~12 annotation stages each compile large generated classes
    # for a few hundred rows; measured ~1.5 s/rep on the golden fixture).
    # Scope the toggle to this call — big graphs keep codegen.
    spark = triples.sparkSession
    key = "spark.sql.codegen.wholeStage"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        return _build_graph_impl(edges0, concepts, root)
    finally:
        spark.conf.set(key, old)


def _build_graph_impl(edges0: DataFrame, concepts: DataFrame,
                      root: str = GREENHOUSE_EFFECT) -> GraphBundle:
    from .traversal import _edge_count_small

    # Size-adaptive checkpoint width: a curated KG (hundreds..thousands of
    # edges) gains nothing from 32-partition checkpointed RDDs — every
    # downstream stage (and the 25-subgraph union fan-out) schedules that
    # many tasks per checkpoint it touches, and checkpointed RDD lineage
    # bypasses AQE coalescing so the width sticks.  SMALL graphs coalesce
    # each checkpoint to 1 partition; big graphs (> SMALL_GRAPH_THRESHOLD
    # edges) keep full parallelism.  (Lowering shuffle_partitions /
    # coalescing the driver-side traversal frames were ALSO tried and
    # measured neutral-to-negative on this pipeline — the residual cost is
    # per-stage scheduling floor spread over ~12 phases, not width.)
    small = _edge_count_small(edges0)

    from .traversal import _mark_small

    def _ckpt(df: DataFrame) -> DataFrame:
        out = (df.coalesce(1) if small else df).localCheckpoint(eager=True)
        # every edge table below derives from edges0 by filtering — once
        # edges0 probed small, skip the probe on the derived frames
        return _mark_small(out) if small else out

    # driver-built small-path outputs (upstream/mitigation/adaptation sets)
    # are already-materialized local relations — checkpointing them would
    # only add a job per stage
    _ckpt_set = (lambda df: df) if small else _ckpt

    # J1 + A3 (checkpointed: both set_edge_properties and
    # remove_edge_properties_from_nodes consume nodes0 — one attach
    # execution instead of two, and their stage jobs stop re-broadcasting
    # the concepts dictionary)
    nodes0 = _ckpt(attach_attributes(edges0, concepts))

    # J2 / A7 / U1-U3  (eager checkpoint: lazy localCheckpoint under AQE can
    # lose attribute bindings — observed "key not found: src#N" in Spark 4.1)
    edges = _ckpt(set_edge_properties(edges0, nodes0))
    nodes = _ckpt(remove_edge_properties_from_nodes(nodes0, edges))

    # G6 (checkpointed: the traversal loops below self-union this plan, and
    # deep self-unions under AQE hit the same attribute-binding bug)
    edges_b = _ckpt(make_acyclic(edges, nodes))

    # G3/G7/O1
    from .traversal import _local_rows

    ups = _ckpt_set(upstream_nodes(edges_b, root))
    mit = _ckpt_set(mitigation_solutions(edges_b, root, ups=ups))
    # small path: ONE narrow collect of the per-label annotation maps
    # replaces the rank_mitigations and general_myths collect jobs (their
    # ordering replicas are pinned in tests/test_small_path_equivalence)
    ann_rows = (nodes.select("label", "data_properties",
                             "super_class_membership").collect()
                if small else None)
    mit_rows0 = _local_rows(mit)
    if ann_rows is not None and mit_rows0 is not None:
        from .mitigation import rank_mitigations_local
        _dp = {r["label"]: r["data_properties"] for r in ann_rows}
        mit_ranked = rank_mitigations_local([r[0] for r in mit_rows0], _dp)
    else:
        mit_ranked = [r.id for r in rank_mitigations(mit, nodes).collect()]

    # G4/G5/G8 — inhibit neighbors from PRE-cut G, paths from B
    adapt = _ckpt_set(adaptation_solutions(edges, edges_b, root))
    adapt_ids = total_adaptation_nodes(adapt)

    # solution sources (A5) for mitigation + adaptation solution nodes.
    # Reference gating differs per pass: mitigation sets the attribute only
    # when non-empty (make_graph_class.py:508 ``if sources:``), adaptation
    # sets it unconditionally (:553-557) — so empty bags survive only for
    # adaptation solutions.
    from .traversal import _local_rows

    mit_rows = _local_rows(mit)
    aid_rows = _local_rows(adapt_ids)
    flat = flatten_source_lists(F.col("properties"))
    if mit_rows is not None and aid_rows is not None:
        # small path: both id sets are driver-side — literal membership
        # filters replace the flag union + groupBy + join (node labels are
        # unique, so the inner join was exactly this filter; _always =
        # max(_always) is True iff the label is an adaptation id)
        always_set = {r[0] for r in aid_rows}
        sol = sorted({r[0] for r in mit_rows} | always_set)
        in_always = (F.col("label").isin(sorted(always_set))
                     if always_set else F.lit(False))
        solution_sources_df = (nodes
            .filter(F.col("label").isin(sol) if sol else F.lit(False))
            .select("label",
                    F.when((F.size(flat) > 0) | in_always, flat)
                     .alias("solution_sources"))
            .filter(F.col("solution_sources").isNotNull()))
    else:
        sol_ids = (mit.withColumn("_always", F.lit(False))
                   .unionByName(adapt_ids.withColumn("_always", F.lit(True))))
        sol_flags = sol_ids.groupBy("id").agg(F.max("_always").alias("_always"))
        solution_sources_df = (nodes
            .join(sol_flags.withColumnRenamed("id", "label"), "label")
            .select("label",
                    F.when((F.size(flat) > 0) | F.col("_always"), flat)
                     .alias("solution_sources"))
            .filter(F.col("solution_sources").isNotNull()))

    # annotated graph + cyto + subgraphs (checkpointed: the 25-subgraph
    # fan-out below references these plans ~25x each — without truncation
    # every induced-edge branch would recompute the whole upstream pipeline)
    a_nodes, a_edges = annotated_graph(nodes, edges_b)
    a_nodes = _ckpt(annotate_cyto_nodes(a_nodes))
    a_edges = _ckpt(annotate_cyto_edges(a_edges, a_nodes))
    subs = build_subgraphs(a_nodes, a_edges, mit, adapt_ids, root)
    sub_nodes, sub_edges = subgraph_tables(subs, a_edges)

    # myths (against full G nodes/edges; downstream set from the annotated
    # subgraph per process_myths.py:42)
    down_ids = subs["downstream_adaptations"]
    myth_cat = solution_and_impact_myths(edges, nodes, down_ids)
    ups_rows = _local_rows(ups)
    if ann_rows is not None and ups_rows is not None:
        from .myths import general_myths_ranked_local
        from .traversal import _collect_edge_rows, _stash_local_rows
        _scm = {r["label"]: r["super_class_membership"] for r in ann_rows}
        gen_rows = general_myths_ranked_local(
            _collect_edge_rows(edges), _scm, _dp,
            {r[0] for r in ups_rows})
        gen_myths = _stash_local_rows(
            edges.sparkSession.createDataFrame(
                gen_rows, "myth string, myth_frequency double"), gen_rows)
        gen_myth_list = [m for m, _f in gen_rows]
    else:
        gen_myths = general_myths_ranked(edges, nodes, ups)
        gen_myth_list = [r["myth"] for r in gen_myths.collect()]
    myth_src = myth_sources(nodes)

    # causal sources
    causal = causal_sources(edges)

    # fold per-node annotation outputs back onto the node table, including
    # the two ROOT-node ranked lists the reference pins as attributes of
    # "increase in greenhouse effect" (make_graph_class.py:499-503 mitigation
    # solutions; process_myths.py:102-106 general myths) — the S4 gpickle
    # feeds an app from these fields, so the node table must carry them

    def _root_list(values: list[str]):
        arr = (F.array(*[F.lit(v) for v in values]) if values
               else F.array().cast("array<string>"))
        return F.when(F.col("label") == root, arr)

    # size-gated broadcast hints: in the small path several right sides
    # are driver-built frames (LogicalRDD, unknown stats) that would
    # otherwise plan as sort-merge joins with exchanges; above the
    # threshold they keep the planner's choice
    _b = F.broadcast if small else (lambda df: df)
    nodes_final = (nodes
        .join(_b(solution_sources_df), "label", "left")
        .join(_b(adapt.withColumnRenamed("effect", "label")), "label", "left")
        .join(_b(myth_cat.withColumnRenamed("target", "label")), "label", "left")
        .join(_b(myth_src.withColumnRenamed("myth", "label")), "label", "left")
        .join(_b(causal), "label", "left")
        .withColumn("mitigation_solutions", _root_list(mit_ranked))
        .withColumn("general_myths", _root_list(gen_myth_list)))

    return GraphBundle(
        nodes=nodes_final,
        edges=edges,
        edges_b=edges_b,
        annotated_nodes=a_nodes,
        annotated_edges=a_edges,
        subgraph_nodes=sub_nodes,
        subgraph_edges=sub_edges,
        mitigation_ranked=mit_ranked,
        extras={
            "upstream_ids": ups,
            "mitigation_ids": mit,
            "adaptations": adapt,
            "general_myths": gen_myths,
        },
    )
