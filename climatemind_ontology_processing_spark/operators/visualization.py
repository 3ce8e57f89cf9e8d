"""Visualization annotation + subgraph extraction
(``process_visualization.py:35-132``, SURVEY §2.7 G2/G9/G10, §2.6 U4).

Cyto annotation (:35-73):
* edge gets "solution-edge" if either endpoint carries the "risk solution"
  key, ELSE "edge-no-source" if its property bag is empty;
* node gets "risk-solution" if it carries the key, "personal-value" if
  ``any(personal_values_10)`` (Python truthiness: -1/1 truthy, 0/None falsy).
* the ``risk_or_personal_value_node`` block at :59-72 is dead code in the
  reference (flag never set True; would NameError on SOURCE_TYPES) — per
  SURVEY §4.2 we never emit "no-long-description"/"node-no-sources".

Subgraphs (:75-132) over the annotated graph (B minus myth nodes):
* upstream                = reverse BFS, causes edges only  (NOTE: extracted
  at ``__init__`` :16-18, BEFORE cyto annotation — the pickled 'upstream'
  nodes carry no cyto_classes; as tables this only affects attr parity)
* downstream_adaptations  = forward BFS, any edge type
* downstream              = forward BFS, causes edges only
* upstream_mitigations    = union(upstream nodes, mitigation nodes), induced
* per-personal-value      = reverse BFS (any type) from each pv node over the
  downstream_adaptations subgraph with solution-pointing edges REVERSED (G9,
  :120-127); all ~20 seeds expand in ONE tagged iterative join (G10).

Output representation: ``subgraphs(subgraph_name, node_id)`` plus induced
edge tables — partitioned-by-name friendly (SURVEY §2.1 S7).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CAUSES, GREENHOUSE_EFFECT
from ..functions.arrays import any_truthy
from .myths import RISK_SOLUTION_KEY, myth_nodes
from .traversal import bfs_reachable, bfs_reachable_tagged, induced_edges


def _risk_solution_ids(nodes: DataFrame) -> DataFrame:
    return nodes.filter(
        F.col("super_class_membership").isNotNull() &
        F.map_contains_key("super_class_membership", RISK_SOLUTION_KEY)
    ).select(F.col("label").alias("id"))


def annotated_graph(nodes: DataFrame, edges_b: DataFrame) -> tuple[DataFrame, DataFrame]:
    """``get_annotated`` (make_graph_class.py:381-393): B minus myth nodes."""
    myths = myth_nodes(nodes).select(F.col("label").alias("id"))
    kept_nodes = nodes.join(F.broadcast(myths),
                            nodes.label == F.col("id"), "left_anti")
    kept_edges = induced_edges(edges_b, kept_nodes.select("label"))
    return kept_nodes, kept_edges


def annotate_cyto_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    risk = _risk_solution_ids(nodes)
    a = risk.withColumnRenamed("id", "src").withColumn("_ra", F.lit(True))
    b = risk.withColumnRenamed("id", "dst").withColumn("_rb", F.lit(True))
    joined = (edges.join(F.broadcast(a), "src", "left")
                   .join(F.broadcast(b), "dst", "left"))
    cyto = (F.when(F.col("_ra") | F.col("_rb"), F.array(F.lit("solution-edge")))
            .when(F.size(F.map_keys(F.coalesce(
                F.col("properties"),
                F.from_json(F.lit("{}"), "map<string,array<string>>")))) == 0,
                F.array(F.lit("edge-no-source")))
            .otherwise(F.array().cast("array<string>")))
    return joined.withColumn("cyto_classes", cyto).drop("_ra", "_rb")


def annotate_cyto_nodes(nodes: DataFrame) -> DataFrame:
    is_risk = (F.col("super_class_membership").isNotNull() &
               F.map_contains_key("super_class_membership", RISK_SOLUTION_KEY))
    is_pv = any_truthy(F.col("personal_values_10"))
    cyto = F.filter(
        F.array(
            F.when(is_risk, F.lit("risk-solution")),
            F.when(is_pv, F.lit("personal-value")),
        ), lambda x: x.isNotNull())
    return nodes.withColumn("cyto_classes", cyto)


def reverse_solution_edges(edges: DataFrame, adaptation_ids: DataFrame) -> DataFrame:
    """G9 — swap (src, dst) for edges whose dst is an adaptation node
    (``process_visualization.py:120-127``)."""
    tgt = adaptation_ids.select(
        F.col(adaptation_ids.columns[0]).alias("dst")).withColumn("_adapt", F.lit(True))
    joined = edges.join(F.broadcast(tgt), "dst", "left")
    swap = F.col("_adapt").isNotNull()
    out_cols = [c for c in edges.columns if c not in ("src", "dst")]
    return joined.select(
        F.when(swap, F.col("dst")).otherwise(F.col("src")).alias("src"),
        F.when(swap, F.col("src")).otherwise(F.col("dst")).alias("dst"),
        *out_cols)


def filter_by_edge_type(nodes: DataFrame, edges: DataFrame,
                        edge_type: str | None = None
                        ) -> tuple[DataFrame, DataFrame]:
    """P7 — edge-type display filter (``visualize.py:248-264``
    ``get_filtered_data``): None keeps everything; otherwise keep edges of
    exactly that type plus their incident nodes (duplicates deduped — the
    reference appends both endpoints per edge; node identity is a set)."""
    if edge_type is None:
        return nodes, edges
    kept = edges.filter(F.col("type") == edge_type)
    endpoint_ids = (kept.select(F.col("src").alias("label"))
                    .unionByName(kept.select(F.col("dst").alias("label")))
                    .distinct())
    return nodes.join(endpoint_ids, "label", "left_semi"), kept


def _build_subgraphs_local(nodes: DataFrame, edges_annot: DataFrame,
                           mitigation_ids: DataFrame, adaptation_ids: DataFrame,
                           root: str) -> dict:
    """Small-graph path: every subgraph node set, the reversed-solutions
    edge list, and the per-pv tagged BFS computed on the memoized collected
    edge list — the 25-subgraph fan-out costs three tiny collects (edge
    rows, pv labels, mitigation/adaptation ids) instead of ~25 join plans.
    Returns plain Python collections under key "__local__" alongside the
    DataFrame views of the same data (identical rows to the distributed
    branch; pinned by the golden parity suite)."""
    from collections import defaultdict

    from ..functions.arrays import any_truthy
    from .traversal import (_bfs_local, _collect_edge_rows, _collect_hops,
                            _local_rows)

    spark = edges_annot.sparkSession
    rows = _collect_edge_rows(edges_annot)
    upstream = sorted(_bfs_local(_collect_hops(edges_annot, "reverse", CAUSES),
                                 [root]))
    down_adapt = _bfs_local(_collect_hops(edges_annot, "forward", None), [root])
    downstream = sorted(_bfs_local(_collect_hops(edges_annot, "forward", CAUSES),
                                   [root]))
    mit_stash = _local_rows(mitigation_ids)
    adapt_stash = _local_rows(adaptation_ids)
    mit_ids = {r[0] for r in (mit_stash if mit_stash is not None
                              else mitigation_ids.collect())}
    adapt_ids = {r[0] for r in (adapt_stash if adapt_stash is not None
                                else adaptation_ids.collect())}
    upstream_mit = sorted(set(upstream) | mit_ids)

    # reversed-solutions graph restricted to downstream_adaptations
    da = [(s, d) for s, d, _t in rows if s in down_adapt and d in down_adapt]
    rev = sorted({(d, s) if d in adapt_ids else (s, d) for s, d in da})
    rev_adj: dict = defaultdict(list)
    for s, d in rev:
        rev_adj[d].append(s)      # reverse direction for the pv BFS

    pv_labels = sorted(
        r[0] for r in nodes.select("label")
        .filter(any_truthy(F.col("personal_values_10"))).collect())
    pv_members = {tag: sorted(_bfs_local(rev_adj, [tag])) for tag in pv_labels}

    ty = edges_annot.schema["src"].dataType.simpleString()

    def _df(vals):
        # stash the rows: downstream consumers (myths, solution-source
        # gating) turn membership joins into literal isin filters when the
        # id list is already driver-side
        from .traversal import _stash_local_rows
        rows = [(v,) for v in vals]
        return _stash_local_rows(
            spark.createDataFrame(rows, f"id {ty}"), rows)

    return {
        "upstream": _df(upstream),
        "downstream_adaptations": _df(sorted(down_adapt)),
        "downstream": _df(downstream),
        "upstream_mitigations": _df(upstream_mit),
        "__pv__": spark.createDataFrame(
            [(tag, v) for tag in pv_labels for v in pv_members[tag]],
            f"tag string, id {ty}"),
        "__pv_edges_base__": spark.createDataFrame(
            rev, f"src {ty}, dst {ty}"),
        "__local__": {
            "upstream": set(upstream),
            "downstream_adaptations": set(down_adapt),
            "downstream": set(downstream),
            "upstream_mitigations": set(upstream_mit),
            "pv_members": pv_members,
            "rev_edges": rev,
            "edge_rows": rows,
        },
    }


def build_subgraphs(nodes: DataFrame, edges_annot: DataFrame,
                    mitigation_ids: DataFrame, adaptation_ids: DataFrame,
                    root: str = GREENHOUSE_EFFECT) -> dict[str, DataFrame]:
    """All named subgraph node sets.  Returns {name: DataFrame[id]}; pv
    subgraphs are returned together under key "__pv__" as DataFrame[tag, id];
    on small graphs a "__local__" key additionally carries the driver-side
    collections for :func:`subgraph_tables` to reuse."""
    from .traversal import _edge_count_small

    if _edge_count_small(edges_annot):
        return _build_subgraphs_local(nodes, edges_annot, mitigation_ids,
                                      adaptation_ids, root)
    upstream = bfs_reachable(edges_annot, [root], "reverse", CAUSES)
    downstream_adapt = bfs_reachable(edges_annot, [root], "forward", None)
    downstream = bfs_reachable(edges_annot, [root], "forward", CAUSES)
    upstream_mit = (upstream.unionByName(
        mitigation_ids.select(F.col(mitigation_ids.columns[0]).alias("id")))
        .distinct())

    # per-personal-value: reversed-solutions graph restricted to
    # downstream_adaptations, tagged multi-seed reverse BFS
    da_edges = induced_edges(edges_annot, downstream_adapt)
    rev = reverse_solution_edges(da_edges, adaptation_ids)
    pv_nodes = (annotate_cyto_nodes(nodes)
                .filter(any_truthy(F.col("personal_values_10")))
                .select(F.col("label").alias("tag"), F.col("label").alias("id")))
    pv_members = bfs_reachable_tagged(rev, pv_nodes, "reverse", None)

    return {
        "upstream": upstream,
        "downstream_adaptations": downstream_adapt,
        "downstream": downstream,
        "upstream_mitigations": upstream_mit,
        "__pv__": pv_members,
        "__pv_edges_base__": rev,
    }


def subgraph_tables(subgraphs: dict[str, DataFrame],
                    edges_annot: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Materialize (subgraph_name, node_id) and (subgraph_name, src, dst)
    tables — the engine's S7 sink shape, partitionable by subgraph_name."""
    loc = subgraphs.get("__local__")
    if loc is not None:
        # small-graph path: induce every named + pv subgraph's edges on the
        # already-collected rows — two createDataFrames instead of a
        # 25-branch union-of-joins plan
        spark = edges_annot.sparkSession
        pairs = {(s, d) for s, d, _t in loc["edge_rows"]}
        nrows, erows = [], set()
        for name in ("upstream", "downstream_adaptations", "downstream",
                     "upstream_mitigations"):
            ns = loc[name]
            nrows.extend((name, v) for v in sorted(ns))
            erows.update((name, s, d) for s, d in pairs
                         if s in ns and d in ns)
        for tag, members in loc["pv_members"].items():
            ms = set(members)
            nrows.extend((tag, v) for v in members)
            erows.update((tag, s, d) for s, d in loc["rev_edges"]
                         if s in ms and d in ms)
        ty = edges_annot.schema["src"].dataType.simpleString()
        return (spark.createDataFrame(
                    nrows, f"subgraph_name string, node_id {ty}"),
                spark.createDataFrame(
                    sorted(erows), f"subgraph_name string, src {ty}, dst {ty}"))
    parts_n = []
    parts_e = []
    for name, df in subgraphs.items():
        if name.startswith("__pv_edges") or name == "__local__":
            continue
        if name == "__pv__":
            parts_n.append(df.select(F.col("tag").alias("subgraph_name"),
                                     F.col("id").alias("node_id")))
            rev = subgraphs["__pv_edges_base__"]
            e = (df.alias("m")
                 .join(rev.alias("e"), F.col("m.id") == F.col("e.src"))
                 .join(df.alias("m2"),
                       (F.col("m2.tag") == F.col("m.tag")) &
                       (F.col("m2.id") == F.col("e.dst")), "left_semi")
                 .select(F.col("m.tag").alias("subgraph_name"),
                         F.col("e.src").alias("src"), F.col("e.dst").alias("dst")))
            parts_e.append(e)
        else:
            parts_n.append(df.select(F.lit(name).alias("subgraph_name"),
                                     F.col("id").alias("node_id")))
            ind = induced_edges(edges_annot, df)
            parts_e.append(ind.select(F.lit(name).alias("subgraph_name"),
                                      "src", "dst"))
    nodes_t = parts_n[0]
    for p in parts_n[1:]:
        nodes_t = nodes_t.unionByName(p)
    edges_t = parts_e[0]
    for p in parts_e[1:]:
        edges_t = edges_t.unionByName(p)
    return nodes_t, edges_t.distinct()
