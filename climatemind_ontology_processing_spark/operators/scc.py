"""Strongly connected components — directed-cycle structure of the KG.

Complements the acyclicity toolkit (ref `make_graph.py`'s rule-based cycle
cut, our `acyclic.residual_cycle_pairs` DAG validator): SCCs *locate* the
cycle groups — e.g. mutually-causal concept clusters that survive edge
typing — where `residual_cycle_pairs` only witnesses their existence.
Component id = MIN member id, matching `connected_components`' convention.

Size-adaptive like `traversal`: below ``SMALL_GRAPH_THRESHOLD`` edges the
graph collects to the driver and runs iterative Tarjan (one pass); above
it, the distributed FW-BW **coloring** algorithm (Orzan'04 / Fleischer et
al.'s divide-and-conquer family, the standard Pregel/MapReduce SCC shape):

  repeat until no nodes remain:
    1. TRIM: nodes with no in- or no out-edges in the remaining graph are
       singleton SCCs (peels chains/DAG fringes — keys-only joins);
    2. COLOR: propagate min-ancestor labels forward to fixpoint
       (``color(v) = min id over ancestors(v) + v``) with pointer jumping —
       valid because the ancestor relation is transitive, so
       ``color(color(v))`` is still an ancestor of ``v``;
    3. COLLECT: for each root (``color(v) == v``), backward-BFS within its
       color class; the collected set IS ``SCC(root)`` (any intermediate
       node w on a path v -> root with root ->* v satisfies w ->* root and
       root ->* w, hence shares the color — the classic FW-BW argument),
       and root is its min member;
    4. remove collected SCCs and iterate on the remainder.

Every shuffle in the distributed path carries (node, label) pairs only —
never adjacency lists or payloads; min-aggregations combine map-side.
Equivalence of the two paths is pinned in tests (same fixture style as
test_traversal_distributed).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .traversal import _checkpoint, _collect_probe_rows, _edge_count_small


def _tarjan_components(edge_rows, nodes) -> list[tuple]:
    """Iterative Tarjan; returns (id, component=min member) sorted."""
    adj: dict = {n: [] for n in nodes}
    for a, b in edge_rows:
        adj[a].append(b)
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    comp: dict = {}
    counter = 0
    for start in nodes:
        if start in index:
            continue
        work = [(start, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                rep = min(members)
                for w in members:
                    comp[w] = rep
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return sorted(comp.items())


def strongly_connected_components(edges: DataFrame, src: str = "src",
                                  dst: str = "dst", max_outer: int = 50,
                                  max_inner: int = 50) -> DataFrame:
    """Returns (id, component) over every node incident to a NON-self-loop
    edge, component = min id of the node's SCC.  Self-loops are dropped
    before node extraction (they never change SCC membership), so a node
    whose only edge is a self-loop produces no output row — callers
    joining back to a node table should left-join and default to the node
    itself.  The distributed path raises if the graph has not fully
    decomposed within ``max_outer`` rounds (a truncated result would be
    indistinguishable from a converged one)."""
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    t = e.schema["a"].dataType.simpleString()
    spark = edges.sparkSession

    if _edge_count_small(e):
        rows = _collect_probe_rows(e)
        nodes = sorted({x for ab in rows for x in ab})
        return spark.createDataFrame(_tarjan_components(rows, nodes),
                                     f"id {t}, component {t}")

    done: DataFrame | None = None

    def emit(df: DataFrame) -> None:
        nonlocal done
        done = df if done is None else done.unionByName(df)

    cur = _checkpoint(e)
    nodes = _checkpoint(cur.select(F.col("a").alias("id"))
                        .union(cur.select(F.col("b").alias("id"))).distinct())
    for _ in range(max_outer):
        if nodes.isEmpty():
            break
        # --- 1. trim singleton SCCs (no in- or no out-edges remaining)
        for _ in range(max_inner):
            core = (cur.select(F.col("a").alias("id")).distinct()
                    .join(cur.select(F.col("b").alias("id")).distinct(), "id"))
            trimmed = nodes.join(core, "id", "left_anti")
            if trimmed.isEmpty():
                break
            emit(trimmed.select("id", F.col("id").alias("component")))
            cur = _checkpoint(
                cur.join(core.withColumnRenamed("id", "a"), "a", "left_semi")
                   .join(core.withColumnRenamed("id", "b"), "b", "left_semi"))
            nodes = _checkpoint(core)
        if nodes.isEmpty():
            break
        # --- 2. min-ancestor coloring (forward propagation + pointer jump)
        color = _checkpoint(nodes.select("id", F.col("id").alias("comp")))
        for _ in range(max_inner):
            inc = (cur.join(color.select(F.col("id").alias("a"),
                                         F.col("comp").alias("cu")), "a")
                   .groupBy("b").agg(F.min("cu").alias("nbr")))
            new = (color.join(inc.withColumnRenamed("b", "id"), "id", "left")
                   .select("id", F.least(F.col("comp"),
                                         F.coalesce("nbr", "comp")).alias("comp")))
            jump = (new.alias("x")
                    .join(new.alias("y"),
                          F.col("x.comp") == F.col("y.id"), "left")
                    .select(F.col("x.id").alias("id"),
                            F.least(F.col("x.comp"),
                                    F.coalesce(F.col("y.comp"),
                                               F.col("x.comp"))).alias("comp")))
            jump = _checkpoint(jump)
            changed = (jump.join(color.withColumnRenamed("comp", "old"), "id")
                       .filter(F.col("comp") != F.col("old")))
            color = jump
            if changed.isEmpty():
                break
        else:  # pragma: no cover - loud cap-exhaustion guard
            raise RuntimeError(
                f"SCC coloring did not reach fixpoint within max_inner="
                f"{max_inner} rounds — a truncated coloring would emit "
                "wrong color classes; raise max_inner (pointer jumping "
                "needs ~log2(diameter) rounds)")
        # --- 3. collect SCC(root) by backward BFS within each color class
        members = _checkpoint(
            color.filter(F.col("id") == F.col("comp"))
                 .select("id", F.col("comp").alias("root")))
        frontier = members
        for _ in range(max_inner):
            preds = (cur.join(frontier.select(F.col("id").alias("b"), "root"),
                              "b")
                     .select(F.col("a").alias("id"), "root")
                     .join(color, "id")
                     .filter(F.col("comp") == F.col("root"))
                     .select("id", "root").distinct())
            fresh = _checkpoint(preds.join(members, ["id", "root"],
                                           "left_anti"))
            if fresh.isEmpty():
                break
            members = _checkpoint(members.unionByName(fresh))
            frontier = fresh
        else:  # pragma: no cover - loud cap-exhaustion guard
            raise RuntimeError(
                f"SCC backward collect did not converge within max_inner="
                f"{max_inner} rounds — an SCC with backward hop-depth > "
                "max_inner would be emitted PARTIALLY and its remainder "
                "mis-trimmed as singletons; raise max_inner")
        emit(members.select("id", F.col("root").alias("component")))
        # --- 4. peel the found SCCs and iterate
        found = members.select("id").distinct()
        cur = _checkpoint(
            cur.join(found.withColumnRenamed("id", "a"), "a", "left_anti")
               .join(found.withColumnRenamed("id", "b"), "b", "left_anti"))
        nodes = _checkpoint(nodes.join(found, "id", "left_anti"))
    if not nodes.isEmpty():
        raise RuntimeError(
            f"SCC decomposition did not finish within max_outer={max_outer} "
            "rounds — raise max_outer (each round peels at least one SCC "
            "per color class)")
    if done is None:                     # no non-self-loop edges at all
        return spark.createDataFrame([], f"id {t}, component {t}")
    return done
