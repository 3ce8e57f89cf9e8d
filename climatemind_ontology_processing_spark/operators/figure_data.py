"""EP3 closure — figure DATA for the reference's Dash/Plotly visualizer.

The reference's last pipeline step renders the processed graph with
graphviz + Plotly (``visualize/visualize.py``): node ovals at graphviz
positions (``:345-370``), cubic-Bézier edge splines from graphviz control
points (``get_figure``, ``:53-232``), arrow/tee adornments per edge type,
and an edge-type display filter (``get_filtered_data``, ``:248-264``).
The FIGURE OBJECT itself (Plotly traces, Dash callbacks) is a
presentation-layer non-goal (SURVEY §3 EP3) — but everything Plotly
*consumes* is data, and this module produces exactly that as DataFrames:

* ``figure_nodes`` — one row per displayed node: deterministic Sugiyama
  position (``layout.dot_layout``, the graphviz-``dot`` analog), an
  oval width/height from the label length (graphviz sizes node ovals to
  fit the label; same rule, fixed constants), and the reference's
  hovertext strings (classes + properties, ``visualize.py:356-365``).
* ``figure_edges`` — one row per displayed edge: 4 cubic-Bézier control
  points (straight-line spline — our layout emits no spline routing, so
  the control polygon is the degenerate straight cubic), ``num_samples``
  sampled path coordinates evaluated IN-PLAN (Bernstein basis as column
  arithmetic, no Python per row), and the adornment geometry the
  reference draws per edge type (arrowhead for ``causes_or_promotes``,
  tee for the inhibition type — ``visualize.py:156-206``, with the
  angle in DEGREES; the reference passes ``theta/2`` to ``math.tan`` in
  radians, a quirk faithfully NOT reproduced).

Filter semantics are ``visualization.filter_by_edge_type`` (P7), shared
with the cytoscape path.  Layout runs on the FULL graph and display
filtering selects from it — matching the reference, which lays out once
and filters per-callback.

Scale note: figure data is presentation output for a curated subgraph
(the reference renders ~hundreds of nodes); ``dot_layout`` guards with
``max_layout_nodes``.  Everything after the layout join is narrow
column arithmetic.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .layout import dot_layout
from .visualization import filter_by_edge_type

CAUSES_TYPE = "causes_or_promotes"
INHIBIT_TYPE = "is_inhibited_or_prevented_or_blocked_or_slowed_by"
DEFAULT_EDGE_TYPES = (INHIBIT_TYPE, CAUSES_TYPE)

# graphviz sizes ovals to the label at 14pt; 72 points/inch as in the
# reference's `0.5 * width * 72` scaling (visualize.py:100-103)
_CHAR_WIDTH_IN = 0.11
_MIN_WIDTH_IN = 0.75
_NODE_HEIGHT_IN = 0.5


def _hover_join(arr_col, fmt: str):
    return F.concat_ws("<br>-", F.transform(arr_col,
                                            lambda x: F.format_string(fmt, x)))


def figure_nodes(nodes: DataFrame, edges: DataFrame,
                 edge_type: str | None = None,
                 label_col: str = "label") -> DataFrame:
    """(name, x, y, layer, width, height, node_hovertext,
    non_default_edge_type) for every displayed node.

    ``non_default_edge_type`` mirrors ``visualize.py:366-369``: the type of
    any OUT-edge of the node whose type is outside the two default causal
    types (used to paint the node orange), else NULL.

    KNOWN LIMITATION: positions come from ``dot_layout`` over the edge
    set, so a node with NO incident edges has no layout row and is not
    drawn (the processed climate graph is connected; graphviz would place
    isolated nodes arbitrarily anyway).  Callers with isolated nodes
    should synthesize positions before joining.
    """
    f_nodes, _ = filter_by_edge_type(nodes, edges, edge_type)
    pos = dot_layout(edges)

    classes_txt = _hover_join(
        F.coalesce(F.col("all_classes"), F.array().cast("array<string>")),
        "<b>%s</b>")
    props_txt = _hover_join(
        F.coalesce(
            F.transform(
                F.map_entries(F.col("properties")),
                lambda e: F.format_string(
                    "<b>%s</b>: %s", e.getField("key"),
                    F.array_join(e.getField("value"), ", "))),
            F.array().cast("array<string>")),
        "%s")
    hover = F.concat(F.lit("<b>Node classes:</b><br>"), classes_txt,
                     F.lit("<br><br><b>Nodes properties:</b><br>"), props_txt)

    non_default = (edges
                   .filter(~F.col("type").isin(*DEFAULT_EDGE_TYPES))
                   .groupBy(F.col("src").alias(label_col))
                   .agg(F.max("type").alias("non_default_edge_type")))

    name = F.col(label_col)
    return (f_nodes
            .join(pos.withColumnRenamed("id", label_col), label_col)
            .join(non_default, label_col, "left")
            .select(
                name.alias("name"), "x", "y", "layer",
                F.greatest(F.lit(_MIN_WIDTH_IN),
                           F.length(name) * _CHAR_WIDTH_IN).alias("width"),
                F.lit(_NODE_HEIGHT_IN).alias("height"),
                hover.alias("node_hovertext"),
                "non_default_edge_type"))


def _bezier_coord(c0, c1, c2, c3, num: int):
    """Cubic-Bézier samples of one coordinate as an in-plan double array:
    B(t) = (1-t)^3 c0 + 3(1-t)^2 t c1 + 3(1-t) t^2 c2 + t^3 c3."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num - 1)),
        lambda i: (
            F.pow(1 - i / (num - 1), 3) * c0
            + 3 * F.pow(1 - i / (num - 1), 2) * (i / (num - 1)) * c1
            + 3 * (1 - i / (num - 1)) * F.pow(i / (num - 1), 2) * c2
            + F.pow(i / (num - 1), 3) * c3))


def figure_edges(nodes: DataFrame, edges: DataFrame,
                 edge_type: str | None = None, num_samples: int = 20,
                 arrow_height: float = 8.66, tee_width: float = 10.0
                 ) -> DataFrame:
    """(node1, node2, edge_type, ctrl_x, ctrl_y, path_x, path_y, adornment,
    adorn_x, adorn_y, edge_hovertext) for every displayed edge.

    Control polygon: straight cubic (p0, p0+d/3, p0+2d/3, p3) between the
    laid-out endpoint centers.  ``path_x/path_y`` sample the Bézier at
    ``num_samples`` uniform t values (endpoints included).  Adornments
    (``visualize.py:156-206``): ``causes_or_promotes`` edges get a
    3-point arrowhead at the SOURCE end of the drawn path (the reference
    anchors at ``path[0]``), inhibition edges a 2-point tee at the target
    end; both are perpendicular offsets of the local tangent.
    """
    _, f_edges = filter_by_edge_type(nodes, edges, edge_type)
    pos = dot_layout(edges)

    e = (f_edges
         .join(pos.select(F.col("id").alias("src"),
                          F.col("x").alias("x0"), F.col("y").alias("y0")),
               "src")
         .join(pos.select(F.col("id").alias("dst"),
                          F.col("x").alias("x3"), F.col("y").alias("y3")),
               "dst"))
    dx, dy = F.col("x3") - F.col("x0"), F.col("y3") - F.col("y0")
    e = (e.withColumn("x1", F.col("x0") + dx / 3)
          .withColumn("y1", F.col("y0") + dy / 3)
          .withColumn("x2", F.col("x0") + 2 * dx / 3)
          .withColumn("y2", F.col("y0") + 2 * dy / 3))

    path_x = _bezier_coord(F.col("x0"), F.col("x1"), F.col("x2"),
                           F.col("x3"), num_samples)
    path_y = _bezier_coord(F.col("y0"), F.col("y1"), F.col("y2"),
                           F.col("y3"), num_samples)

    # unit tangent (straight control polygon -> constant tangent)
    nrm = F.sqrt(dx * dx + dy * dy)
    ux, uy = dx / nrm, dy / nrm
    vx, vy = -uy, ux                       # left normal
    half_w = arrow_height * 0.41421356     # tan(22.5 deg): 45-degree head

    # arrowhead at the source end pointing backwards along the edge
    # (reference: A=path[20], B=path[0]); tee across the target end
    ax = F.array(F.col("x0") + arrow_height * ux + half_w * vx,
                 F.col("x0"),
                 F.col("x0") + arrow_height * ux - half_w * vx)
    ay = F.array(F.col("y0") + arrow_height * uy + half_w * vy,
                 F.col("y0"),
                 F.col("y0") + arrow_height * uy - half_w * vy)
    tx = F.array(F.col("x3") + tee_width * vx, F.col("x3") - tee_width * vx)
    ty = F.array(F.col("y3") + tee_width * vy, F.col("y3") - tee_width * vy)

    is_arrow = F.col("type") == CAUSES_TYPE
    is_tee = F.col("type") == INHIBIT_TYPE
    hover = F.concat(
        F.lit("<b>Edge properties:</b><br>"),
        F.coalesce(
            F.nullif(_hover_join(
                F.transform(
                    F.map_entries(F.col("properties")),
                    lambda kv: F.format_string(
                        "<b>%s</b>: %s", kv.getField("key"),
                        F.array_join(kv.getField("value"), ", "))),
                "%s"), F.lit("")),
            F.lit("None")))

    return e.select(
        F.col("src").alias("node1"), F.col("dst").alias("node2"),
        F.col("type").alias("edge_type"),
        F.array("x0", "x1", "x2", "x3").alias("ctrl_x"),
        F.array("y0", "y1", "y2", "y3").alias("ctrl_y"),
        path_x.alias("path_x"), path_y.alias("path_y"),
        F.when(is_arrow, F.lit("arrow"))
         .when(is_tee, F.lit("tee")).alias("adornment"),
        F.when(is_arrow, ax).when(is_tee, tx).alias("adorn_x"),
        F.when(is_arrow, ay).when(is_tee, ty).alias("adorn_y"),
        hover.alias("edge_hovertext"))


def figure_data(nodes: DataFrame, edges: DataFrame,
                edge_type: str | None = None,
                num_samples: int = 20) -> tuple[DataFrame, DataFrame]:
    """``get_figure``'s data inputs for one display filter: (figure_nodes,
    figure_edges).  The Plotly/Dash rendering on top is out of engine
    scope (SURVEY §3 EP3) — ``to_plotly_figure`` assembles it driver-side
    when a caller wants the actual figure object."""
    return (figure_nodes(nodes, edges, edge_type),
            figure_edges(nodes, edges, edge_type, num_samples))


def to_plotly_figure(fig_nodes: DataFrame, fig_edges: DataFrame,
                     height: int = 700):
    """Driver-side assembly of the reference's Plotly figure
    (``visualize.py`` ``get_figure`` ``:53-232``, wired into Dash at
    ``:421-432``) over collected ``figure_data`` outputs — figure data is
    presentation-sized by contract (the layout guard bounds it), so a
    collect here is a sink, not a scale path.

    Structure parity with the reference: one ``circle`` shape per node
    (graphviz inches -> points via the 72 factor, orange line+fill when
    ``non_default_edge_type``), one text scatter per node (hovertemplate,
    8.5pt sans-serif), per edge an optional adornment line trace (arrow ->
    blue, tee -> red) followed by the spline path trace whose marker color
    matches, and the reference's layout flags (no legend, transparent
    background, no grids, height 700).  Two documented deviations: axis
    ranges come from the DATA bounds (the reference hard-codes its
    graphviz header's canvas, ``:525-526``); class/property highlight
    recoloring is Dash-callback state, out of scope with the server.

    Returns ``plotly.graph_objects.Figure`` when plotly is importable,
    else the figure's documented plain-dict form (``{"data": [...],
    "layout": {...}}``, accepted verbatim by ``go.Figure``) — same
    import-guard policy as the optional sink deps."""
    shapes: list[dict] = []
    traces: list[dict] = []
    xs: list[float] = []
    ys: list[float] = []
    for r in fig_nodes.collect():
        line_color = "orange" if r.non_default_edge_type else "black"
        fillcolor = "orange" if r.non_default_edge_type else None
        x0, x1 = r.x - 0.5 * r.width * 72, r.x + 0.5 * r.width * 72
        y0, y1 = r.y - 0.5 * r.height * 72, r.y + 0.5 * r.height * 72
        shapes.append({"type": "circle", "fillcolor": fillcolor,
                       "layer": "below", "line": {"color": line_color},
                       "x0": x0, "y0": y0, "x1": x1, "y1": y1})
        traces.append({"type": "scatter", "x": [r.x], "y": [r.y],
                       "hovertemplate": r.node_hovertext, "text": r.name,
                       "mode": "text",
                       "textfont": {"color": "black", "size": 8.5,
                                    "family": "sans-serif"}})
        xs += [x0, x1]
        ys += [y0, y1]
    for r in fig_edges.collect():
        edge_color = {"arrow": "blue", "tee": "red"}.get(r.adornment, "black")
        if r.adornment is not None:
            traces.append({"type": "scatter",
                           "x": list(r.adorn_x), "y": list(r.adorn_y),
                           "line_shape": "linear", "mode": "lines",
                           "line": {"color": edge_color}})
        traces.append({"type": "scatter",
                       "x": list(r.path_x), "y": list(r.path_y),
                       "marker": {"color": edge_color},
                       "line_shape": "spline",
                       "hovertemplate": r.edge_hovertext})
        xs += [min(r.path_x), max(r.path_x)]
        ys += [min(r.path_y), max(r.path_y)]
    pad = 0.05
    xr = (min(xs), max(xs)) if xs else (0.0, 1.0)
    yr = (min(ys), max(ys)) if ys else (0.0, 1.0)
    xm, ym = pad * (xr[1] - xr[0] or 1.0), pad * (yr[1] - yr[0] or 1.0)
    fig = {"data": traces,
           "layout": {"shapes": shapes, "showlegend": False,
                      "plot_bgcolor": "rgba(0,0,0,0)", "height": height,
                      "xaxis": {"showgrid": False,
                                "range": [xr[0] - xm, xr[1] + xm]},
                      "yaxis": {"showgrid": False,
                                "range": [yr[0] - ym, yr[1] + ym]}}}
    try:
        import plotly.graph_objects as go
    except ImportError:
        return fig
    return go.Figure(fig)
