"""SHACL-lite shape validation over a distributed triple table.

The reference trusts its curated ontology and validates nothing; its
pytest suite IS its validation (SURVEY §5).  An extracted web-scale KG
inverts that: triples arrive dirty, and constraint validation is a
first-class pipeline stage (W3C SHACL is the standard vocabulary; this
implements the workhorse core constraints as DataFrame anti-joins).

Supported constraint kinds, one row each in the ``shapes`` table
(kind, pred, arg):

- ``maxCount``  arg=k       : a subject may hold at most k ``pred`` objects
- ``minCount``  arg=k       : every subject OF THE KG holding >=1 ``pred``
                              is fine; subjects with 0 are only violations
                              when the shape also lists a ``domain`` class
                              (targeting) — we implement the targeted form:
                              every instance of class ``cls`` must hold
                              >= k ``pred`` objects
- ``class``     arg=cls     : every object of ``pred`` must have
                              (obj, type, cls) in the KG
- ``datatype``  arg=regex   : every object of ``pred`` must match regex
                              (engine-portable, no lookarounds)
- ``nodeKind``  arg=prefix  : every object of ``pred`` must start with
                              prefix (IRI-namespace check)

Targeted minCount shapes carry ``cls`` in a fourth column (NULL
elsewhere).  Violations report (subj, pred, kind, detail) — detail is a
human-readable count/value, stringified so the row hash-compares across
engines.

Scale shape: every check is one scan-side aggregate or one broadcast
semi/anti-join against vocabulary-sized shape rows; nothing is
quadratic, nothing collects.  The checks run independently and union —
Spark schedules them as one DAG over a single KG scan (localCheckpoint
the input upstream if it is an expensive derived plan).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

S, P, O = "subj", "pred", "obj"
KINDS = ("maxCount", "minCount", "class", "datatype", "nodeKind")


def shacl_violations(triples: DataFrame, shapes: DataFrame,
                     type_pred: str = "type") -> DataFrame:
    """Validate ``triples`` against ``shapes`` (kind, pred, arg[, cls]).

    Returns (subj, pred, kind, detail) — one row per violating subject
    per shape row, deterministic.  Unknown constraint kinds RAISE
    (silently ignored constraints are invisible — loud-failure
    invariant)."""
    cols = shapes.columns
    sh = shapes.select(
        "kind", "pred", F.col("arg").cast("string").alias("arg"),
        (F.col("cls") if "cls" in cols else F.lit(None)).cast("string")
        .alias("cls"))
    bad = [r["kind"] for r in
           sh.select("kind").distinct().collect() if r["kind"] not in KINDS]
    if bad:
        raise ValueError(f"unknown SHACL constraint kinds: {sorted(bad)}")
    t = triples.select(S, P, O)
    out = []

    # maxCount: per-(subj, pred) count joined against the shape row
    mx = sh.filter(F.col("kind") == "maxCount") \
           .select(F.col("pred").alias(P), F.col("arg").cast("long")
                   .alias("_k"))
    if not mx.isEmpty():
        counts = (t.join(F.broadcast(mx), P)
                  .groupBy(S, P, "_k").agg(F.count("*").alias("_n")))
        out.append(counts.filter(F.col("_n") > F.col("_k"))
                   .select(S, P, F.lit("maxCount").alias("kind"),
                           F.concat(F.lit("count="),
                                    F.col("_n").cast("string"))
                           .alias("detail")))

    # minCount (targeted): every (x, type, cls) must hold >= k pred objs
    mn = sh.filter(F.col("kind") == "minCount") \
           .select(F.col("pred").alias("_p"), F.col("arg").cast("long")
                   .alias("_k"), "cls")
    if not mn.isEmpty():
        members = (t.filter(F.col(P) == type_pred)
                   .select(S, F.col(O).alias("cls"))
                   .join(F.broadcast(mn), "cls"))
        have = (t.groupBy(S, P).agg(F.count("*").alias("_n"))
                .withColumnRenamed(P, "_p"))
        got = (members.join(have, [S, "_p"], "left")
               .select(S, "_p", "_k",
                       F.coalesce("_n", F.lit(0)).alias("_n")))
        out.append(got.filter(F.col("_n") < F.col("_k"))
                   .select(S, F.col("_p").alias(P),
                           F.lit("minCount").alias("kind"),
                           F.concat(F.lit("count="),
                                    F.col("_n").cast("string"))
                           .alias("detail")))

    # class: object of pred must be typed cls
    cl = sh.filter(F.col("kind") == "class") \
           .select(F.col("pred").alias(P), F.col("arg").alias("_cls"))
    if not cl.isEmpty():
        typed = t.filter(F.col(P) == type_pred) \
                 .select(F.col(S).alias(O), F.col(O).alias("_cls"))
        objs = t.join(F.broadcast(cl), P).select(S, P, O, "_cls").distinct()
        out.append(objs.join(typed, [O, "_cls"], "left_anti")
                   .select(S, P, F.lit("class").alias("kind"),
                           F.concat(F.lit("obj="), F.col(O)).alias("detail")))

    # datatype: object must match regex
    dt = sh.filter(F.col("kind") == "datatype") \
           .select(F.col("pred").alias(P), F.col("arg").alias("_re"))
    if not dt.isEmpty():
        objs = t.join(F.broadcast(dt), P)
        # column-valued regex: SQL RLIKE accepts a non-foldable pattern
        # (recompiled per row — the shape side is tiny, the pattern
        # column is constant per shape row after the broadcast join)
        out.append(objs.filter(~F.expr(f"{O} RLIKE _re"))
                   .select(S, P, F.lit("datatype").alias("kind"),
                           F.concat(F.lit("obj="), F.col(O)).alias("detail"))
                   .distinct())

    # nodeKind: object must carry the IRI prefix
    nk = sh.filter(F.col("kind") == "nodeKind") \
           .select(F.col("pred").alias(P), F.col("arg").alias("_pre"))
    if not nk.isEmpty():
        objs = t.join(F.broadcast(nk), P)
        out.append(objs.filter(~F.col(O).startswith(F.col("_pre")))
                   .select(S, P, F.lit("nodeKind").alias("kind"),
                           F.concat(F.lit("obj="), F.col(O)).alias("detail"))
                   .distinct())

    if not out:
        return t.select(S, P, F.lit("").alias("kind"),
                        F.lit("").alias("detail")).limit(0)
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.distinct()
