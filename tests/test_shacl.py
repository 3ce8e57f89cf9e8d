"""SHACL-lite validation: one pin per constraint kind, clean-KG empty
result, unknown-kind raise."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.shacl import (
    shacl_violations)

TRIPLES = [
    ("c1", "in_nation", "n1"),
    ("c1", "in_nation", "n2"),          # maxCount 1 violation
    ("c2", "in_nation", "n1"),
    ("c2", "type", "Customer"),
    ("c3", "type", "Customer"),          # minCount violation (no in_nation)
    ("n1", "type", "Nation"),
    ("c1", "buys_from", "s1"),
    ("s1", "type", "Supplier"),
    ("c2", "buys_from", "x9"),           # class violation (x9 untyped)
    ("c1", "year", "2024"),
    ("c2", "year", "20x4"),              # datatype violation
    ("c1", "ref", "iri:a"),
    ("c2", "ref", "raw-literal"),        # nodeKind violation
]
SHAPES = [
    ("maxCount", "in_nation", "1", None),
    ("minCount", "in_nation", "1", "Customer"),
    ("class", "buys_from", "Supplier", None),
    ("datatype", "year", "^[0-9]+$", None),
    ("nodeKind", "ref", "iri:", None),
]
SCHEMA_T = "subj string, pred string, obj string"
SCHEMA_S = "kind string, pred string, arg string, cls string"


@pytest.fixture(scope="module")
def viol(spark):
    t = spark.createDataFrame(TRIPLES, SCHEMA_T)
    s = spark.createDataFrame(SHAPES, SCHEMA_S)
    return {(r.subj, r.pred, r.kind): r.detail
            for r in shacl_violations(t, s).collect()}


def test_each_kind_fires_exactly_where_expected(viol):
    assert viol == {
        ("c1", "in_nation", "maxCount"): "count=2",
        ("c3", "in_nation", "minCount"): "count=0",
        ("c2", "buys_from", "class"): "obj=x9",
        ("c2", "year", "datatype"): "obj=20x4",
        ("c2", "ref", "nodeKind"): "obj=raw-literal",
    }


def test_clean_kg_yields_empty(spark):
    t = spark.createDataFrame(
        [("c1", "in_nation", "n1"), ("c1", "type", "Customer")], SCHEMA_T)
    s = spark.createDataFrame(SHAPES, SCHEMA_S)
    assert shacl_violations(t, s).count() == 0


def test_unknown_kind_raises(spark):
    t = spark.createDataFrame(TRIPLES, SCHEMA_T)
    s = spark.createDataFrame([("sparql", "p", "x", None)], SCHEMA_S)
    with pytest.raises(ValueError, match="unknown SHACL"):
        shacl_violations(t, s)


def test_shapes_without_cls_column(spark):
    t = spark.createDataFrame(TRIPLES, SCHEMA_T)
    s = spark.createDataFrame([("maxCount", "in_nation", "1")],
                              "kind string, pred string, arg string")
    got = {(r.subj, r.kind) for r in shacl_violations(t, s).collect()}
    assert got == {("c1", "maxCount")}
