"""JSON-LD extraction: block order, field melt, malformed-block policy."""
from __future__ import annotations

import pytest

from climatemind_ontology_processing_spark.operators.structured import (
    jsonld_blocks, jsonld_facts)

PAGES = [
    ("u1", '<html><script type="application/ld+json">'
           '{"@type":"Product","name":"acme drill","price":"9"}</script>'
           '<p>x</p><script type="application/ld+json">'
           '{"@type":"Brand","name":"acme"}</script></html>'),
    ("u2", '<html><script type="application/ld+json">'
           'not json at all</script></html>'),
    ("u3", "<html><p>no markup</p></html>"),
    ("u4", None),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_blocks_in_document_order(spark, pages):
    got = [(r.url, r.block_idx, r.block)
           for r in jsonld_blocks(pages).orderBy("url", "block_idx").collect()]
    assert got == [
        ("u1", 0, '{"@type":"Product","name":"acme drill","price":"9"}'),
        ("u1", 1, '{"@type":"Brand","name":"acme"}'),
        ("u2", 0, "not json at all"),
    ]


def test_facts_melt_and_missing_fields(spark, pages):
    got = {(r.url, r.block_idx, r.field): r.value
           for r in jsonld_facts(pages, ("@type", "name", "price")).collect()}
    assert got == {
        ("u1", 0, "@type"): "Product",
        ("u1", 0, "name"): "acme drill",
        ("u1", 0, "price"): "9",
        ("u1", 1, "@type"): "Brand",
        ("u1", 1, "name"): "acme",
    }
    # malformed block u2 extracted as a block but yields zero facts
    assert not any(u == "u2" for u, _, _ in got)


def test_empty_fields_rejected(spark, pages):
    with pytest.raises(ValueError):
        jsonld_facts(pages, ())
