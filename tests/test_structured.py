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


# ---------------------------------------------------------------------------
# HTML table mining
# ---------------------------------------------------------------------------
def test_html_table_cells_indices_and_cleaning(spark):
    from climatemind_ontology_processing_spark.operators.structured import (
        html_table_cells)
    html = ("<p>x</p><table class='a'><tr><th> Name </th><th>Qty</th></tr>"
            "<tr><td><b>widget</b>\n one</td><td>3</td></tr></table>"
            "<table><tr><td>solo</td></tr></table>")
    df = spark.createDataFrame([("u1", html)], "url string, html string")
    got = {(r.table_idx, r.row_idx, r.col_idx): r.cell
           for r in html_table_cells(df).collect()}
    assert got == {(0, 0, 0): "Name", (0, 0, 1): "Qty",
                   (0, 1, 0): "widget one", (0, 1, 1): "3",
                   (1, 0, 0): "solo"}


def test_html_table_facts_header_pairing_and_ragged(spark):
    from climatemind_ontology_processing_spark.operators.structured import (
        html_table_facts)
    html = ("<table><tr><th>k</th><th>v</th></tr>"
            "<tr><td>a</td><td>1</td><td>extra</td></tr>"
            "<tr><td>b</td><td>2</td></tr></table>")
    df = spark.createDataFrame([("u", html)], "url string, html string")
    got = {(r.row_idx, r.header): r.cell
           for r in html_table_facts(df).collect()}
    assert got == {(1, "k"): "a", (1, "v"): "1", (1, "col2"): "extra",
                   (2, "k"): "b", (2, "v"): "2"}


def test_html_table_no_tables_no_rows(spark):
    from climatemind_ontology_processing_spark.operators.structured import (
        html_table_facts)
    df = spark.createDataFrame([("u", "<p>no tables here</p>"), ("v", None)],
                               "url string, html string")
    assert html_table_facts(df).count() == 0
