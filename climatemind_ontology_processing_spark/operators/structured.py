"""Structured-data (JSON-LD) extraction from web pages.

The highest-precision triple source on the real web is not free text —
it is embedded schema.org markup: ``<script type="application/ld+json">``
blocks that sites publish for search engines.  A web-scale KG pipeline
mines these FIRST (precision ~1, no NLP) and falls back to
dictionary/pattern extraction (functions/mentions, operators/hearst,
operators/openie) for the long tail.  The reference has no counterpart
(its input is a curated OWL file); this is the web generalization of its
"trusted structured source" role.

Spark-first shape: block extraction is ``regexp_extract_all`` (one
engine-portable regex, no lookarounds), field extraction is
``get_json_object`` — both JVM-side, whole-stage-codegen, zero Python.
Malformed JSON yields NULLs (dropped, counted by the caller via
anti-join) rather than failing the scan — on the open web a crashed
batch costs more than a skipped broken block; this is the one family
where skip-quietly is the documented CORRECT behavior, and the
(block - extracted) census is one cheap aggregate away.

Nesting note: ``get_json_object`` handles dotted paths into nested
objects; deeply nested @graph arrays need an explode pass per level —
out of scope here, documented.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LDJSON_PATTERN = r'<script type="application/ld\+json">([^<]*)</script>'


def jsonld_blocks(pages: DataFrame, html_col: str = "html",
                  id_col: str = "url") -> DataFrame:
    """(id, block_idx, block) — every JSON-LD script body per page, in
    document order (0-based)."""
    return (pages
            .select(F.col(id_col),
                    F.posexplode(
                        F.regexp_extract_all(
                            F.col(html_col).cast("string"),
                            F.lit(LDJSON_PATTERN), F.lit(1)))
                    .alias("block_idx", "block")))


def jsonld_facts(pages: DataFrame, fields: tuple[str, ...],
                 html_col: str = "html", id_col: str = "url") -> DataFrame:
    """(id, block_idx, field, value) for every requested top-level field
    present in a block — the melt/EAV shape downstream triple builders
    consume as (subj=id#block, pred=field, obj=value).  Missing fields
    and unparseable blocks simply produce no row."""
    if not fields:
        raise ValueError("fields must be non-empty")
    if len(set(fields)) != len(fields):
        raise ValueError("duplicate field names (map keys would collide)")
    b = jsonld_blocks(pages, html_col, id_col)
    pairs = [x for f in fields
             for x in (F.lit(f), F.get_json_object("block", f"$.{f}"))]
    return (b.select(id_col, "block_idx",
                     F.explode(F.create_map(*pairs)).alias("field", "value"))
            .filter(F.col("value").isNotNull()))
