"""End-to-end plans — the engine's equivalents of the reference entry points.

EP2 (``make_network.outputEdges``, make_network.py:22-45): pages -> extracted
text -> cue-pattern triples -> dedup.  In the reference this is OWL-DFS ->
pandas -> CSV; here it is three narrow Arrow stages plus one key shuffle.

EP1 (``processOntology``, process_new_ontology_file.py:10-26): EP2 followed by
graph materialization + the annotation passes (operators/graph_pipeline.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.triples import extract_triples, extract_triples_from_html
from ..operators.dedup import dedup_triples
from ..sources.dictionary import alias_map


def triples_from_pages(pages: DataFrame, aliases: dict[str, str] | None = None,
                       reextract: bool = True) -> DataFrame:
    """EP2: pages(url, warc_ts, html, text, lang) -> deduped triples.

    ``reextract=True`` derives text from html in a single fused Arrow stage
    (the real path — one JVM<->Python crossing); False trusts the stored text
    column.
    """
    if aliases is None:
        aliases = alias_map()
    if reextract:
        raw = extract_triples_from_html(pages, aliases)
    else:
        raw = extract_triples(pages, aliases)
    return dedup_triples(raw)


def write_triples(triples: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Triples sink (reference: CSV at make_network.py:45; here parquet/Iceberg
    partitioned-friendly).  ``fmt='csv'`` keeps a parity-fixture escape hatch."""
    writer = triples.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
    else:
        writer.parquet(path)
