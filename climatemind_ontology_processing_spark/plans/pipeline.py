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
    """Triples sink (reference: CSV at make_network.py:45).

    Format dispatch (SURVEY §1.3 divergence note): ``parquet`` (default —
    the environment-available subset of the Iceberg design; dynamic
    partition overwrite + explicit bucket dirs preserve the resume
    semantics), ``csv`` (parity-fixture escape hatch), ``iceberg`` (the
    SURVEY's design target — requires the iceberg-spark-runtime jar on the
    session classpath; raises a clear error when absent so a cluster with
    Iceberg configured uses it with no code changes)."""
    writer = triples.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "iceberg":
        try:
            writer.format("iceberg").save(path)
        except Exception as exc:                     # pragma: no cover - env
            # only translate the missing-jar failure; an ordinary write
            # error on a cluster that HAS Iceberg must propagate as-is
            msg = str(exc)
            if ("Failed to find data source" in msg
                    or "ClassNotFoundException" in msg
                    or "DATA_SOURCE_NOT_FOUND" in msg):
                raise RuntimeError(
                    "fmt='iceberg' needs the iceberg-spark-runtime jar on "
                    "the session classpath (absent in this environment); "
                    "the parquet default preserves the partitioning/"
                    "overwrite/resume semantics — see SURVEY §1.3") from exc
            raise
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unknown fmt {fmt!r} "
                         "(expected 'parquet' | 'csv' | 'iceberg')")
