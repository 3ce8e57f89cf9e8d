"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the semantics of
ClimateMind/climatemind-ontology-processing (reference at /root/reference, v1.0.8)
as an idiomatic Spark DataFrame pipeline over web-page tables:

    pages(url, warc_ts, html, text, lang)
      -> html->text extraction (Arrow-vectorized, byte-identical per url)
      -> mention detection against a broadcast concept dictionary
      -> (subj, pred, obj) triple extraction
      -> canonicalization (connected-components alias resolution)
      -> graph materialization as nodes/edges tables
      -> annotation passes (edge properties, acyclic cut, mitigations,
         adaptations, myths, causal sources, visualization subgraphs)

Every stage cites the reference file:line whose semantics it reproduces; no
reference code is reused (the reference is single-threaded NetworkX/owlready2,
this engine is distributed DataFrame ops).
"""

__version__ = "0.1.0"
