"""Structured Streaming wrapper smoke test + is_a class-edge emission +
entity-link scoring."""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from climatemind_ontology_processing_spark.functions.triples import (
    extract_from_text)
from climatemind_ontology_processing_spark.sources.dictionary import (
    alias_map, class_edges, concepts_df)
from climatemind_ontology_processing_spark.sources.pages import pages_df
from climatemind_ontology_processing_spark.streaming.incremental import (
    streaming_triples)


def test_class_edges(spark):
    concepts = concepts_df(spark)
    ce = class_edges(concepts)
    rows = {(r.subj, r.pred, r.obj) for r in ce.collect()}
    assert all(p == "is_a" for _, p, _ in rows)
    # every concept with classes contributes; "risk" is a known class label
    assert any(s == "risk" for s, _, _ in rows)
    n_concepts = concepts.filter(F.size("all_classes") > 0).count()
    assert len({o for _, _, o in rows}) == n_concepts


def test_link_scoring():
    aliases = alias_map()
    # exact canonical labels -> score 1.0
    t = extract_from_text("increase in greenhouse effect causes decrease in GDP.",
                          aliases)
    assert t and t[0][3] == 1.0
    # alias variant ("rising ...") -> discounted
    t2 = extract_from_text("rising greenhouse effect causes decrease in GDP.",
                           aliases)
    assert t2 and t2[0][0] == "increase in greenhouse effect" and t2[0][3] == 0.9


def test_streaming_triples(spark, tmp_path):
    src = str(tmp_path / "stream_in")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    pages_df(spark, 200, seed=42).write.mode("overwrite").parquet(src)
    q = streaming_triples(spark, src, alias_map(), ckpt, out)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert set(got.columns) == {"subj", "pred", "obj", "url", "warc_ts", "score"}
    # exactly-once: restarting over the same source adds nothing
    q2 = streaming_triples(spark, src, alias_map(), ckpt, out)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == got.count()
