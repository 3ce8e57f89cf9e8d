"""M2 minimum slice: pages -> text -> mentions -> triples -> dedup.

Oracle: sources/pages.py constructs pages so the expected triple set is known;
the pipeline must hit P/R >= 0.95 (BASELINE.md) — in fact exactly 1.0 on the
synthetic corpus since cues are unambiguous.
"""
import pytest

from climatemind_ontology_processing_spark.functions.text import (
    decode_html, html_to_text, extraction_parity, with_extracted_text)
from climatemind_ontology_processing_spark.functions.mentions import detect_mentions
from climatemind_ontology_processing_spark.plans.pipeline import triples_from_pages
from climatemind_ontology_processing_spark.sources.dictionary import alias_map
from climatemind_ontology_processing_spark.sources.pages import (
    expected_triples, gen_row, pages_df)

N = 300
SEED = 42


def test_gen_row_deterministic():
    a = gen_row(SEED, 7)
    b = gen_row(SEED, 7)
    assert a == b
    assert a[0].startswith("https://")


def test_html_to_text_matches_expected_locally():
    for i in range(120):
        url, ts, html, text, lang, _ = gen_row(SEED, i)
        assert html_to_text(html) == text, f"row {i} ({url})"


def test_latin1_decode_chain():
    raw = '<html><head><meta charset="iso-8859-1"></head><body><p>café</p></body></html>'.encode("latin-1")
    assert "café" in decode_html(raw)
    assert html_to_text(raw) == "café"


def test_extraction_parity_distributed(spark):
    pages = pages_df(spark, N, SEED, partitions=5)
    bad = extraction_parity(pages)
    assert bad.count() == 0


def test_extraction_partitioning_invariance(spark):
    """Byte-identical text regardless of partitioning (input_hint invariant)."""
    t1 = sorted(with_extracted_text(pages_df(spark, 50, SEED, partitions=1))
                .select("url", "text").collect())
    t8 = sorted(with_extracted_text(pages_df(spark, 50, SEED, partitions=8))
                .select("url", "text").collect())
    assert t1 == t8


def test_mentions_found(spark):
    pages = pages_df(spark, N, SEED, partitions=4)
    m = detect_mentions(pages, alias_map())
    rows = m.limit(10).collect()
    assert len(rows) > 0
    assert set(m.columns) == {"url", "warc_ts", "concept", "surface", "pos"}


def test_mention_matcher_paths_equivalent(spark):
    """The large-dictionary token scanner must reproduce the regex path
    exactly — (concept, surface, pos) triples on real extracted text."""
    from climatemind_ontology_processing_spark.functions.mentions import scan_text
    from climatemind_ontology_processing_spark.functions.text import (
        with_extracted_text)
    aliases = alias_map()
    texts = [r.text for r in
             with_extracted_text(pages_df(spark, 40, SEED)).select("text").collect()]
    # synthetic edge cases: boundaries, case, double spaces (must NOT match),
    # hyphens, overlapping candidates
    texts += [
        "Global warming causes flooding. global WARMING!",
        "warming (global warming) xglobal warming global warmingx",
        "global  warming has two spaces; global warming has one.",
        "",
        # non-ASCII: Unicode-alnum neighbours are word boundaries to the
        # regex's [A-Za-z0-9] and must be to the token path too
        "églobal warmingé global warming éé global warmingé.",
        # 'İ'.lower() is 2 chars — a whole-text lower() would misalign every
        # offset after it; matches following 'İ' runs must still line up
        "İstanbul heute: global warming beschleunigt. İİİ global warming!",
        "İ" * 50 + " global warming at a large shifted offset",
    ]
    assert any(texts), "need non-empty corpus"
    for t in texts:
        assert scan_text(t, aliases, force="regex") == \
            scan_text(t, aliases, force="tokens"), t[:80]


def test_mention_scan_large_dictionary():
    """10^5-alias dictionary: the token path must stay fast (cost independent
    of alias count) and find the planted phrases."""
    import time
    from climatemind_ontology_processing_spark.functions.mentions import scan_text
    big = {f"synthetic alias {i} phrase": f"concept_{i}" for i in range(100_000)}
    big["global warming"] = "global warming"
    text = ("filler words " * 200 + "global warming " +
            "synthetic alias 77 phrase ends here. ") * 20
    t0 = time.time()
    hits = scan_text(text, big, force="tokens")
    dt = time.time() - t0
    concepts = {h[0] for h in hits}
    assert {"global warming", "concept_77"} <= concepts
    assert len(hits) == 40
    assert dt < 2.0, f"token scan degraded: {dt:.2f}s"


def test_triples_precision_recall(spark):
    pages = pages_df(spark, N, SEED, partitions=6)
    got = {(r.subj, r.pred, r.obj)
           for r in triples_from_pages(pages).collect()}
    want = expected_triples(SEED, N)
    assert want, "oracle set should be non-empty"
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision}: extra={list(got - want)[:5]}"
    assert recall >= 0.95, f"recall {recall}: missing={list(want - got)[:5]}"


def test_triple_dedup_provenance_earliest(spark):
    """dedup_triples keeps the earliest (warc_ts, url) per key (A1)."""
    pages = pages_df(spark, N, SEED, partitions=4)
    t = triples_from_pages(pages)
    assert t.count() == t.select("subj", "pred", "obj").distinct().count()
