"""Handcrafted HTML edge cases for the byte-deterministic extractor —
structures beyond what the synthetic generator emits (tables, comments,
nested blocks, entities, malformed heads, case-insensitive tags)."""
from __future__ import annotations

from climatemind_ontology_processing_spark.functions.text import (
    decode_html, html_to_text)


def test_table_rows_become_lines():
    doc = b"<html><body><table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table></body></html>"
    assert html_to_text(doc) == "a b\nc"


def test_comments_stripped():
    doc = b"<html><body><p>keep</p><!-- <p>gone</p> --><p>also</p></body></html>"
    assert html_to_text(doc) == "keep\nalso"


def test_nested_blocks_and_lists():
    doc = (b"<html><body><div>outer<ul><li>one</li><li>two</li></ul></div>"
           b"<blockquote>q</blockquote></body></html>")
    assert html_to_text(doc) == "outer\none\ntwo\nq"


def test_entities_unescaped():
    doc = b"<html><body><p>a &amp; b &lt;c&gt; &#233;</p></body></html>"
    assert html_to_text(doc) == "a & b <c> \xe9"


def test_uppercase_tags_and_attrs():
    doc = b'<HTML><BODY><P CLASS="x">Hello</P><BR><DIV>World</DIV></BODY></HTML>'
    assert html_to_text(doc) == "Hello\nWorld"


def test_script_with_lt_inside():
    doc = (b"<html><head><script>if (a < b) { x; }</script></head>"
           b"<body><p>text</p></body></html>")
    assert html_to_text(doc) == "text"


def test_no_head_no_title():
    doc = b"<p>just a paragraph</p>"
    assert html_to_text(doc) == "just a paragraph"


def test_title_without_h1_duplicate():
    doc = b"<html><head><title>T</title></head><body><p>body</p></body></html>"
    assert html_to_text(doc) == "T\nbody"


def test_h1_differs_from_title_kept():
    doc = (b"<html><head><title>T</title></head>"
           b"<body><h1>Different</h1><p>body</p></body></html>")
    assert html_to_text(doc) == "T\nDifferent\nbody"


def test_declared_charset_wins_over_utf8():
    # bytes are valid latin-1, declared as such; utf-8 would fail on 0xe9
    doc = '<html><head><meta charset="iso-8859-1"></head><body><p>café</p></body></html>'
    raw = doc.encode("latin-1")
    assert "café" in decode_html(raw)


def test_bogus_charset_falls_back():
    doc = b'<html><head><meta charset="klingon"></head><body><p>ok</p></body></html>'
    assert html_to_text(doc) == "ok"


def test_crlf_whitespace_normalized():
    doc = b"<html><body><p>a\r\n   b\tc</p></body></html>"
    assert html_to_text(doc) == "a\nb c"
