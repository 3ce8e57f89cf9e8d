"""Deterministic synthetic ``pages`` table generator.

Authoritative input shape (BASELINE.json ``input_hint``):
    pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Properties (FIXTURES.md §1):
* every column is a pure function of (seed, row_id) — generation is distributed
  via ``spark.range(n).mapInPandas`` and independent of partitioning;
* domains are Zipf-skewed (head domain ~20% of rows) to exercise salting;
* ``warc_ts`` advances +37s per row from 2024-01-01;
* ~10% of pages declare ISO-8859-1 and are latin-1 encoded (decode-chain test);
* ``html`` embeds 0-4 sentences built from cue templates over the concept
  dictionary, so the expected (subj, pred, obj) triple set is known by
  construction (``expected_triples``); distractor sentences apply precision
  pressure, alias surface forms apply recall pressure;
* ``text`` is the expected byte-exact extraction output (the engine must
  reproduce it from ``html`` alone — BASELINE.md invariant).

Cue templates -> predicates (mirroring the reference's edge vocabulary,
``network_class.py:57`` / SURVEY §2 FIXTURES §1):
    "{A} causes {B}."  "{A} leads to {B}."        -> causes_or_promotes
    "{A} is inhibited by {B}."  "{B} prevents {A}." -> is_inhibited_or_...
    "{M} is a myth about {B}."                     -> is_a_myth_about
"""
from __future__ import annotations

import datetime as dt
import html as html_mod
import random
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..config import CAUSES, EXPOSURE, INHIBITS, MYTH_ABOUT, POPULATION
from .dictionary import default_aliases, load_concept_rows

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
])

EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)

# Zipf-ish domain weights: head domain ~20% of traffic
_DOMAINS = [("news.example.com", 20)] + [
    (f"site{i:02d}.example.org", w)
    for i, w in enumerate([12, 9, 7, 6, 5, 5, 4, 4, 3, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 1])
]
_DOMAIN_CUM: list[tuple[int, str]] = []
_acc = 0
for _d, _w in _DOMAINS:
    _acc += _w
    _DOMAIN_CUM.append((_acc, _d))
_DOMAIN_TOTAL = _acc

_DISTRACTOR_ENTITIES = [
    "the stock market", "a famous actor", "the local café", "quantum computing",
    "the world cup", "a new smartphone", "ancient history", "modern art",
]
_DISTRACTOR_VERBS = ["influences", "is unrelated to", "resembles", "discusses"]

_FILLER = [
    "The weather report follows.",
    "Subscribe to our newsletter for more.",
    "This article was updated recently.",
    "Experts continue to study the topic.",
]


def _concept_labels() -> list[str]:
    return sorted(c["label"] for c in load_concept_rows())


_LABELS_CACHE: list[str] | None = None


def _labels() -> list[str]:
    global _LABELS_CACHE
    if _LABELS_CACHE is None:
        _LABELS_CACHE = _concept_labels()
    return _LABELS_CACHE


def _pick_domain(rng: random.Random) -> str:
    r = rng.randrange(_DOMAIN_TOTAL)
    for cum, d in _DOMAIN_CUM:
        if r < cum:
            return d
    return _DOMAIN_CUM[-1][1]


_ALIAS_CACHE: dict[str, list[str]] = {}


def _surface(rng: random.Random, label: str) -> str:
    """Sometimes use an alias surface form (recall/canonicalization pressure).
    ``default_aliases`` is a pure function of the label — memoized (it was
    ~14% of gen_row in profiling; identical output by construction)."""
    variants = _ALIAS_CACHE.get(label)
    if variants is None:
        variants = _ALIAS_CACHE[label] = default_aliases(label)
    if len(variants) > 1 and rng.random() < 0.3:
        return rng.choice(variants[1:])
    return label


def gen_row(seed: int, i: int) -> tuple[str, dt.datetime, bytes, str, str, list[tuple[str, str, str]]]:
    """Generate page ``i`` plus its expected triple list (subj, pred, obj)."""
    rng = random.Random((seed << 40) ^ (i * 1_000_003))
    labels = _labels()

    domain = _pick_domain(rng)
    url = f"https://{domain}/article/{i}"
    ts = EPOCH + dt.timedelta(seconds=37 * i)

    lang = "en"
    r = rng.random()
    if r > 0.95:
        lang = "de" if r > 0.975 else "fr"

    n_sent = rng.randint(0, 4)
    sentences: list[str] = []
    expected: list[tuple[str, str, str]] = []

    for _ in range(n_sent):
        kind = rng.random()
        if lang != "en":
            # non-English pages carry no extractable cues (filtered per config)
            sentences.append(rng.choice(_FILLER))
            continue
        if kind < 0.40:
            a, b = rng.sample(labels, 2)
            tmpl = rng.choice(["{A} causes {B}.", "{A} leads to {B}."])
            sentences.append(tmpl.format(A=_surface(rng, a), B=_surface(rng, b)))
            expected.append((a, CAUSES, b))
        elif kind < 0.55:
            a, b = rng.sample(labels, 2)
            sentences.append(f"{_surface(rng, a)} is inhibited by {_surface(rng, b)}.")
            expected.append((a, INHIBITS, b))
        elif kind < 0.65:
            a, b = rng.sample(labels, 2)
            sentences.append(f"{_surface(rng, b)} prevents {_surface(rng, a)}.")
            expected.append((a, INHIBITS, b))
        elif kind < 0.75:
            m, b = rng.sample(labels, 2)
            sentences.append(f"{_surface(rng, m)} is a myth about {_surface(rng, b)}.")
            expected.append((m, MYTH_ABOUT, b))
        elif kind < 0.78:
            a, b = rng.sample(labels, 2)
            sentences.append(
                f"{_surface(rng, a)} has exposure dependency of {_surface(rng, b)}.")
            expected.append((a, EXPOSURE, b))
        elif kind < 0.81:
            a, b = rng.sample(labels, 2)
            sentences.append(
                f"{_surface(rng, a)} affects the population of {_surface(rng, b)}.")
            expected.append((a, POPULATION, b))
        elif kind < 0.90:
            # distractor with cue verb but non-dictionary entities (precision)
            e1, e2 = rng.sample(_DISTRACTOR_ENTITIES, 2)
            v = rng.choice(["causes", "prevents"] + _DISTRACTOR_VERBS)
            sentences.append(f"{e1} {v} {e2}.")
        else:
            sentences.append(rng.choice(_FILLER))

    title = f"Page {i}"
    text = "\n".join([title] + sentences)

    latin1 = rng.random() < 0.10
    charset = "iso-8859-1" if latin1 else "utf-8"
    body = "".join(
        f"<p>{html_mod.escape(s)}</p>" for s in sentences
    )
    # a script tag + entity so extraction is non-trivially exercised
    doc = (
        f'<html><head><meta charset="{charset}"><title>{html_mod.escape(title)}</title>'
        f"<script>var x = 1 &amp;&amp; 2;</script>"
        f'<style>p {{ margin: 0 }}</style></head>'
        f"<body><h1>{html_mod.escape(title)}</h1>{body}</body></html>"
    )
    enc = "latin-1" if latin1 else "utf-8"
    html_bytes = doc.encode(enc, errors="replace")
    return url, ts, html_bytes, text, lang, expected


def expected_triples(seed: int, n: int) -> set[tuple[str, str, str]]:
    """Driver-side oracle: the full expected deduped triple set for pages [0, n)."""
    out: set[tuple[str, str, str]] = set()
    for i in range(n):
        out.update(gen_row(seed, i)[5])
    return out


def pages_df(spark: SparkSession, n: int, seed: int = 42,
             partitions: int | None = None) -> DataFrame:
    """Distributed generation: ``spark.range`` -> ``mapInPandas`` (Arrow batches).

    Each task generates only its own id range — no driver materialization, so
    this scales to arbitrarily large synthetic page counts.
    """
    base = spark.range(0, n, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_row(seed, int(i))[:5] for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return base.mapInPandas(gen, PAGES_SCHEMA)
