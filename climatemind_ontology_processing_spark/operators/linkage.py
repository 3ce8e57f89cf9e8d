"""Blocked fuzzy matching — edit-distance entity resolution.

The north_star's entity linking matches surface forms against the concept
dictionary exactly (broadcast alias map) and resolves transitive aliases
via connected components; web text ALSO carries near-miss surfaces
(typos, plurals, hyphenation).  The classic record-linkage recipe:

  1. BLOCK: candidate pairs must share a cheap blocking key — here
     (first character, length bucket) — turning the O(N*M) cross join
     into per-block joins (an edit-distance-1 pair can differ in length
     by at most 1 and rarely in its first character; recall/cost is the
     standard blocking trade-off, stated not hidden);
  2. VERIFY: exact Levenshtein on candidates only (JVM-side
     ``F.levenshtein``, the textbook DP — DuckDB's ``levenshtein`` agrees
     integer-for-integer, so the whole operator is oracle-exact).

The dictionary side is tiny (concept vocabulary) and broadcasts; the
corpus side shuffles nothing — candidates form in a map-side broadcast
probe keyed on the block.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _block_key(c: Column, len_bucket: int) -> list[Column]:
    return [F.substring(c, 1, 1).alias("_b1"),
            F.floor(F.length(c) / len_bucket).alias("_b2")]


def fuzzy_matches(corpus: DataFrame, dictionary: DataFrame,
                  corpus_col: str = "surface", dict_col: str = "term",
                  max_dist: int = 1, len_bucket: int = 4) -> DataFrame:
    """(surface, term, dist <= max_dist) — fuzzy joins of corpus surface
    forms against a dictionary.  Each side explodes to the blocking keys
    its edit-distance-``max_dist`` neighbors can occupy (the length
    bucket and its +/-1 neighbors), the dictionary side broadcasts, and
    Levenshtein verifies candidates only.  Exact-match pairs (dist 0)
    are included; filter ``dist > 0`` for corrections-only."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    cs = corpus.select(F.col(corpus_col).alias("surface")).distinct() \
        .filter(F.col("surface").isNotNull() & (F.length("surface") > 0))
    ds = dictionary.select(F.col(dict_col).alias("term")).distinct() \
        .filter(F.col("term").isNotNull() & (F.length("term") > 0))
    # corpus side: its own block only; dictionary side: every bucket a
    # within-distance neighbor could fall into (length +/- max_dist)
    c = cs.select("surface", *_block_key(F.col("surface"), len_bucket))
    neighbor_buckets = F.array_distinct(F.array(*[
        F.floor((F.length("term") + d) / len_bucket)
        for d in range(-max_dist, max_dist + 1)]))
    d = (ds.select("term", F.substring("term", 1, 1).alias("_b1"),
                   F.explode(neighbor_buckets).alias("_b2")))
    cand = c.join(F.broadcast(d), ["_b1", "_b2"])
    return (cand.select("surface", "term",
                        F.levenshtein("surface", "term").alias("dist"))
            .filter(F.col("dist") <= max_dist)
            .distinct())
