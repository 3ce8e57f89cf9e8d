"""Text-analysis operators for the training-data pipeline (task brief):
language ID, quality scoring, token counting, document fingerprinting.

All hot-path logic is JVM-side column expressions (split/regexp/aggregate);
nothing is per-row Python.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for an n-gram-free heuristic langid;
# deterministic and dependency-free (public common stopwords)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "une", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "por", "una", "con", "para"],
}


def _tokens(text_col: Column) -> Column:
    return F.split(F.lower(text_col), r"[^\p{L}\p{N}]+")


def language_id(text_col: Column) -> Column:
    """Heuristic language id: the language whose marker-word hit count is
    highest ('und' when all zero).  Pure array expressions — one pass."""
    toks = _tokens(text_col)

    def hit(words):
        # closure factory (PySpark lambda-arity introspection; see dedup.py)
        return lambda t: t.isin(*words)

    scores = [
        F.struct(
            F.size(F.filter(toks, hit(tuple(words)))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(_LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))


def token_count(text_col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(text_col, r"\s+"), lambda t: t != ""))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-approximating count: word-piece regex (letters runs, digit runs,
    single punctuation) — a deterministic proxy for tokenizer budgeting."""
    return F.size(F.regexp_extract_all(
        text_col, F.lit(r"[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]"), F.lit(0)))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score in [0, 1] (heuristics in the C4/Gopher tradition, simplified)."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(F.filter(toks, lambda x: x != ""))
    en = _LANG_MARKERS["en"]
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*en)))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), F.lit(0)))
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        F.round(mean_word_len, 6).alias("q_mean_word_len"),
        F.round(stop_ratio, 6).alias("q_stopword_ratio"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(score, 6).alias("q_score"),
    )


def fingerprint(text_col: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of whitespace-normalized,
    lowercased text — the exact-dedup key (content-stable: normalization makes
    it robust to whitespace-only edits)."""
    normalized = F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " ")
    return F.xxhash64(normalized)


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 quality rules,
    simplified): duplicate-token ratio and the share of the most frequent
    bigram — high values flag boilerplate/spam for corpus filtering.

    Shape: bigrams explode -> (doc, bigram) count -> per-doc max/sum — the
    shuffles carry only (id, hash, count) keys, never text bodies.
    Returns (id, n_tokens, dup_token_ratio, top_bigram_share), ratios
    rounded to 6 (docs with <2 tokens score 0.0).
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        toks.alias("_t"))
    bigrams = base.select(
        id_col, "n_tokens", "n_distinct",
        F.explode(F.when(
            F.size("_t") >= 2,
            F.transform(F.sequence(F.lit(0), F.size("_t") - 2),
                        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("_t"), i + 1, 2)))))
            .otherwise(F.array().cast("array<long>"))).alias("bg"))
    counts = (bigrams.groupBy(id_col, "n_tokens", "n_distinct", "bg")
              .agg(F.count("*").alias("c")))
    per_doc = (counts.groupBy(id_col, "n_tokens", "n_distinct")
               .agg(F.max("c").alias("max_c"), F.sum("c").alias("total_c")))
    # docs with <2 tokens produce no bigrams; restore them with zero shares
    all_docs = base.select(id_col, "n_tokens", "n_distinct")
    out = all_docs.join(per_doc, [id_col, "n_tokens", "n_distinct"], "left")
    return out.select(
        id_col, "n_tokens",
        F.round(F.when(F.col("n_tokens") > 0,
                       1.0 - F.col("n_distinct") / F.col("n_tokens"))
                .otherwise(F.lit(0.0)), 6).alias("dup_token_ratio"),
        F.round(F.coalesce(F.col("max_c") / F.col("total_c"), F.lit(0.0)), 6)
         .alias("top_bigram_share"))


def winnowing_fingerprints(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 5,
                           window: int = 4) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer et al., "Winnowing:
    Local Algorithms for Document Fingerprinting", SIGMOD'03 — public
    algorithm): positional k-gram hashes, then the minimum of every
    ``window`` consecutive hashes, deduped per document.

    Guarantee: any shared token run of length >= k + window - 1 between two
    documents shares at least one selected fingerprint — the basis for
    partial-overlap/plagiarism-style candidate detection (exact dedup
    catches only whole-document copies; MinHash needs global similarity).

    All JVM-side array expressions, one narrow pass + explode — no shuffle.
    The hash is the md5-hex-prefix long (60 bits) so a SQL oracle can
    recompute it exactly (xxhash64 is Spark-private).

    Returns DataFrame[id_col, fingerprint long].
    """
    from .dedup import let_bound

    tokens = F.split(F.lower(F.col(text_col)), r"\s+")

    def gram_hashes(t):
        return F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(t) - k, F.lit(0))),
            lambda i: F.conv(F.substring(
                F.md5(F.concat_ws(" ", F.slice(t, i + 1, k))), 1, 15),
                16, 10).cast("long"))

    def select_mins(h):
        return F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(h) - window, F.lit(0))),
            lambda j: F.array_min(F.slice(h, j + 1, window))))

    fps = let_bound(let_bound(tokens, gram_hashes), select_mins)
    return docs.select(F.col(id_col), F.explode(fps).alias("fingerprint"))


def winnowing_candidates(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 5,
                         window: int = 4, min_shared: int = 2) -> DataFrame:
    """Partial-overlap candidate pairs: documents sharing >= ``min_shared``
    winnowing fingerprints.  The only shuffle is the fingerprint-key
    self-join (bucketed by construction, like the MinHash band join).
    Returns (a, b, n_shared) with a < b."""
    fp = winnowing_fingerprints(docs, text_col, id_col, k, window) \
        .select(F.col(id_col).alias("doc"), "fingerprint")
    return (fp.alias("l").join(
                fp.alias("r"),
                (F.col("l.fingerprint") == F.col("r.fingerprint")) &
                (F.col("l.doc") < F.col("r.doc")))
            .groupBy(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def char_entropy(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Shannon entropy (bits/char) of each document's character
    distribution — the cheap compressibility proxy quality filters use
    (boilerplate / generated spam skews low, encrypted/binary junk skews
    high; cf. the public Gopher/C4 rule families).

    Computed as log2(N) - (sum n_i*log2(n_i))/N over per-char counts —
    algebraically H = -sum p*log2(p) without materializing ratios.  Two
    keys-only shuffles ((doc, char) then doc); empty documents produce no
    row.  Returns (id_col, char_entropy double rounded to 6dp).
    """
    ch = (docs.select(F.col(id_col),
                      F.explode(F.split(F.col(text_col), "")).alias("c"))
          .filter(F.col("c") != ""))
    counts = ch.groupBy(id_col, "c").agg(F.count("*").alias("n"))
    return (counts.groupBy(id_col)
            .agg(F.round(
                F.log2(F.sum("n"))
                - F.sum(F.col("n") * F.log2("n")) / F.sum("n"),
                6).alias("char_entropy")))


def with_textstats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return (quality_features(docs, text_col)
            .withColumn("lang_detected", language_id(F.col(text_col)))
            .withColumn("n_tokens_ws", token_count(F.col(text_col)))
            .withColumn("n_tokens_bpe", bpe_ish_token_count(F.col(text_col)))
            .withColumn("fingerprint", fingerprint(F.col(text_col))))


def gopher_rules(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", min_words: int = 50,
                 max_words: int = 100_000) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, Table A1) as
    NAMED per-document flags — the standard web-corpus document filter,
    complementing the scalar ``quality_features`` score with auditable
    per-rule outcomes:

    1. word count in [min_words, max_words]
    2. mean word length in [3, 10] characters
    3. symbol-to-word ratio ('#' or '...') <= 0.1
    4. <= 10% of lines start with a bullet ('•' / '-')
    5. <= 30% of lines end with an ellipsis
    6. >= 80% of words contain at least one alphabetic character
    7. at least 2 DISTINCT of the 8 English stop words present

    Every ratio threshold is evaluated as an INTEGER cross-multiplication
    (e.g. ``10 * n_sym <= n_words``), so the flags are engine-exact with
    no float rounding anywhere (micro-BIGINT philosophy, CLAUDE.md).
    Pure JVM array expressions — one narrow pass, no shuffle, no UDF.
    Returns (id_col, the 7 ``flag_*`` ints, ``passes`` int = AND of all).
    """
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    total_chars = F.coalesce(
        F.aggregate(F.transform(words, lambda w: F.length(w)),
                    F.lit(0), lambda a, x: a + x), F.lit(0))
    lines = F.transform(F.split(t, r"\n"), lambda l: F.trim(l))
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(
        lines, lambda l: l.startswith("•") | l.startswith("-")))
    n_ellipsis = F.size(F.filter(
        lines, lambda l: l.endswith("...") | l.endswith("…")))
    n_sym = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\."), F.lit(0)))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    n_stop = F.size(F.array_intersect(
        F.transform(words, lambda w: F.lower(w)),
        F.array(*[F.lit(s) for s in stops])))

    def b(c):
        return c.cast("int")

    f1 = b((n_words >= min_words) & (n_words <= max_words))
    f2 = b((n_words > 0) & (3 * n_words <= total_chars)
           & (total_chars <= 10 * n_words))
    f3 = b(10 * n_sym <= n_words)
    f4 = b(10 * n_bullet <= n_lines)
    f5 = b(10 * n_ellipsis <= 3 * n_lines)
    f6 = b(5 * n_alpha >= 4 * n_words)
    f7 = b(n_stop >= 2)
    return docs.select(
        F.col(id_col),
        f1.alias("flag_word_count"), f2.alias("flag_mean_word_len"),
        f3.alias("flag_symbol_ratio"), f4.alias("flag_bullets"),
        f5.alias("flag_ellipsis"), f6.alias("flag_alpha_words"),
        f7.alias("flag_stop_words"),
        (f1 * f2 * f3 * f4 * f5 * f6 * f7).alias("passes"))


def readability(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease in INTEGER micro arithmetic: per document,

        fre_micro = 206835000 - (1015000 * words)     DIV sentences
                              - (84600000 * syllables) DIV words

    with the standard heuristics — sentences = runs of [.!?] (min 1),
    syllables per word = vowel-group count (min 1) — so the score is a
    BIGINT, engine-exact, and monotone in the two ratios exactly like
    the float formula.  Documents with zero words report NULL (no
    denominators to divide by).  One projection over array algebra; no
    UDF, no shuffle."""
    txt = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    words = F.filter(F.split(txt, r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    n_sent = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(txt, F.lit(r"[.!?]+"), F.lit(0))))
    syl = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(w, F.lit(r"[aeiouy]+"),
                                        F.lit(0)))).cast("long"))
    fre = (F.lit(206_835_000)
           - F.expr(f"(1015000 * cast(_nw as bigint)) div _ns")
           - F.expr(f"(84600000 * _syl) div cast(_nw as bigint)"))
    return (docs.select(F.col(id_col),
                        n_words.alias("_nw"), n_sent.alias("_ns"),
                        syl.alias("_syl"))
            .select(id_col,
                    F.col("_nw").cast("long").alias("n_words"),
                    F.col("_ns").cast("long").alias("n_sentences"),
                    F.col("_syl").alias("n_syllables"),
                    F.when(F.col("_nw") > 0, fre).alias("fre_micro")))
