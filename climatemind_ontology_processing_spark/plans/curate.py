"""End-to-end corpus curation — the LLM-training-data production pipeline.

`bin/run_pipeline.py` is the KG-construction entry point; this is its
corpus-curation sibling, composing the oracled operators into the standard
cleaning recipe (C4 / MassiveText / CCNet lineage):

  1. ``paragraphs``  — cross-corpus boilerplate paragraph removal
                       (``dedup.paragraph_dedup``, drop mode)
  2. ``pii``         — e-mail / IPv4 / phone scrubbing (``functions.pii``)
  3. ``exact``       — exact document dedup (``dedup.dedup_exact``)
  4. ``near``        — MinHash-LSH near-dup removal: of every verified
                       near-dup pair, the LOWER doc_id survives
                       (``dedup.near_dup_pairs`` + anti-join)
  5. ``quality``     — language id + heuristic quality gate
                       (``textstats``; keeps lang in ``langs`` with
                       quality_score >= ``min_quality``)
  6. ``pack``        — token counts + training-sequence placement
                       (``packing.packed_spans``)

STAGE-LEVEL RESUME: corpus-global stages (dedup, census) cannot resume
per-bucket the way the KG extraction does (``plans/lineage.run_bucketed``)
— a near-dup pair crosses any bucketing of the corpus.  Instead every
stage persists its full output parquet under ``<out>/<stage>/`` and
appends a lineage row; a rerun with the same ``run_id`` skips stages
whose lineage row exists and whose output parquet is readable, resuming
AFTER the last completed stage.  Ordering of stages is part of the
contract (scrub before dedup would split exact-dup groups that differ
only in redacted PII — deliberately: post-scrub equality IS the right
identity for training data).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import append_lineage_rows, completed_buckets

STAGES = ("paragraphs", "pii", "exact", "near", "quality", "pack")


@dataclass
class CurationReport:
    ran: list = field(default_factory=list)
    skipped: list = field(default_factory=list)
    counts: dict = field(default_factory=dict)


def _stage_transforms(min_quality: float, langs: tuple[str, ...],
                      seq_len: int, max_para_df: int, near_threshold: float):
    from ..functions.pii import scrub_pii_docs
    from ..operators.dedup import (dedup_exact, near_dup_pairs,
                                   paragraph_dedup)
    from ..operators.packing import packed_spans
    from ..operators.textstats import (bpe_ish_token_count, language_id,
                                       quality_features)

    def s_paragraphs(docs: DataFrame) -> DataFrame:
        cleaned = paragraph_dedup(docs, max_para_df=max_para_df)
        return (docs.drop("text")
                .join(cleaned.select("doc_id", "text"), "doc_id"))

    def s_pii(docs: DataFrame) -> DataFrame:
        return scrub_pii_docs(docs).drop("n_emails", "n_ips", "n_phones")

    def s_exact(docs: DataFrame) -> DataFrame:
        return dedup_exact(docs)

    def s_near(docs: DataFrame) -> DataFrame:
        losers = (near_dup_pairs(docs, threshold=near_threshold,
                                 exact_dedup_first=False)
                  .select(F.col("b").alias("doc_id")).distinct())
        return docs.join(losers, "doc_id", "left_anti")

    def s_quality(docs: DataFrame) -> DataFrame:
        scored = quality_features(docs).select("doc_id", "q_score")
        lang = docs.withColumn("_lang", language_id(F.col("text")))
        return (lang.join(scored, "doc_id")
                .filter(F.col("_lang").isin(*langs) &
                        (F.col("q_score") >= min_quality))
                .drop("_lang", "q_score"))

    def s_pack(docs: DataFrame) -> DataFrame:
        toks = docs.select(
            "doc_id", bpe_ish_token_count(F.col("text")).alias("n_tokens"))
        return packed_spans(toks, seq_len=seq_len)

    return {"paragraphs": s_paragraphs, "pii": s_pii, "exact": s_exact,
            "near": s_near, "quality": s_quality, "pack": s_pack}


def run_curation(spark: SparkSession, docs: DataFrame, out_path: str,
                 run_id: str, lineage_path: str | None = None,
                 min_quality: float = 0.3,
                 langs: tuple[str, ...] = ("en",),
                 seq_len: int = 2048, max_para_df: int = 100,
                 near_threshold: float = 0.8) -> CurationReport:
    """Run (or resume) the curation pipeline; returns which stages ran vs
    were skipped, with per-stage output row counts.  ``docs`` needs
    (doc_id, text[, ...]); extra columns ride along untouched until the
    ``pack`` stage, whose output is the (doc_id, n_tokens, spans) table."""
    lineage_path = lineage_path or f"{out_path}/_lineage"
    transforms = _stage_transforms(min_quality, langs, seq_len,
                                   max_para_df, near_threshold)
    report = CurationReport()
    # stage index doubles as the lineage "bucket" so completed_buckets'
    # (run_id, stage, bucket) contract is reused verbatim
    cur = docs
    upstream_reran = False
    for i, stage in enumerate(STAGES):
        stage_out = f"{out_path}/{stage}"
        done = completed_buckets(spark, lineage_path, run_id, stage)
        # a stage may be skipped ONLY while every upstream stage was also
        # skipped — once anything reruns, later cached outputs are stale
        if i in done and not upstream_reran:
            try:
                cur = spark.read.parquet(stage_out)
                report.skipped.append(stage)
                continue
            except Exception:
                pass                  # lineage row without output: rerun
        upstream_reran = True
        cur = transforms[stage](cur)
        cur.write.mode("overwrite").parquet(stage_out)
        cur = spark.read.parquet(stage_out)
        n = cur.count()
        report.ran.append(stage)
        report.counts[stage] = n
        append_lineage_rows(spark, lineage_path, [
            {"run_id": run_id, "stage": stage, "bucket": i,
             "n_pages": n, "n_triples": 0}])
    return report
