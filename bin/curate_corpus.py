#!/usr/bin/env python3
"""Corpus-curation entry point — the LLM-training-data ``spark-submit`` job.

The sibling of ``bin/run_pipeline.py`` (KG construction): reads a documents
table (doc_id, text[, ...]), runs the standard cleaning recipe — paragraph
boilerplate removal, PII scrubbing, exact + near dedup, language/quality
gating, sequence packing — and persists every stage under ``--out`` with a
lineage row, so a crashed run resumes AFTER its last completed stage
(``plans/curate.py`` for the stage list and resume semantics).

Cluster usage:

    spark-submit --py-files /tmp/cmkg.zip \
        --conf spark.sql.adaptive.enabled=true \
        bin/curate_corpus.py --docs /warehouse/raw_docs \
        --out /warehouse/curated --run-id crawl-2026-08 --langs en,de

Local smoke:

    python bin/curate_corpus.py --docs /root/testdata/sf0.001/documents.parquet \
        --out /tmp/curated --run-id t1
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output warehouse dir")
    ap.add_argument("--run-id", required=True, help="resume id")
    ap.add_argument("--increment", action="store_true",
                    help="treat --docs as an INCREMENT against the frozen "
                    "base at --out (run-id becomes the increment id; "
                    "requires doc ids above every historical id); rolls "
                    "state so later increments dedup against this one")
    ap.add_argument("--langs", default="en", help="comma-separated keep set")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--max-para-df", type=int, default=100)
    ap.add_argument("--near-threshold", type=float, default=0.8)
    ap.add_argument("--cpus", type=int, default=0,
                    help="local[N] cores (0 = existing/spark-submit session)")
    args = ap.parse_args()

    from climatemind_ontology_processing_spark.plans.curate import (
        curate_increment, run_curation)
    from climatemind_ontology_processing_spark.session import get_spark

    master = f"local[{args.cpus}]" if args.cpus else None
    spark = get_spark(app_name="cmkg-curate", master=master)
    docs = spark.read.parquet(args.docs)
    kw = dict(min_quality=args.min_quality,
              langs=tuple(args.langs.split(",")),
              seq_len=args.seq_len, max_para_df=args.max_para_df,
              near_threshold=args.near_threshold)
    if args.increment:
        report = curate_increment(spark, docs, args.out, args.run_id,
                                  roll_state=True, **kw)
    else:
        report = run_curation(spark, docs, args.out, args.run_id, **kw)
    print({"ran": report.ran, "skipped": report.skipped,
           "counts": report.counts})
    spark.stop()


if __name__ == "__main__":
    main()
