"""Volume certification of the 6-stage curation pipeline (round-4 verdict
item #3): generate N synthetic documents DISTRIBUTED (mapInPandas, no
driver-side text), run ``plans.curate.run_curation`` end-to-end, and print
the funnel + per-stage wall times (recovered from the lineage timestamps).

Planted phenomena, deterministic per doc_id (i % 100 selects the class), so
expected funnel drops are analytic:

- 50           : block ANCHOR (normal body; its text is the dup target)
- 3,4,5        : EXACT duplicates of the block anchor's body
- 6,7,8        : NEAR duplicates (anchor body + per-id extra token)
- 0,1          : quality junk ("short junk")
- 2            : German text (language filter)
- 9            : normal + planted PII (email/IP/phone)
- i%10 in {3,4,6}: boilerplate paragraph appended (df ~0.3*N >> cap)
- rest         : normal unique body

Usage: python tools/curation_volume_bench.py [n_docs] [out_dir]
       (defaults 1_000_000, /tmp/curation_volume)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = ("the quick brown fox jumps over the lazy dog and then the fox runs "
        "into the green forest where it finds food and the other animals "
        "watch it with great interest for a while")
BOILER = ("subscribe to our newsletter today and never miss the latest "
          "updates from this site")
GERMAN = ("der die das und ist nicht mit ein zu den " * 6).strip()


def _body(i: int) -> str:
    uniq = " ".join(f"tok{i}x{j}" for j in range(12))
    return f"{BASE} {uniq}"


def doc_text(i: int) -> str:
    """Deterministic text for doc id ``i`` — the single source of truth for
    both generation and the analytic funnel expectations."""
    c = i % 100
    anchor = (i // 100) * 100 + 50
    if c in (0, 1):
        return f"short junk {i}"
    if c == 2:
        return GERMAN
    if c in (3, 4, 5):
        text = _body(anchor)
    elif c in (6, 7, 8):
        text = f"{_body(anchor)} extra{c - 6} padding"
    elif c == 9:
        text = (f"{_body(i)} contact me at user{i}@example.com or "
                f"192.168.{i % 250}.4 phone 415-555-{i % 10000:04d}")
    else:
        text = _body(i)
    if i % 10 in (3, 4, 6):
        text = f"{text}\n{BOILER}"
    return text


def gen_docs(spark, n_docs: int, partitions: int = 64):
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame({"doc_id": ids,
                                "text": [doc_text(int(i)) for i in ids]})

    return (spark.range(0, n_docs, numPartitions=partitions)
            .mapInPandas(gen, "doc_id long, text string"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_volume"
    from pyspark.sql import functions as F

    from climatemind_ontology_processing_spark.plans.curate import (
        curation_funnel, run_curation)
    from climatemind_ontology_processing_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="cmkg-curation-volume",
                      master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(out, ignore_errors=True)
    docs_path = f"{out}/docs"
    t0 = time.time()
    gen_docs(spark, n_docs).write.mode("overwrite").parquet(docs_path)
    t_gen = time.time() - t0

    docs = spark.read.parquet(docs_path)
    t0 = time.time()
    report = run_curation(spark, docs, f"{out}/run", run_id="vol",
                          max_para_df=200, near_threshold=0.7)
    t_total = time.time() - t0

    funnel = [r.asDict() for r in
              curation_funnel(spark, f"{out}/run").collect()]
    # per-stage wall times from the lineage timestamps (stage k+1's row
    # lands right after stage k's, so diffs bound each stage's wall; the
    # first stage is measured from run start)
    from climatemind_ontology_processing_spark.plans.lineage import (
        LINEAGE_SCHEMA)
    lin = (spark.read.schema(LINEAGE_SCHEMA).json(f"{out}/run/_lineage")
           .orderBy("bucket").collect())
    stage_walls = {}
    prev = None
    for r in lin:
        ts = r.updated_ts.timestamp()
        if prev is not None:
            stage_walls[r.stage] = round(ts - prev, 1)
        prev = ts
    first = lin[0]
    stage_walls[first.stage] = round(
        first.updated_ts.timestamp() - (time.time() - t_total), 1)

    print(json.dumps({
        "n_docs": n_docs, "gen_sec": round(t_gen, 1),
        "curation_sec": round(t_total, 1),
        "docs_per_sec": round(n_docs / t_total),
        "stage_walls_sec": stage_walls,
        "funnel": [{k: v for k, v in row.items()} for row in funnel],
        "counts": report.counts,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
