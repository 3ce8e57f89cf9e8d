"""Streaming incremental KG construction (streaming/kg.py).

Pins the module's headline guarantee: after any number of micro-batches the
read-side snapshot equals the ONE-SHOT batch build over the union of all
pages (extraction + global dedup + connected-component canonicalization),
and a full replay (fresh checkpoint, same source, same output tables) is
byte-idempotent — the `_batch`-partition dynamic-overwrite pattern, not
blind appends.
"""
from __future__ import annotations

import pyspark.sql.functions as F

from climatemind_ontology_processing_spark.sources.pages import (
    PAGES_SCHEMA, pages_df)
from climatemind_ontology_processing_spark.streaming.kg import (
    kg_build_stream, kg_snapshot, surface_alias_edges)

# provenance-bearing triple key (score excluded: identical (ts, url) order
# keys tie-break arbitrarily in min_by, on BOTH sides of the comparison)
_KEY = ("subj", "pred", "obj", "url", "warc_ts")


def _bucket_alias_edges(triples):
    """Test-only aggressive alias rule: every label links to a 16-way md5
    hub node — forces heavy CROSS-BATCH component merging, so the stream's
    retroactive relabeling (batch k's merge rewriting batch j<k's canonical
    view) is actually exercised rather than vacuously equal."""
    labs = (triples.select(F.col("subj").alias("s"))
            .unionByName(triples.select(F.col("obj").alias("s")))
            .filter(F.col("s").isNotNull()).distinct())
    return labs.select(
        F.col("s").alias("src"),
        F.concat(F.lit("hub:"), F.substring(F.md5("s"), 1, 1)).alias("dst"))


def _batch_reference(pages, alias_edges_fn):
    """The one-shot batch build the stream must converge to."""
    from climatemind_ontology_processing_spark.operators.canonicalize import (
        canonicalize_triples, connected_components)
    from climatemind_ontology_processing_spark.operators.dedup import (
        dedup_triples)
    from climatemind_ontology_processing_spark.plans.pipeline import (
        triples_from_pages)
    ded = dedup_triples(triples_from_pages(pages, reextract=True))
    edges = alias_edges_fn(ded)
    canonical = dedup_triples(canonicalize_triples(ded, edges))
    labels = connected_components(edges)
    return canonical, labels


def test_surface_alias_edges_normalization(spark):
    t = spark.createDataFrame(
        [("Climate  Change", "causes", "flooding"),
         ("climate change", "causes", "Drought")],
        "subj string, pred string, obj string")
    got = {(r.src, r.dst) for r in surface_alias_edges(t).collect()}
    # variant surfaces link to the normalized form (which may itself be a
    # live surface — then they share a node and merge with no hub)
    assert ("Climate  Change", "climate change") in got
    assert ("Drought", "drought") in got
    # already-normalized surfaces emit nothing (identity is implicit)
    assert not any(s in ("climate change", "flooding") for s, _ in got)


def test_kg_stream_equals_batch_and_replay_idempotent(spark, tmp_path):
    n = 60
    pages = pages_df(spark, n).localCheckpoint(eager=True)

    # three disjoint files + maxFilesPerTrigger=1 -> three micro-batches
    src = str(tmp_path / "kg_pages_src")
    for k in range(3):
        (pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == k)
         .coalesce(1).write.mode("append").parquet(src))

    out = str(tmp_path / "kg_out")
    ckpt = str(tmp_path / "kg_ckpt")
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = kg_build_stream(stream, out, ckpt,
                        alias_edges_fn=_bucket_alias_edges)
    q.awaitTermination(300)

    snap = kg_snapshot(spark, out)
    want_triples, want_labels = _batch_reference(pages, _bucket_alias_edges)
    want_t = {tuple(r) for r in want_triples.select(*_KEY).collect()}
    got_t = {tuple(r) for r in snap["triples"].select(*_KEY).collect()}
    assert got_t == want_t, (
        f"missing={list(want_t - got_t)[:3]} extra={list(got_t - want_t)[:3]}")

    want_l = {(r.id, r.component) for r in want_labels.collect()}
    got_l = {(r.id, r.component) for r in snap["labels"].collect()}
    assert got_l == want_l

    # the relabeling was non-trivial: canonicalization actually rewrote
    # surfaces (hub rule collapses the label universe into <=16 components)
    raw_subjects = {r.subj for r in
                    spark.read.parquet(f"{out}/triples").select("subj")
                    .distinct().collect()}
    canon_subjects = {r.subj for r in
                      snap["triples"].select("subj").distinct().collect()}
    assert canon_subjects != raw_subjects
    assert len(want_l) > 0

    # REPLAY: fresh checkpoint, same source, same output tables — batch ids
    # restart at 0 and every partition is overwritten in place; the
    # snapshot must come out identical (no duplicated triples, no forked
    # label universe)
    raw_rows = spark.read.parquet(f"{out}/triples").count()
    label_rows = spark.read.parquet(f"{out}/labels").count()
    q2 = kg_build_stream(stream, out, str(tmp_path / "kg_ckpt2"),
                         alias_edges_fn=_bucket_alias_edges)
    q2.awaitTermination(300)
    snap2 = kg_snapshot(spark, out)
    got_t2 = {tuple(r) for r in snap2["triples"].select(*_KEY).collect()}
    got_l2 = {(r.id, r.component) for r in snap2["labels"].collect()}
    assert got_t2 == got_t and got_l2 == got_l
    # raw partition ROW COUNTS did not grow either (dynamic overwrite, not
    # append — a blind-append bug doubles these while leaving the sets equal)
    assert spark.read.parquet(f"{out}/triples").count() == raw_rows
    assert spark.read.parquet(f"{out}/labels").count() == label_rows


def test_kg_snapshot_missing_table_is_loud(spark, tmp_path):
    import pytest
    with pytest.raises(FileNotFoundError, match="no stream batch"):
        kg_snapshot(spark, str(tmp_path / "never_written"))
