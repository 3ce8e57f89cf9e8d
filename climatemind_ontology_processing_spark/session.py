"""SparkSession factory with the engine's standard configuration.

Arrow execution on (all Python UDF surfaces are pandas/Arrow batched — the
``input_hint`` forbids per-row Python), AQE on (runtime skew-join splitting +
coalescing belt-and-braces on top of our explicit salting).
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT_SHUFFLE_PARTITIONS


def get_spark(
    app_name: str = "climatemind-kg",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[N]`` with N from ``$SPARK_GRAFT_CPUS`` (or
    all cores); on a real cluster pass nothing and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE: coalescePartitions.parallelismFirst stays at its default
        # (true).  Size-targeted coalescing (advisory 64m, guide §2.2) was
        # A/B-measured WORSE here: several operators reduce ~20 MB that is
        # CPU-heavy (string-key hash aggregation), and byte-based
        # coalescing collapses them to one single-threaded partition.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let the planner pick shuffled-hash join when its size conditions
        # hold (guide §3.1/§9): skips the per-partition sorts of
        # sort-merge; A/B-measured -10..-30% on the join-heavy operators
        # (rule mining 4.9->3.5s min).  Sort-merge remains the fallback
        # for sides too big to hash locally.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Spark 4.1: localCheckpoint of a projected join fails with
        # "NoSuchElementException: key not found: <attr>" when propagated
        # constraints reference dropped join keys; the iterative traversal
        # loops (operators/traversal.py) checkpoint such plans every
        # iteration.  Our plans carry explicit filters, so losing inferred
        # constraints costs little.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # deterministic timestamps regardless of host TZ
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # long sessions running many short queries accumulate dead
        # localCheckpoint blocks until the ContextCleaner's periodic GC
        # (default 30 MINUTES) finally releases them — by then the heap
        # churn slows every job.  A 1-minute cadence keeps the block
        # manager drained at negligible GC cost (measured: removes a
        # ~0.5-0.8 s/query late-session penalty in 36-query runs).
        .config("spark.cleaner.periodicGC.interval",
                os.environ.get("SPARK_GRAFT_PERIODIC_GC", "1min"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
