"""Custom stateful streaming operator: per-stratum EXACT-k sampling.

Batch eval-set construction uses ``sampling.stratified_take_k`` (rank by
the deterministic sample bucket, keep k).  On an unbounded stream the
same contract — "at any point, the k best-bucketed keys seen so far per
stratum" — is a bounded-state ``applyInPandasWithState`` operator: state
per stratum is AT MOST k (bucket, key) pairs, merged with each
micro-batch's candidates and re-cut to k.  Because membership is a pure
function of the (seed, key) hash, the streamed selection CONVERGES to
exactly the batch ``stratified_take_k`` over all delivered events —
pinned by the equivalence test.

Each state update that changes the selection emits the stratum's full
current top-k with a monotonically increasing ``version`` (update-mode
semantics: consumers keep each stratum's max version).  The bucket is
computed JVM-side in the stream projection (the SAME ``sample_bucket``
expression as batch), so the Python state function only merges sorted
pairs — no hashing in the per-row Python path.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sampling import sample_bucket

TAKEK_OUTPUT_SCHEMA = ("stratum string, version bigint, rank int, "
                       "key string, bucket bigint")
TAKEK_STATE_SCHEMA = ("buckets array<bigint>, keys array<string>, "
                      "version bigint")


def take_k_stream(events: DataFrame, k: int, stratum_col: str,
                  key_col: str, seed: int = 42,
                  hash_family: str = "md5_60") -> DataFrame:
    """Streaming DataFrame -> update-mode stream of (stratum, version,
    rank, key, bucket): the current k best keys per stratum, re-emitted
    (version+1) whenever a batch improves the selection.  Deterministic
    and retry-stable (bucket is a pure hash of the key; replayed batches
    merge idempotently — a key already in state cannot change the cut)."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (stratum,) = key
        cand: dict[str, int] = {}
        for pdf in pdfs:
            for kk, b in zip(pdf["_key"].tolist(), pdf["_bucket"].tolist()):
                cand[str(kk)] = int(b)
        if state.exists:
            buckets, keys, version = state.get
            old = list(zip(buckets, keys))
            for b, kk in old:
                cand.setdefault(kk, b)
        else:
            old, version = [], 0
        best = sorted(((b, kk) for kk, b in cand.items()))[:k]
        if best != sorted(old):
            version += 1
            state.update(([b for b, _ in best], [kk for _, kk in best],
                          version))
            yield pd.DataFrame({
                "stratum": [stratum] * len(best),
                "version": [version] * len(best),
                "rank": list(range(1, len(best) + 1)),
                "key": [kk for _, kk in best],
                "bucket": [b for b, _ in best]})

    src = events.select(
        F.col(stratum_col).cast("string").alias("stratum"),
        F.col(key_col).cast("string").alias("_key"),
        sample_bucket(F.col(key_col).cast("string"), seed, hash_family)
        .alias("_bucket"))
    return (src.groupBy("stratum")
            .applyInPandasWithState(fn, TAKEK_OUTPUT_SCHEMA,
                                    TAKEK_STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))
