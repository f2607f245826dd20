"""Stateful-streaming URL-seen filter (SURVEY §2.J; Spark-first extra).

A Structured-Streaming rendering of the DigestIndex first-occurrence-wins
semantics (/root/reference/internal/index/digestindex.go:45-68) via
``applyInPandasWithState``: URLs stream in, state per hash-shard group is
the set of seen url_hashes, only first occurrences are emitted.

Scope note (docs/SCALE.md): the production frontier deliberately uses
iterative batch rounds — a 10^10-key seen set does not belong in a
streaming state store. This operator is the right shape for *moderate*
streams (ingest-side dedup of a few 10^8 keys across shards) and
demonstrates the custom-stateful-operator surface.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "pid int, url_hash long, surt string, url_canon string"
STATE_SCHEMA = "hashes array<long>"


def _dedup_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        # first occurrence within the batch AND against carried state
        pdf = pdf.drop_duplicates(subset=["url_hash"], keep="first")
        fresh = pdf[~pdf["url_hash"].isin(seen)]
        seen.update(fresh["url_hash"].tolist())
        if len(fresh):
            yield fresh[["pid", "url_hash", "surt", "url_canon"]]
    state.update((list(seen),))


def streaming_seen_filter(url_stream, num_shards: int = 8):
    """url_stream: streaming DataFrame with (url_hash, surt, url_canon).
    Returns the stream of first occurrences, sharded by pmod(hash)."""
    from pyspark.sql import functions as F

    sharded = url_stream.withColumn(
        "pid", F.pmod(F.col("url_hash"), F.lit(num_shards)).cast("int")
    )
    return sharded.groupBy("pid").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
