"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — a 2-round crawl-frontier run (the north-rule
  pipeline: span link extraction -> SURT canonicalization -> bloom+exact
  URL-seen -> robots gating -> salted politeness top-k -> deterministic
  crawl order) over the deterministic t1 fixture corpus, returning the
  fetch log.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2 plus the training-data-pipeline operators, over the driver's
  parquet tables, with DuckDB oracles (see warchaeology_spark/queries.py
  for the alias/rounding/typing conventions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# import-safe regardless of the driver's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from warchaeology_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl 2 frontier rounds on the t1 synthetic corpus —
    THROUGH the snapshot/checkpoint protocol: round 1 commits to a store,
    then the run "dies" and a second run_crawl resumes from the committed
    snapshot for round 2 (VERDICT r3 next #7). The fetch log is
    seq-for-seq identical to a single uninterrupted 2-round crawl
    (pinned by tests/test_frontier_parity.py::test_checkpoint_resume)."""
    import tempfile

    from warchaeology_spark.fixtures.generate import (
        gen_documents_spans,
        gen_politeness,
        gen_robots,
        gen_seeds,
    )
    from warchaeology_spark.frontier.scheduler import CrawlConfig, run_crawl

    # materialize the synthetic inputs: the generators are single large
    # column expressions, and letting them inline into the crawl's
    # canonicalize+sort stages blows past janino's method-size limit
    # (Spark falls back to interpreted eval with a noisy ERROR; the
    # checkpoint keeps the flagship's codegen clean)
    docs = gen_documents_spans(spark, "t1").localCheckpoint(eager=True)
    seeds = gen_seeds(spark, "t1").localCheckpoint(eager=True)
    robots = gen_robots(spark, "t1").localCheckpoint(eager=True)
    pol = gen_politeness(spark, "t1").localCheckpoint(eager=True)
    # the snapshot store is scratch state for the die/resume demo — clean
    # it up so repeated flagship runs don't accumulate temp directories.
    # The returned fetch log is collected from an in-memory frame, so it
    # stays valid after the store is removed.
    with tempfile.TemporaryDirectory(prefix="flagship_snap_") as store_root:
        run_crawl(
            spark, docs, seeds, robots, pol,
            CrawlConfig(max_rounds=1, num_partitions=4, expected_total=20_000,
                        store_root=store_root),
        )
        res = run_crawl(
            spark, docs, seeds, robots, pol,
            CrawlConfig(max_rounds=2, num_partitions=4, expected_total=20_000,
                        store_root=store_root, resume=True),
        )
        # materialize before the store dir vanishes: the resumed frontier
        # lineage reads parquet snapshots under store_root lazily
        fetch_log = res.fetch_log.localCheckpoint(eager=True)
    return fetch_log


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
