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
    """Flagship: crawl 2 frontier rounds on the t1 synthetic corpus."""
    from warchaeology_spark.fixtures.generate import (
        gen_documents_spans,
        gen_politeness,
        gen_robots,
        gen_seeds,
    )
    from warchaeology_spark.frontier.scheduler import CrawlConfig, run_crawl

    docs = gen_documents_spans(spark, "t1")
    res = run_crawl(
        spark,
        docs,
        gen_seeds(spark, "t1"),
        gen_robots(spark, "t1"),
        gen_politeness(spark, "t1"),
        CrawlConfig(max_rounds=2, num_partitions=4, expected_total=20_000),
    )
    return res.fetch_log


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
