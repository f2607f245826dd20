"""warchaeology_spark — a PySpark-native crawl-frontier analytics engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of nlnwa/warchaeology (reference, read-only at
/root/reference), re-expressed Spark-first:

- record data model + CDX field surface   -> fixed StructType DataFrames
  (reference: internal/warc/metadata_helpers.go)
- dataflow operator algebra (filter/limit/nth/skip/compose)
  (reference: internal/warc/combinators.go) -> Column predicates + windows
- digest first-occurrence-wins dedup       -> window + join-back
  (reference: internal/index/digestindex.go, cmd/dedup/dedup.go)
- validation + per-file/global aggregates  -> groupBy().agg()
  (reference: internal/stat/{results,stats}.go)
- persistent file index / resumability     -> snapshot tables + anti-join
  (reference: internal/index/fileindex.go, internal/filewalker/prepost.go)

plus the BASELINE.json north-rule frontier machinery the reference lacks:
SURT canonicalization, partitioned bloom URL-seen, robots gating, per-host
politeness budgets, host-salted priority scheduling, checkpointed rounds.
"""

__version__ = "0.1.0"

from warchaeology_spark.session import get_spark  # noqa: F401
