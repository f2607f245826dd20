from warchaeology_spark.frontier.links import extract_outlinks  # noqa: F401
from warchaeology_spark.frontier.seen import SeenState  # noqa: F401
from warchaeology_spark.frontier.politeness import (  # noqa: F401
    robots_gate,
    politeness_topk,
)
from warchaeology_spark.frontier.scheduler import CrawlConfig, run_crawl  # noqa: F401
