from warchaeology_spark.operators.ls import (  # noqa: F401
    RecordFilter,
    cdx_projection,
    parse_format_spec,
    per_file_limit,
    per_file_nth,
    per_file_skip,
    compose,
)
from warchaeology_spark.operators.validate import (  # noqa: F401
    per_file_stats,
    global_stats,
)
from warchaeology_spark.operators.dedup import dedup_first_wins  # noqa: F401
