from warchaeology_spark.sources.walker import walk_files, read_source_file_list  # noqa: F401
from warchaeology_spark.sources.arc import parse_arc_v1_lines  # noqa: F401
from warchaeology_spark.sources.nedlib import parse_nedlib_pairs  # noqa: F401
