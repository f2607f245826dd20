from warchaeology_spark.fixtures.generate import (  # noqa: F401
    TIERS,
    gen_documents_spans,
    gen_fetch_records,
    gen_seeds,
    gen_robots,
    gen_politeness,
    generate_all,
)
