from __future__ import annotations

import pytest

from warchaeology_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_dir(spark, tmp_path_factory):
    """Generate the t1 fixture corpus once per test session."""
    from warchaeology_spark.fixtures.generate import generate_all

    out = tmp_path_factory.mktemp("fixtures")
    generate_all(spark, str(out), "t1")
    return str(out)


@pytest.fixture(scope="session")
def fetch_records(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/fetch_records.parquet")


@pytest.fixture(scope="session")
def documents_spans(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/documents_spans.parquet")
