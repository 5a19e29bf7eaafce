import pytest


@pytest.fixture(scope="session")
def spark():
    from gtfs_conflation_pipeline_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
