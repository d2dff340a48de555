import pytest

# the one copy of the small-scale testdata path tests run against
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    from lingvo_spark_kg.session import get_spark

    s = get_spark(app_name="lingvo-spark-kg-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def gaz_bc(spark):
    from lingvo_spark_kg.fixtures.corpus import gazetteer_from_aliases, make_aliases

    return spark.sparkContext.broadcast(gazetteer_from_aliases(make_aliases(seed=42)))
