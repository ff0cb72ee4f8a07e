import pytest


@pytest.fixture(scope="session")
def spark():
    from warc2zim_spark.session import get_spark

    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def webdata(tmp_path_factory):
    """sf0.001 synthetic web tables (generated once per test session)."""
    from warc2zim_spark.sources.datagen import ensure_webdata

    return str(ensure_webdata("sf0.001"))
