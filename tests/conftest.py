import pytest


@pytest.fixture(scope="session")
def spark():
    from smart_ocr_spark.session import build_session

    s = build_session("tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
