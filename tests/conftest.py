import pytest

from python_web_scraper_cleaner_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()
