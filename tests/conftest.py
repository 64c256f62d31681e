import pytest

from website_to_agent_spark import fixtures
from website_to_agent_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def site():
    # small deterministic graph covering every filter/extraction branch
    return fixtures.generate_site(n_pages=60, big_text_pages=1, big_text_kb=20)


@pytest.fixture(scope="session")
def pages_df(spark, site):
    df = fixtures.pages_rows_to_spark(spark, site.rows)
    df = df.localCheckpoint(eager=True)
    return df


@pytest.fixture(scope="session")
def store(site):
    return site.as_store()
