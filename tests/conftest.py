import pytest

from ht_ner_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ht-ner-tests", cores=4, shuffle_partitions=8)
    yield s
