import pytest


@pytest.fixture(scope="session")
def spark():
    from text_extraction_spark.conf import get_spark

    s = get_spark("local[8]", shuffle_partitions=16)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Shared 80-doc corpus + golden, generated once per test session."""
    from text_extraction_spark.corpus import write_corpus_parquet

    d = tmp_path_factory.mktemp("corpus")
    write_corpus_parquet(str(d), 80)
    return str(d)
