from __future__ import annotations

import pytest

from graph_rag_agent_spark.core.gen import generate_transcripts
from graph_rag_agent_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="grars-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def small_corpus():
    """Deterministic 12-conversation corpus shared across tests."""
    return generate_transcripts(12)


@pytest.fixture(scope="session")
def oracle_small(small_corpus):
    from graph_rag_agent_spark.oracle import oracle_build

    return oracle_build(small_corpus)


@pytest.fixture(scope="session")
def transcripts_df(spark, small_corpus):
    from graph_rag_agent_spark import schemas

    return spark.createDataFrame(small_corpus, schema=schemas.TRANSCRIPTS).cache()
