from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from combinedfeatureextraction_spark.session import get_spark

    s = get_spark(app_name="cfe_tests", cpus=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def seqs_pdf():
    from combinedfeatureextraction_spark.sources.fixtures import sequences_pandas

    return sequences_pandas(40, seed=42)


@pytest.fixture(scope="session")
def states_pdf():
    from combinedfeatureextraction_spark.sources.fixtures import states_pandas

    return states_pandas(seed=42)


@pytest.fixture(scope="session")
def seqs_df(spark, seqs_pdf):
    from combinedfeatureextraction_spark.sources.fixtures import SEQUENCES_SCHEMA

    return spark.createDataFrame(seqs_pdf, schema=SEQUENCES_SCHEMA).cache()


@pytest.fixture(scope="session")
def states_df(spark, states_pdf):
    from combinedfeatureextraction_spark.sources.fixtures import STATES_SCHEMA

    return spark.createDataFrame(states_pdf, schema=STATES_SCHEMA)
