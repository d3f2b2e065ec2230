from __future__ import annotations

import pytest

from tsforge_spark.fixtures import make_panel, make_preds, make_transcripts, transcripts_to_spark
from tsforge_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tsforge-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    return make_transcripts(n_convs=60, seed=42)


@pytest.fixture(scope="session")
def transcripts(spark, transcripts_pdf):
    return transcripts_to_spark(spark, transcripts_pdf).cache()


@pytest.fixture(scope="session")
def panel_pdf():
    return make_panel(n_ids=8, n_days=90, seed=42)


@pytest.fixture(scope="session")
def panel(spark, panel_pdf):
    return spark.createDataFrame(panel_pdf).cache()


@pytest.fixture(scope="session")
def preds_pdf(panel_pdf):
    return make_preds(panel_pdf, seed=42)


@pytest.fixture(scope="session")
def preds(spark, preds_pdf):
    return spark.createDataFrame(preds_pdf).cache()
