"""Shared Spark session + corpus fixtures for the test suite.

(The reference ships zero tests despite pinning pytest —
``/root/reference/requirements.txt:31``; SURVEY.md §5 — this suite is
the pyramid it lacks.)
"""

from __future__ import annotations

import pytest

from face_duplicate_detection_spark.config import DedupConfig
from face_duplicate_detection_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fdds-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return DedupConfig()


@pytest.fixture(scope="session")
def documents(spark):
    from face_duplicate_detection_spark.sources.pages import read_documents

    return read_documents(spark, SF_DIR).cache()


@pytest.fixture(scope="session")
def pages_500(spark):
    from face_duplicate_detection_spark.sources.pages import synthesize_pages

    return synthesize_pages(spark, 500, seed=42).cache()
