"""Shared test setup.

The read-only reference checkout at /root/reference is the *oracle*: parity
tests import its parser functions and replay them on the same fixture texts,
asserting byte-identical outputs against ocr_spark.  Reference code is never
copied — only invoked.
"""

from __future__ import annotations

import sys
from datetime import date
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

for p in (str(REPO), str(REFERENCE)):
    if p not in sys.path:
        sys.path.insert(0, p)

# The reference calls date.today() internally; our engine takes run_date
# explicitly.  Using today's date for both keeps them byte-identical.
RUN_DATE = date.today()


@pytest.fixture(scope="session")
def run_date() -> date:
    return RUN_DATE


@pytest.fixture(scope="session")
def spark():
    """local[*] session shared by all Spark tests in one pytest run."""
    from pyspark.sql import SparkSession

    session = (
        SparkSession.builder.master("local[4]")
        .appName("ocr_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield session
