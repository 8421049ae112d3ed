from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
# tools CLIs (run_pipeline, curate_corpus, ...) import as top-level
# modules in tests — resolved from the checkout, never a hardcoded path
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from wikidataquality_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=8, shuffle_partitions=8, app_name="tests")
    yield s


SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf0001_dir():
    return SF0001


@pytest.fixture(scope="session")
def sf001_dir():
    return SF001
