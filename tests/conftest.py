from __future__ import annotations

import os
import sys

import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from journal_batch_processer_spark.session import get_spark  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "jbp-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/jbp-test-warehouse"},
    )
    yield s


@pytest.fixture(scope="session")
def fixture_csv() -> str:
    return os.path.join(DATA_DIR, "item_records.csv")


def read_golden(name: str) -> list[list[str]]:
    """Reference-style parse: strip line, split on comma (no quoting)."""
    rows = []
    with open(os.path.join(DATA_DIR, name)) as fh:
        for line in fh:
            rows.append(line.strip().split(","))
    return rows
