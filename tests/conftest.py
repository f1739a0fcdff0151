"""Shared fixtures: one tuned SparkSession per test run + DuckDB oracle."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Put the vendored protobuf shim on PYTHONPATH BEFORE any JVM launches:
# Spark's transformWithState spawns its state-protocol Python workers with
# the PYTHONPATH the JVM captured at startup, so setting it later is too
# late for that process tree (real protobuf, when present, still wins —
# the shim dir is appended, and `import google` prefers the real package
# found earlier on the path).
_SHIM = str(REPO_ROOT / "flink_ci_flink_spark" / "protoshim")
if _SHIM not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        os.environ["PYTHONPATH"] + os.pathsep + _SHIM
        if os.environ.get("PYTHONPATH")
        else _SHIM
    )

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from flink_ci_flink_spark.session import get_spark

    spark = get_spark("flink_ci_flink_spark-tests", cpus=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same tables registered as views."""
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
