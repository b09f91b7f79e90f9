"""Shared fixtures: one SparkSession per test session, testdata locations."""

from __future__ import annotations

import os

import pytest

SF_SMALL = os.environ.get("TINYMR_SPARK_TEST_SF", "/root/testdata/sf0.001")

# Task classes are defined in test modules; Spark workers unpickle them by
# module name, so tests/ and the repo root must be importable in workers.
# Must be set before the JVM / python daemons start.
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_TESTS_DIR)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_TESTS_DIR, _REPO_DIR, os.environ.get("PYTHONPATH")) if p
)


@pytest.fixture(scope="session")
def spark():
    from tinymr_spark.session import get_session

    s = get_session(app_name="tinymr-spark-tests", cpus="4")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(SF_SMALL, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()
