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


# ---------------------------------------------------------------------------
# Parity-face coverage gate (reference CI parity: --cov-fail-under 100).
# Tracing is scoped to the parity test modules so the rest of the suite
# pays zero trace overhead; test_zz_mapreduce_coverage.py asserts at the
# end of a full run.
# ---------------------------------------------------------------------------
import _coverage_gate


def pytest_deselected(items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _coverage_gate.PARITY_TEST_MODULES:
            _coverage_gate.parity_deselected.add(item.nodeid)


def pytest_runtest_logreport(report):
    if os.path.basename(report.fspath) in _coverage_gate.PARITY_TEST_MODULES:
        if report.when == "call":
            _coverage_gate.parity_ran.add(report.nodeid)
        if report.failed:
            _coverage_gate.parity_failed.add(report.nodeid)


@pytest.hookimpl(wrapper=True)
def pytest_runtest_protocol(item, nextitem):
    traced = os.path.basename(str(item.fspath)) in _coverage_gate.PARITY_TEST_MODULES
    if traced:
        _coverage_gate.trace_on()
    try:
        return (yield)
    finally:
        if traced:
            _coverage_gate.trace_off()


@pytest.fixture(scope="session")
def spark():
    from tinymr_spark.session import get_session

    s = get_session(app_name="tinymr-spark-tests", cpus="4")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    if not os.path.isdir(SF_SMALL):
        pytest.skip(
            "synthetic parquet fixtures not present at "
            f"{SF_SMALL} (driver-generated; see TESTDATA.md)"
        )
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
