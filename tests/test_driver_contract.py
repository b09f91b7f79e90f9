"""The __spark_entry__ wrapper must hold its contract on a session the
harness owns: even if the surrounding session was reconfigured to a
non-UTC timezone, wrapped queries pin UTC (the NTZ->LTZ cast in the
loader is value-preserving only under UTC) and still match the oracle."""

from __future__ import annotations

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py"),
)
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracle)


@pytest.mark.parametrize("name", ["q70_tumbling_window", "q90_stream_tumbling"])
def test_wrapper_pins_utc_on_foreign_session(spark, duck, sf_dir, name):
    import __spark_entry__ as entrymod

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        sdf = entrymod.queries()[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    rel = duck.sql(entrymod.oracle_sql()[name])
    assert check_oracle.table_hash(srows, scols) == check_oracle.table_hash(
        rel.fetchall(), rel.columns
    )


def test_module_execution_surface_prints_version():
    """Reference CI parity: `python -m tinymr_spark --version` must work
    (reference tests.yml:44 runs `python3 -m tinymr --version`)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "tinymr_spark", "--version"],
        capture_output=True,
        text=True,
        timeout=120,
        check=True,
    )
    import tinymr_spark

    assert out.stdout.strip() == tinymr_spark.__version__


def test_gate_rotation_orders_reworked_then_stalest():
    """The driver's correctness gate hashes the FIRST 50 queries()
    entries; the rotation must front (a) anything never driver-verified,
    (b) anything semantically REWORKED this round (prior verification no
    longer attests current behavior), then backfill least-recently-
    verified first.  A regression here silently starves stale queries of
    re-verification."""
    from tinymr_spark.operators import (
        _REWORKED_THIS_ROUND,
        _VERIFIED_ROUND,
        all_queries,
    )

    order = list(all_queries())
    fresh = [n for n in order if n not in _VERIFIED_ROUND or n in _REWORKED_THIS_ROUND]
    # every fresh/reworked entry precedes every verified backlog entry
    assert order[: len(fresh)] == fresh
    # the backlog is non-decreasing in last-verified round
    rounds = [_VERIFIED_ROUND[n] for n in order[len(fresh):]]
    assert rounds == sorted(rounds)
    # and every reworked name actually exists in the registry
    assert _REWORKED_THIS_ROUND <= set(order)
