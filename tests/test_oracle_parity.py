"""Every declared query vs its DuckDB oracle at sf0.001 — the in-repo
mirror of the driver's t2 gate (rowcount + column set + order-insensitive
normalized values)."""

from __future__ import annotations

import importlib.util
import math
import os
from datetime import date, datetime

import pytest

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py"),
)
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracle)


def _queries():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


QUERIES, ORACLES = _queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert srows is not None  # rows-only contract
        return
    rel = duck.sql(ORACLES[name])
    dcols = rel.columns
    drows = rel.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert sorted(scols) == sorted(dcols)
    assert check_oracle.table_hash(srows, scols) == check_oracle.table_hash(
        drows, dcols
    )
