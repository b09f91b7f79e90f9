"""Regression gate: no batch query's physical plan may contain a scale
red flag (cartesian product, non-whitelisted nested-loop join, or
row-at-a-time Python).  tools/audit_plans.py is the narrated version;
this is the enforcement.  Streaming queries are excluded (construction
drives the stream; their returned plans are memory-table reads)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tools.audit_plans import ALLOW_BNLJ, DYNAMIC, RED


def test_no_red_flags_in_batch_plans(spark, sf_dir):
    failures = []
    for name, fn in entrymod.queries().items():
        if name in DYNAMIC or name.startswith("q9"):
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        reds = [
            p for p in RED
            if p in plan and not (p == "BroadcastNestedLoopJoin" and name in ALLOW_BNLJ)
        ]
        if reds:
            failures.append((name, reds))
    assert not failures, failures
