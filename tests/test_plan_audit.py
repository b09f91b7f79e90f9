"""Regression gate: no batch query's physical plan may contain a scale
red flag (cartesian product, non-whitelisted nested-loop join, or
row-at-a-time Python).  tools/audit_plans.py is the narrated version;
this is the enforcement.  Streaming queries are excluded (construction
drives the stream; their returned plans are memory-table reads)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tools.audit_plans import ALLOW_BNLJ, DYNAMIC, RED


def test_q103_vocab_topv_is_distributed(spark, sf_dir):
    """q103's vocab ranking must NOT be an unpartitioned window over the
    full distinct-token table (a single-executor sort of 1e8-1e9 rows at
    100 TB).  The required shape: a TakeOrderedAndProject (distributed
    top-V) BELOW the row_number Window, so the window only ever sees V
    rows.  Children print below parents in the plan string."""
    from tinymr_spark.operators.text import q103_vocab_encode

    plan = (
        q103_vocab_encode(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, "top-V must lower to TakeOrderedAndProject"
    wi = plan.find("Window [row_number")
    ti = plan.find("TakeOrderedAndProject")
    assert wi != -1 and ti > wi, "row_number Window must sit above the top-V limit"


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
