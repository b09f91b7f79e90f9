"""Registry-wide EXECUTED-plan duplicated-work audit (VERDICT r15 task 8).

tests/test_plan_audit.py checks static explain() output; this one runs
every registry query at sf0.001 and inspects the FINAL (post-AQE) plan,
because that is the only place the duplicate-pipeline failure mode is
visible: a subtree shared in code silently re-expands into two full
pipelines when column pruning de-canonicalizes one consumer's copy and
ReuseExchange stops firing.  Round 15's push-button audit caught three
live instances (q38 corpus tokenized twice, q145 shard tokenized three
times, q106 span pipeline exploded twice + AQE-broadcast); this test
makes the next regression of that class fail in CI instead of waiting
for the next audit session.

The allowlist pins the adjudicated-inherent duplications — DML-verb
lifecycles whose write-then-verify reads scan their OWN staged tmp
tables twice by design (q148/q200/q201/q209, bench rows < 1 s, verb-local
minitables, never the corpus).  Anything new here must be either fixed
or explicitly adjudicated into the list with a reason.
"""

from __future__ import annotations

from tinymr_spark.plans import executed_dup_signatures

# query -> why the duplication is the design, not a regression
ALLOWED_DUPS = {
    "q148_quality_constraints": "constraint verb lifecycle re-reads its own staged table",
    "q200_zorder_verb": "zorder verb rewrites then verifies its own staged layout",
    "q201_replace_where": "replaceWhere guard + rewrite both read the staged partition",
    "q209_column_defaults": "defaults backfill reads its own staged table twice (verb lifecycle)",
}

AUDIT_SF = "/root/testdata/sf0.001"


def test_no_duplicated_pipelines_in_executed_plans(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    offenders: dict[str, dict[str, int]] = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"final-plan-audit-test {name}")
        dups = executed_dup_signatures(fn(spark, AUDIT_SF))
        if dups and name not in ALLOWED_DUPS:
            offenders[name] = {k[:160]: c for k, c in dups.items()}
    spark.sparkContext.setJobDescription(None)
    assert not offenders, (
        "duplicated Generate/FileScan/Python-eval signatures in executed "
        f"plans (fix, or adjudicate into ALLOWED_DUPS with a reason): {offenders}"
    )
