"""Physical-plan inspection: the tooling used to keep operators honest at
scale.  The reference has no optimizer (SURVEY.md §4); our optimizer is
Catalyst, and these helpers assert we actually GET its optimizations —
pushdown reached the scan, dimensions broadcast, aggregates are partial —
instead of assuming them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (DataFrame.explain only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan carries at least one pushed filter."""
    s = explain_str(df)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the scan actually reads (pruning check)."""
    s = explain_str(df)
    cols: list[str] = []
    for line in s.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inner.split(",") if f)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)

def has_shuffle_join(df: DataFrame) -> bool:
    s = explain_str(df)
    return "SortMergeJoin" in s or "ShuffledHashJoin" in s


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side (partial) aggregation before the exchange — the built-in
    version of the reference's manual combine idiom (docs.rst:199-283)."""
    return "partial_" in explain_str(df) or "HashAggregate" in explain_str(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower is better; broadcast
    exchanges are excluded)."""
    s = explain_str(df, "simple")
    return sum(
        1
        for line in s.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def uses_python_eval(df: DataFrame) -> bool:
    """True if the plan row-trips through Python (BatchEvalPython — the
    slow path; ArrowEvalPython/MapInPandas are the sanctioned ones)."""
    return "BatchEvalPython" in explain_str(df)


def executed_dup_signatures(df: DataFrame) -> dict[str, int]:
    """Duplicated-pipeline smell detector over the FINAL (post-AQE)
    plan: execute the DataFrame through its OWN QueryExecution (collect —
    a separate noop-write command would build a fresh QE and leave
    isFinalPlan=false), then count Generate/FileScan/Python-eval lines
    whose normalized signature (expr/plan ids stripped) appears 2+ times.
    explain() cannot do this job: AQE ReuseExchange only shows in the
    executed plan, and the r15 audit found both error directions in
    initial-plan reasoning — self-joins that DO reuse at runtime, and
    shared code that column pruning silently re-expands into duplicate
    full pipelines (q38/q145/q106)."""
    import re

    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final = executed.split("== Initial Plan ==")[0]
    sig_counts: dict[str, int] = {}
    for line in final.splitlines():
        if (
            "Generate explode" in line
            or "FileScan" in line
            or "ArrowEvalPython" in line
            or "BatchEvalPython" in line
        ):
            s = line.strip()
            s = re.sub(r"#\d+L?", "#x", s)
            s = re.sub(r"plan_id=\d+", "plan_id=x", s)
            s = re.sub(r"\[\d+\]", "[x]", s)
            sig_counts[s] = sig_counts.get(s, 0) + 1
    return {k: c for k, c in sig_counts.items() if c > 1}
