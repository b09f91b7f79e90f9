"""Registry-wide duplicated-work audit over FINAL (post-AQE) plans.

explain() prints the initial plan; AQE exchange reuse only shows in the
executed plan.  q38 proved the failure mode matters: a shared subtree in
the code can be re-expanded into two full pipelines when column pruning
de-canonicalizes the exchanges.  This executes every registry query via
collect() (finalizing the DataFrame's own QueryExecution) and flags final
plans containing two or more Generate/Scan nodes with an IDENTICAL
normalized signature — the duplicated-pipeline smell.

Usage: python tools/audit_final_plans.py [--sf DIR] [names...]
Writes plans/$PLANS_ROUND/final_plan_audit.json (default r16).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def norm(line: str) -> str:
    """Normalize a plan line: strip expr ids / plan ids so structurally
    identical operators compare equal."""
    s = line.strip()
    s = re.sub(r"#\d+L?", "#x", s)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    s = re.sub(r"\[\d+\]", "[x]", s)
    return s


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    import __spark_entry__ as entrymod
    from tinymr_spark.session import get_session

    spark = get_session(app_name="tinymr-final-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args or list(qs)

    report = {}
    flagged = []
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"final-plan-audit {name}")
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.collect()
            executed = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            report[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"ERR   {name}: {type(e).__name__}", file=sys.stderr)
            continue
        # Final-plan section only (AdaptiveSparkPlan prints the initial
        # plan below it; non-AQE plans have no marker and pass whole).
        final = executed.split("== Initial Plan ==")[0]
        sig_counts: dict[str, int] = {}
        for line in final.splitlines():
            if "Generate explode" in line or "FileScan" in line or (
                "ArrowEvalPython" in line or "BatchEvalPython" in line
            ):
                k = norm(line)
                sig_counts[k] = sig_counts.get(k, 0) + 1
        dups = {k: c for k, c in sig_counts.items() if c > 1}
        row = {
            "sec": round(time.perf_counter() - t0, 2),
            "generates": sum(c for k, c in sig_counts.items() if "Generate" in k),
            "scans": sum(c for k, c in sig_counts.items() if "FileScan" in k),
            "dup_sigs": {k[:160]: c for k, c in dups.items()},
        }
        report[name] = row
        mark = " DUP!" if dups else ""
        if dups:
            flagged.append(name)
        print(f"ok    {name:34s} gen={row['generates']} scan={row['scans']}{mark}")
    spark.sparkContext.setJobDescription(None)
    rnd = os.environ.get("PLANS_ROUND", "r16")
    with open(f"/root/repo/plans/{rnd}/final_plan_audit.json", "w") as f:
        json.dump({"sf": sf_dir, "rows": report, "flagged": flagged}, f, indent=1)
    print("flagged:", flagged)


if __name__ == "__main__":
    main()
