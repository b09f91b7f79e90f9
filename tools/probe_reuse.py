"""Empirical check: does AQE ReuseExchange dedupe the self-join family's
upstream pipeline at runtime?  The static plans (plans/r15/q47_after.txt
etc.) show two parquet scans — but explain() prints the INITIAL plan;
AQE's ReuseExchange fires at runtime.  This runs each query through the
noop sink and prints the EXECUTED plan's ReusedExchange / Scan counts,
which is the ground truth the optimization decision needs (guide §1/§7.2).

Usage: python tools/probe_reuse.py [q45 q47 ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

TARGETS = [
    "q41_dedup_jaccard",
    "q42_dedup_minhash",
    "q45_dedup_minhash_banded",
    "q47_dedup_simhash_banded",
    "q55_embedding_lsh_dedup",
]


def main() -> None:
    names = sys.argv[1:] or TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from tinymr_spark.session import get_session

    spark = get_session(app_name="tinymr-probe-reuse")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    short2full = {n.split("_")[0]: n for n in qs}
    for name in names:
        fn = qs[name] if name in qs else qs[short2full[name.split("_")[0]]]
        spark.sparkContext.setJobDescription(f"reuse-probe {name}")
        df = fn(spark, sf_dir)
        # Execute through the DataFrame's OWN QueryExecution (a noop write
        # command builds a separate QE and leaves this one un-finalized,
        # isFinalPlan=false); outputs here are small, collect is safe.
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        n_reused = len(re.findall(r"ReusedExchange", executed))
        n_scan = len(re.findall(r"Scan parquet", executed))
        n_exch = len(re.findall(r"\bExchange\b", executed))
        n_rdd = len(re.findall(r"Scan ExistingRDD", executed))
        print(
            f"{name:32s} ReusedExchange={n_reused} ScanParquet={n_scan} "
            f"Exchange={n_exch} ScanRDD={n_rdd}"
        )
        out = os.path.join("/root/repo/plans/r15", f"{name.split('_')[0]}_executed.txt")
        with open(out, "w") as f:
            f.write(f"# EXECUTED plan (post-AQE) for {name} @ {sf_dir}\n")
            f.write(executed)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
