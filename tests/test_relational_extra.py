"""Accuracy contract for the sketch-based distinct-count operator.

q24_approx_distinct runs HyperLogLog++ at rsd=0.02 and emits the EXACT
distinct count alongside a `within_bound` flag asserting the sketch
landed within 5% of it (~2.5 sigma; HLL++ register updates are max-based,
so the estimate is deterministic for a fixed dataset regardless of
partition order).  The flag makes the accuracy contract itself part of
the driver-hashed result; this test checks the same contract locally and
cross-checks the exact column against an independent computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tinymr_spark.operators.relational import q24_approx_distinct
from tinymr_spark.sources import load_table


def test_q24_exact_counts_and_bound(spark, sf_dir):
    got = {
        r["l_returnflag"]: (r["exact_parts"], r["n_rows"], r["within_bound"])
        for r in q24_approx_distinct(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: (r["exact_parts"], r["n_rows"])
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, (n_parts, n_rows, within) in got.items():
        assert (n_parts, n_rows) == exact[flag]
        assert within is True, flag
