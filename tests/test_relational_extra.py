"""Accuracy contract for sketch-based operators that have no SQL oracle.

q24_approx_distinct uses HyperLogLog++ with rsd=0.02; its estimate per
group must land within 3*rsd of the exact distinct count (HLL++ error is
~normal around the true value, so 6 sigma-equivalents is a deterministic
bound in practice for these cardinalities).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tinymr_spark.operators.relational import q24_approx_distinct
from tinymr_spark.sources import load_table


def test_q24_approx_distinct_within_tolerance(spark, sf_dir):
    approx = {
        r["l_returnflag"]: (r["approx_parts"], r["n_rows"])
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
    assert set(approx) == set(exact)
    for flag, (est, n_rows) in approx.items():
        true, true_rows = exact[flag]
        assert n_rows == true_rows
        assert abs(est - true) <= max(3, 0.06 * true), (flag, est, true)
