"""UDF/UDAF/UDTF surface (SURVEY.md §2.4): the reference is *only* UDFs —
``mapper`` is a UDTF, ``reducer`` a UDAF over a value list
(/root/reference/tinymr.py:39-91).  Here the sanctioned Spark forms:

* scalar ``@pandas_udf`` (Arrow-vectorized, not row-at-a-time Python);
* grouped ``applyInPandas`` (the UDAF/group-map form);
* ``mapInPandas`` lives in operators/multimodal.py.

Each demo is deliberately SQL-reproducible so the DuckDB oracle verifies
the UDF plumbing end-to-end (batch boundaries, Arrow conversion, schema).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tinymr_spark.sources import load_table


def signed_log_amount():
    """Vectorized scalar UDF: sign-preserving log1p, a common feature
    transform.  Created lazily — a module-level @pandas_udf would re-run
    its DDL parse when Spark workers import this module to unpickle other
    functions, and workers have no SparkContext."""

    @pandas_udf("double")
    def _udf(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.sign(v) * np.log1p(v.abs())

    return _udf


def q63_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.round(signed_log_amount()(F.col("o_totalprice")), 6).alias("log_price"),
    )


ORACLE_Q63 = """
SELECT o_orderkey,
       ROUND(SIGN(o_totalprice) * LN(1 + ABS(o_totalprice)), 6) AS log_price
FROM orders
"""


def _segment_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Group-map UDAF: per-segment stats computed with pandas/numpy —
    the applyInPandas form of the reference's reducer contract."""
    return pd.DataFrame(
        {
            "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
            "n": [len(pdf)],
            "total_bal": [round(float(pdf["c_acctbal"].sum()), 2)],
            "max_bal": [float(pdf["c_acctbal"].max())],
            "n_negative": [int((pdf["c_acctbal"] < 0).sum())],
        }
    )


def q64_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").applyInPandas(
        _segment_stats,
        schema="c_mktsegment string, n bigint, total_bal double, max_bal double, n_negative bigint",
    )


ORACLE_Q64 = """
SELECT c_mktsegment,
       COUNT(*) AS n,
       ROUND(SUM(c_acctbal), 2) AS total_bal,
       MAX(c_acctbal) AS max_bal,
       CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
FROM customer
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q100 — GROUPED_AGG pandas UDF: the third sanctioned pandas-UDF flavor
# (scalar = q63, grouped map = q64).  A Series -> scalar pandas_udf slots
# straight into groupBy().agg() beside built-ins, with map-side Arrow
# batching per group.  The aggregate is a 2-decimal money sum: inputs are
# exact multiples of 0.01, so ROUND(sum, 2) recovers the same multiple on
# both engines regardless of numpy's pairwise vs SQL's sequential
# accumulation order — the one FP-summation case that is hash-safe.
# ---------------------------------------------------------------------------
def rounded_total():
    @pandas_udf("double")
    def _udaf(v: pd.Series) -> float:
        return round(float(v.sum()), 2)

    return _udaf


def group_size():
    # Spark refuses to mix GROUPED_AGG pandas UDFs with JVM aggregates in
    # one agg() (INVALID_PANDAS_UDF_PLACEMENT) — so the row count is a
    # pandas UDAF too
    @pandas_udf("long")
    def _udaf(v: pd.Series) -> int:
        return len(v)

    return _udaf


def q100_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        rounded_total()(F.col("o_totalprice")).alias("total_price"),
        group_size()(F.col("o_totalprice")).alias("n_orders"),
    )


ORACLE_Q100 = """
SELECT o_orderpriority,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


QUERIES = {
    "q63_pandas_udf_scalar": q63_pandas_udf_scalar,
    "q64_apply_in_pandas": q64_apply_in_pandas,
    "q100_pandas_udaf": q100_pandas_udaf,
}

ORACLE = {
    "q63_pandas_udf_scalar": ORACLE_Q63,
    "q64_apply_in_pandas": ORACLE_Q64,
    "q100_pandas_udaf": ORACLE_Q100,
}
