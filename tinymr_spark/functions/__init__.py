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


# ---------------------------------------------------------------------------
# q119 — COGROUPED applyInPandas: the fourth pandas-UDF flavor (scalar =
# q63, grouped map = q64, grouped agg = q100).  cogroup() aligns the two
# sides' groups by key and hands each pair of pandas frames to Python —
# the sanctioned escape hatch for per-key MERGE logic Spark can't
# express, canonical example: pandas-style as-of alignment.  Semantics
# here mirror q75 exactly (most-recent-prior click per purchase, per
# user), so the same native DuckDB ASOF JOIN oracle verifies the cogroup
# plumbing: key alignment, empty-side groups (purchases with no clicks
# keep NULLs, click-only users yield nothing), Arrow nullable-int
# transfer.  One shuffle per side on user_id — identical to the join it
# replaces.
# ---------------------------------------------------------------------------
COGROUP_BUCKETS = 64


def _asof_merge(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
    """Bucket-level as-of alignment: pandas merge_asof with by=user_id
    does the per-user matching vectorized inside one call.  Cogrouping on
    the raw user_id would invoke Python once per user — thousands of
    micro-batches whose per-call overhead dwarfs the work (measured 7.3s
    vs 0.9s at sf0.1); the bucket key keeps the SAME per-user semantics
    at ~batch-sized granularity.  This is the general rule for grouped
    pandas stages: the cogroup key sets the BATCH size, the by= key sets
    the semantics."""
    if purchases.empty:
        return pd.DataFrame(
            {
                "purchase_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "last_click_id": pd.Series([], dtype="Int64"),
                "gap_sec": pd.Series([], dtype="Int64"),
            }
        )
    # The click side ships its user column as `cuser`: both sides naming
    # it user_id would be the SAME attribute (one scan underneath), and
    # Spark's cogroup dedups shared attributes out of the right side's
    # Arrow batches — the column silently vanishes from this frame.
    clicks = clicks.rename(columns={"cuser": "user_id"})
    p = purchases.sort_values(["pts", "purchase_id"])
    if clicks.empty:
        merged = p.assign(click_id=pd.array([None] * len(p), dtype="Int64"))
        merged["cts"] = pd.NaT
    else:
        # sort order (cts, click_id) makes the equal-timestamp tie pick
        # deterministic (merge_asof takes the last row in sort order)
        c = clicks.sort_values(["cts", "click_id"])
        # nullable Int64 BEFORE the merge: unmatched purchases would
        # otherwise upcast int64 click_id through float64 NaN, silently
        # losing precision above 2^53
        c["click_id"] = c["click_id"].astype("Int64")
        merged = pd.merge_asof(
            p,
            c,
            left_on="pts",
            right_on="cts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
    # floor-second diff for the gap (unix_timestamp parity with q75)
    psec = merged["pts"].to_numpy().astype("datetime64[s]").astype("int64")
    have = merged["cts"].notna().to_numpy()
    csec = (
        merged["cts"]
        .to_numpy()
        .astype("datetime64[s]")
        .astype("int64", copy=False)
    )
    return pd.DataFrame(
        {
            "purchase_id": merged["purchase_id"].to_numpy(),
            "user_id": merged["user_id"].to_numpy(),
            "last_click_id": merged["click_id"].astype("Int64"),
            "gap_sec": pd.array(
                [
                    int(psec[i] - csec[i]) if have[i] else None
                    for i in range(len(merged))
                ],
                dtype="Int64",
            ),
        }
    )


def q119_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.pmod(F.col("user_id"), F.lit(COGROUP_BUCKETS)).alias("bkt")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        bucket,
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cuser"),
        F.col("ts").alias("cts"),
        bucket,
    )
    return (
        purchases.groupBy("bkt")
        .cogroup(clicks.groupBy("bkt"))
        .applyInPandas(
            _asof_merge,
            schema="purchase_id long, user_id long, last_click_id long, gap_sec long",
        )
    )


# Same contract as q75: the cogroup implementation must reproduce the
# native ASOF JOIN bit-for-bit.
ORACLE_Q119 = """
SELECT p.event_id AS purchase_id, p.user_id,
       c.event_id AS last_click_id,
       date_diff('second', c.ts, p.ts) AS gap_sec
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# ---------------------------------------------------------------------------
# q120 — Python UDTF (Spark 3.5+/4): the table-function surface — one
# input row, many output rows, schema declared on the class.  This is
# the form the reference's generator MAPPER is (yield 0..n records per
# item, /root/reference/tinymr.py:39-59), so the UDTF registration +
# SQL LATERAL call is the reference idiom lifted to SQL.  Arrow
# evaluation is forced on: the default pickle path plans as
# BatchEvalPythonUDTF (row-at-a-time, plan-audit RED); with Arrow the
# node is ArrowEvalPythonUDTF, the sanctioned batched form.
# ---------------------------------------------------------------------------
UDTF_LEAD_N = 5


def leading_tokens_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: int, tok: string")
    class LeadingTokens:
        def eval(self, doc_id, text: str):
            # Java-\s whitespace class ([ \t\n\v\f\r]), NOT str.split():
            # Python's split also breaks on Unicode whitespace (U+00A0,
            # U+2028, ...), which the repo's Spark-side \s+ tokenizer
            # convention does not — a corpus containing any would
            # silently diverge.  (RE2's \s, the DuckDB oracle side,
            # additionally excludes \v — a corpus-absent residual
            # divergence shared by every \s+ oracle in the repo, not
            # introduced here.)
            import re

            toks = (t for t in re.split(r"[ \t\n\r\f\v]+", text) if t)
            for i, t in enumerate(toks):
                if i >= UDTF_LEAD_N:
                    break
                yield (doc_id, i, t)

    return LeadingTokens


def q120_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("leading_tokens", leading_tokens_udtf())
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__q120_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.tok "
        "FROM __q120_docs d, LATERAL leading_tokens(d.doc_id, d.text) t"
    )


ORACLE_Q120 = rf"""
WITH d AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
    FROM documents
)
SELECT doc_id, i - 1 AS pos, toks[i] AS tok
FROM d, UNNEST(range(1, least(len(toks), {UDTF_LEAD_N}) + 1)) AS t(i)
"""


# ---------------------------------------------------------------------------
# q129 — mapInArrow: the LOWEST-overhead Python escape hatch, completing
# the Python-eval ladder (scalar pandas UDF q63 -> applyInPandas q64 ->
# cogroup q119 -> UDTF q120 -> raw Arrow here).  The function receives
# pyarrow RecordBatches and computes with pyarrow.compute kernels
# (vectorized C++), skipping even the Arrow<->pandas conversion that
# every pandas UDF pays — the right tier for byte/string-heavy per-row
# transforms (the multimodal decode path's natural habitat).
#
# Token counting uses count_substring_regex(r"\S+"), NOT
# utf8_split_whitespace: the split kernel emits empty strings for
# leading/trailing/doubled whitespace, which would diverge from the
# repo's \s+/drop-empties tokenizer convention.
# ---------------------------------------------------------------------------
def q129_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            t = b.column(b.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.utf8_length(t).cast(pa.int32()),
                    pc.count_substring_regex(t, r"\S+").cast(pa.int32()),
                    pc.count_substring_regex(t, r"\s").cast(pa.int32()),
                ],
                names=["doc_id", "n_chars", "n_tokens", "n_ws_chars"],
            )

    return docs.mapInArrow(
        stats, "doc_id long, n_chars int, n_tokens int, n_ws_chars int"
    )


ORACLE_Q129 = r"""
SELECT doc_id,
       CAST(LENGTH(text) AS INT) AS n_chars,
       CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS INT) AS n_tokens,
       CAST(LENGTH(text) - LENGTH(regexp_replace(text, '\s', '', 'g')) AS INT) AS n_ws_chars
FROM documents
"""


QUERIES = {
    "q63_pandas_udf_scalar": q63_pandas_udf_scalar,
    "q64_apply_in_pandas": q64_apply_in_pandas,
    "q100_pandas_udaf": q100_pandas_udaf,
    "q119_cogroup_asof": q119_cogroup_asof,
    "q120_python_udtf": q120_python_udtf,
    "q129_map_in_arrow": q129_map_in_arrow,
}

ORACLE = {
    "q63_pandas_udf_scalar": ORACLE_Q63,
    "q64_apply_in_pandas": ORACLE_Q64,
    "q100_pandas_udaf": ORACLE_Q100,
    "q119_cogroup_asof": ORACLE_Q119,
    "q120_python_udtf": ORACLE_Q120,
    "q129_map_in_arrow": ORACLE_Q129,
}
