"""Relational operator surface (SURVEY.md §2.4 gaps — none of these exist
in the reference; users hand-wrote them inside mapper/reducer, e.g. sums at
/root/reference/docs.rst:147-148).  All pure DataFrame API so Catalyst owns
pushdown/pruning/join planning; broadcast hints on dimension tables.

Float discipline for oracle parity: aggregate results are ROUNDed in BOTH
the Spark plan and the DuckDB SQL; group keys are exact types.  Every
computed column is aliased identically on both sides (driver hash compares
by sorted column name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinymr_spark.sources import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape): scan + filter + hash aggregate.
# Catalyst plans a partial (map-side) aggregate before the shuffle — the
# built-in version of the reference's manual combine idiom
# (/root/reference/docs.rst:199-283).
# ---------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_Q01 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
       ROUND(AVG(l_discount), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — filter + projection: pushdown/pruning demo (scan should read only
# 4 of 11 lineitem columns and carry PushedFilters).
# ---------------------------------------------------------------------------
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_quantity") >= 45)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_returnflag") == "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.year("l_shipdate").alias("ship_year"),
        )
    )


ORACLE_Q02 = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       CAST(EXTRACT(year FROM l_shipdate) AS INT)   AS ship_year
FROM lineitem
WHERE l_quantity >= 45 AND l_discount >= 0.05 AND l_returnflag = 'R'
"""


# ---------------------------------------------------------------------------
# q03 — broadcast hash join: lineitem (fact) x part (dim).  part is tiny at
# every SF relative to lineitem; broadcast() pins the strategy so no shuffle
# of the fact side happens — at 100 TB this is the difference between a
# map-side join and a full exchange.
# ---------------------------------------------------------------------------
def q03_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


ORACLE_Q03 = """
SELECT p_brand,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# q04 — multi-way star join (TPC-H Q5 shape): region->nation->customer->
# orders->lineitem.  Dims broadcast; the only big-big join (orders x
# lineitem) shuffles on the join key once.
# ---------------------------------------------------------------------------
def q04_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # region filter applied BEFORE the dim join (smaller build side by
    # construction, not just after Catalyst pushdown); nation/region are
    # fixed-size true dims — broadcast hints are correct there — but
    # dims derives from CUSTOMER, which scales with the data: a forced
    # broadcast would ship an unbounded side at 100 TB (r13 — the 25x
    # probe flagged the hint), so AQE picks the strategy from runtime
    # size instead.
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.where(F.col("r_name").isin("AMERICA", "ASIA"))),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


ORACLE_Q04 = """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('AMERICA', 'ASIA')
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# q05/q06 — semi and anti joins.
# ---------------------------------------------------------------------------
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 400000)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ORACLE_Q05 = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


ORACLE_Q06 = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


# ---------------------------------------------------------------------------
# q07 — global top-k (reference idiom I2, Counter.most_common):
# orderBy + limit lowers to TakeOrderedAndProject — no global sort of all
# partitions, each partition contributes its local top-k.
# ---------------------------------------------------------------------------
def q07_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


ORACLE_Q07 = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q08 — ranking window: top-3 orders per customer.  The reference's nearest
# concept is per-key secondary sort (tinymr.py:310-330); this is the
# first-class version.
# ---------------------------------------------------------------------------
def q08_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


ORACLE_Q08 = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
      FROM orders)
WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# q09 — analytic window with frame: running revenue per customer.
# ---------------------------------------------------------------------------
def q09_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lagw = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.round(F.lag("o_totalprice", 1).over(lagw), 2).alias("prev_price"),
    )


ORACLE_Q09 = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       ROUND(LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC), 2) AS prev_price
FROM orders
"""


# ---------------------------------------------------------------------------
# q10/q11/q12 — rollup / cube / grouping sets.
# ---------------------------------------------------------------------------
def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


ORACLE_Q10 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.avg("o_totalprice"), 2).alias("avg_price"), F.count("*").alias("n"))
    )


ORACLE_Q11 = """
SELECT o_orderstatus, o_orderpriority,
       ROUND(AVG(o_totalprice), 2) AS avg_price, COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice), 2) AS sum_price
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


ORACLE_Q12 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


# ---------------------------------------------------------------------------
# q13 — distinct aggregate (reference idiom I4: len(set(values)),
# docs.rst:396-397).
# ---------------------------------------------------------------------------
def q13_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


ORACLE_Q13 = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q14 — set operators: union / intersect / except (absent from reference;
# input concatenation was user-side, docs.rst:358).
# ---------------------------------------------------------------------------
def q14_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    machinery = customer.where(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    big_spenders = (
        orders.where(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        building.union(machinery).intersect(big_spenders)
        .unionByName(
            customer.where(F.col("c_acctbal") < -900).select("c_custkey").exceptAll(
                big_spenders
            )
        )
    )


ORACLE_Q14 = """
(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
 UNION ALL
 SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
UNION ALL
(SELECT c_custkey FROM customer WHERE c_acctbal < -900
 EXCEPT ALL
 SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
"""


# ---------------------------------------------------------------------------
# q15 — scalar function library (string/date/math; the reference's
# "function library" is arbitrary Python in user code, docs.rst:143-145).
# ---------------------------------------------------------------------------
def q15_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_brand", 1, 5).alias("brand_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.round(F.sqrt(F.col("p_retailprice")), 4).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 4).alias("price_ln"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
    )


ORACLE_Q15 = """
SELECT p_partkey,
       UPPER(p_name)                     AS name_upper,
       CAST(LENGTH(p_name) AS INT)       AS name_len,
       SUBSTRING(p_brand, 1, 5)          AS brand_prefix,
       CONCAT_WS('/', p_brand, p_type)   AS brand_type,
       ROUND(SQRT(p_retailprice), 4)     AS price_sqrt,
       ROUND(LN(p_retailprice + 1), 4)   AS price_ln,
       CAST(p_size % 7 AS INT)           AS size_mod7,
       CAST(ABS(p_size - 25) AS INT)     AS size_dev
FROM part
"""


# ---------------------------------------------------------------------------
# q16 — CASE / conditional buckets + date functions.
# ---------------------------------------------------------------------------
def q16_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return (
        orders.select(
            bucket.alias("price_bucket"),
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
            "o_totalprice",
        )
        .groupBy("price_bucket", "order_year", "order_quarter")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


ORACLE_Q16 = """
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END                         AS price_bucket,
       CAST(EXTRACT(year FROM o_orderdate) AS INT)    AS order_year,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q17 — statistical aggregates.
# ---------------------------------------------------------------------------
def q17_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("stddev_price"),
        F.round(F.var_samp("l_quantity"), 2).alias("var_qty"),
    )


ORACLE_Q17 = """
SELECT l_linestatus,
       ROUND(MIN(l_extendedprice), 2)    AS min_price,
       ROUND(MAX(l_extendedprice), 2)    AS max_price,
       ROUND(AVG(l_extendedprice), 2)    AS avg_price,
       ROUND(STDDEV_SAMP(l_extendedprice), 2) AS stddev_price,
       ROUND(VAR_SAMP(l_quantity), 2)    AS var_qty
FROM lineitem
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# q18 — correlated EXISTS subquery (orders with a late-shipped item).
# ---------------------------------------------------------------------------
def q18_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    orders.createOrReplaceTempView("_q18_orders")
    li.createOrReplaceTempView("_q18_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM _q18_orders
        WHERE EXISTS (
            SELECT 1 FROM _q18_lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAYS
        )
        GROUP BY o_orderpriority
        """
    )


ORACLE_Q18 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q19 — scalar subquery + HAVING: parts priced above the global average.
# ---------------------------------------------------------------------------
def q19_having_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    part.createOrReplaceTempView("_q19_part")
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_above_avg
        FROM _q19_part
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM _q19_part)
        GROUP BY p_brand
        HAVING COUNT(*) >= 5
        """
    )


ORACLE_Q19 = """
SELECT p_brand, COUNT(*) AS n_above_avg
FROM part
WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
GROUP BY p_brand
HAVING COUNT(*) >= 5
"""


# ---------------------------------------------------------------------------
# q20 — join + aggregation by derived key (avg order value per segment).
# ---------------------------------------------------------------------------
def q20_segment_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    # no broadcast hint: customer SCALES with the data (unlike
    # nation/region) — AQE picks broadcast at small SF from runtime
    # size and degrades to a shuffle join when the side outgrows the
    # threshold, which a pinned hint would prevent at 100 TB (r13,
    # same class as q04's dims hint)
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.avg("o_totalprice"), 2).alias("avg_order_value"),
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


ORACLE_Q20 = """
SELECT c_mktsegment,
       ROUND(AVG(o_totalprice), 2) AS avg_order_value,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""



# ---------------------------------------------------------------------------
# q21 — percentiles / median (exact linear interpolation; matches DuckDB's
# quantile_cont bit-for-bit, verified).
#
# Scale shape (optimization guide §2.3 "aggregate before you shuffle",
# §1.4): Spark's exact `percentile`/`median` aggregate is an
# ObjectHashAggregate whose buffer is a value->count map holding EVERY
# distinct value of the group — every task builds that map, the maps
# themselves cross the exchange, and the 3 final tasks merge + sort them
# single-threaded.  The noop-sink measurement exposed the cost the
# bench's count() path prunes away: 7.1 s at sf0.1 vs 0.16 s counted.
# `exact_group_percentiles` computes the identical interpolation from a
# codegen'd (group, value) count — partial aggregation compresses
# duplicates map-side, the shuffle carries (group, value, count) rows
# hash-spread over ALL reducers, and the per-group cumulative window
# runs over distinct values only.  Same doubles, same formula
# ((hi-pos)*lower + (pos-lo)*upper, Percentile.getPercentile's exact
# shape), verified equal on every SF.
# ---------------------------------------------------------------------------
def exact_group_percentiles(
    df: DataFrame, key: str, col: str, ps: list[tuple[float, str]]
) -> DataFrame:
    """Exact linear-interpolation percentiles per `key` group, one output
    column per (fraction, name) in `ps`, plus `_n_all` (count(*) of the
    group, nulls included — callers needing count(*) reuse it instead of
    a second scan).  NULL measure values are ignored exactly as Spark's
    `percentile` ignores them; an all-NULL group yields NULL.

    Replaces `F.percentile`/`F.median`'s per-task value->count map
    (ObjectHashAggregate, no codegen, whole map shuffled to one task per
    group) with: groupBy(key, value).count()  ->  one exchange of
    distinct values spread over all reducers  ->  per-key cumulative
    window over distinct values  ->  interpolation at the target ranks.
    Bit-identical to Percentile.getPercentile: pos = p * (n_nonnull - 1),
    lo = floor(pos), and (lo + 1 - pos) * v_lo + (pos - lo) * v_hi when
    pos is fractional, v_lo exactly otherwise."""
    from pyspark.sql import Window

    vals = df.groupBy(key, col).agg(F.count(F.lit(1)).alias("_cnt"))
    v = F.col(col).cast("double")
    w_cum = (
        Window.partitionBy(key)
        .orderBy(F.col(col).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key)
    staged = vals.select(
        key,
        v.alias("_v"),
        "_cnt",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(w_all).alias("_n_all"),
        F.sum(F.when(F.col(col).isNull(), F.col("_cnt")).otherwise(F.lit(0)))
        .over(w_all)
        .alias("_nulls"),
    )
    # Non-null rank space: value row covers 0-based sorted positions
    # [_cum - _nulls - _cnt, _cum - _nulls - 1]; nulls sort first and are
    # excluded from the rank space exactly as Percentile drops them.
    nn = F.col("_n_all") - F.col("_nulls")
    lo_end = F.col("_cum") - F.col("_nulls")  # exclusive end of coverage

    def _pick(idx):
        covers = (
            F.col("_v").isNotNull()
            & (idx >= lo_end - F.col("_cnt"))
            & (idx < lo_end)
        )
        return F.max(F.when(covers, F.col("_v")))

    agg_cols = []
    for p, name in ps:
        pos = F.lit(float(p)) * (nn - F.lit(1))
        lo = F.floor(pos)
        agg_cols.append(_pick(lo).alias(f"_vl_{name}"))
        agg_cols.append(_pick(lo + 1).alias(f"_vu_{name}"))
    out = staged.groupBy(key).agg(
        F.max("_n_all").alias("_n_all"),
        (F.max("_n_all") - F.max("_nulls")).alias("_nn"),
        *agg_cols,
    )
    proj = [F.col(key), F.col("_n_all")]
    for p, name in ps:
        pos = F.lit(float(p)) * (F.col("_nn") - F.lit(1))
        lo = F.floor(pos)
        vl, vu = F.col(f"_vl_{name}"), F.col(f"_vu_{name}")
        interp = (lo + 1 - pos) * vl + (pos - lo) * vu
        proj.append(
            F.when(F.col("_nn") == 0, F.lit(None).cast("double"))
            .when(pos == lo.cast("double"), vl)
            .otherwise(interp)
            .alias(name)
        )
    return out.select(*proj)


def q21_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pct = exact_group_percentiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        [(0.25, "p25"), (0.5, "p50"), (0.9, "p90")],
    )
    return pct.select(
        "l_returnflag", "p25", "p50", "p90", F.col("_n_all").alias("n")
    )


ORACLE_Q21 = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5)  AS p50,
       quantile_cont(l_extendedprice, 0.9)  AS p90,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q22 — analytic window battery: lead / ntile / percent_rank / cume_dist /
# first_value over a deterministic ordering.
# ---------------------------------------------------------------------------
def q22_analytics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.where(F.col("o_custkey") < 50).select(
        "o_orderstatus",
        "o_orderkey",
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first_value(F.col("o_orderkey")).over(w).alias("cheapest_orderkey"),
    )


ORACLE_Q22 = """
SELECT o_orderstatus, o_orderkey,
       LEAD(o_orderkey, 1) OVER w             AS next_orderkey,
       CAST(NTILE(4) OVER w AS INT)           AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6)        AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6)           AS cume,
       FIRST_VALUE(o_orderkey) OVER w         AS cheapest_orderkey
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


# ---------------------------------------------------------------------------
# q23 — RANGE-frame windows: running totals over a VALUE range, not a row
# count (all peers with o_totalprice within 1000.0 below the current
# row).  Exercises the range-frame codepath the ROWS-frame queries
# don't.  Sum over a windowed integer column keeps the oracle exact.
# ---------------------------------------------------------------------------
def q23_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, Window.currentRow)
    )
    return orders.where(F.col("o_custkey") < 100).select(
        "o_orderstatus",
        "o_orderkey",
        F.count("*").over(w).alias("n_within_1000"),
        F.sum(F.col("o_orderkey") % 97).over(w).alias("key_mod_sum"),
    )


ORACLE_Q23 = """
SELECT o_orderstatus, o_orderkey,
       COUNT(*) OVER w AS n_within_1000,
       CAST(SUM(o_orderkey % 97) OVER w AS BIGINT) AS key_mod_sum
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# q24 — approximate distinct (HyperLogLog++).  Raw sketch estimates are
# engine-specific, so the query emits the EXACT distinct count plus a
# `within_bound` boolean asserting |approx - exact| <= max(3, 6% of
# exact) — 3 sigma at the sketch's rsd=0.02, plus an absolute floor for
# tiny groups (HLL++ register updates are max-based and so
# deterministic for a fixed dataset regardless of partition order).  The
# DuckDB twin computes the same exact count and literal TRUE — making the
# accuracy contract itself hash-checkable by the driver.  At 100 TB
# approx_count_distinct is the difference between one pass and a full
# distinct shuffle; the exact column here is the verification harness,
# not the production path.
# ---------------------------------------------------------------------------
def q24_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count("*").alias("n_rows"),
    )
    # Bound = 3*rsd relative with a small absolute floor (the contract
    # the accuracy test always used): rsd=0.02 makes 5% only ~2.5 sigma,
    # and a dataset landing in that tail would deterministically fail the
    # gate with no actual bug.  3 sigma + floor keeps the hashed claim
    # honest about what HLL++ guarantees.
    abs_err = F.abs(F.col("approx_parts") - F.col("exact_parts"))
    bound = F.greatest(F.lit(3.0), F.col("exact_parts") * F.lit(0.06))
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "n_rows",
        (abs_err <= bound).alias("within_bound"),
    )


ORACLE_Q24 = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(*) AS n_rows,
       TRUE AS within_bound
FROM lineitem
GROUP BY l_returnflag
"""

# ---------------------------------------------------------------------------
# q25 — higher-order array functions (filter / transform+aggregate /
# array_max / zip_with) over the embedding vectors.  All lambda evaluation
# is JVM-side Catalyst expressions — the idiomatic way to process
# array<float> feature columns without ever leaving the executor, and the
# 100 TB alternative to a per-row Python UDF.  (The reference has no array
# type at all; array work would be hand-written Python inside mapper —
# /root/reference/tinymr.py:39-59.)
# ---------------------------------------------------------------------------
def q25_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l1 = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + F.abs(x)
    )
    dot_self = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(l1, 4).alias("l1"),
        F.round(F.array_max(v), 6).alias("vmax"),
        F.round(dot_self, 4).alias("dot_self"),
    )


ORACLE_Q25 = """
SELECT vec_id,
       CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INT) AS n_pos,
       ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> ABS(x))), 4) AS l1,
       ROUND(list_max(CAST(embedding AS DOUBLE[])), 6) AS vmax,
       ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), 4) AS dot_self
FROM embeddings
"""


# ---------------------------------------------------------------------------
# q26 — salted (two-stage) aggregation over a genuinely skewed key:
# l_returnflag has 3 values over the whole lineitem table, so a plain hash
# aggregate funnels ~200k rows per key into single reducers.  scale.salted_agg
# spreads each key over 16 salts and merges partials; the RESULT is
# value-identical to the direct GROUP BY (the oracle), which is the whole
# point — salting is an execution strategy, not a semantic change.  (AQE
# splits skewed JOIN partitions but not skewed aggregates; salting is the
# 100 TB answer for hot aggregation keys.)
# ---------------------------------------------------------------------------
def q26_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tinymr_spark.operators.scale import salted_agg

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "qty_int", F.col("l_quantity").cast("long")
    )
    return salted_agg(
        li,
        "l_returnflag",
        [
            ("count", "qty_int", "n_rows"),
            ("sum", "qty_int", "sum_qty"),
            ("min", "l_extendedprice", "min_price"),
            ("max", "l_extendedprice", "max_price"),
        ],
        n_salts=16,
    )


ORACLE_Q26 = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q27 — deterministic stratified sampling: keep ~20% of documents per
# language stratum by hashing the doc_id (md5 -> 60-bit int, same portable
# construction as the dedup shingle hash).  Hash-based sampling is the
# training-data-pipeline way to sample: reproducible across runs and
# engines, no RNG state, prunes in the scan (the predicate is a pure
# per-row function), and composable with any downstream operator.
# ---------------------------------------------------------------------------
SAMPLE_MOD = 10
SAMPLE_KEEP = 2  # hash % 10 < 2  -> ~20%


def q27_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return (
        docs.where((h % SAMPLE_MOD) < SAMPLE_KEEP)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


ORACLE_Q27 = f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       MIN(doc_id) AS min_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % {SAMPLE_MOD} < {SAMPLE_KEEP}
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# q28 — FULL OUTER join: nations seen as customer homes vs as supplier
# homes; either side can be absent (low-SF dirs don't cover all 25
# nations on both sides), which is exactly what FULL OUTER preserves and
# semi/inner joins lose.  Both inputs are pre-aggregated to 25 rows, so
# at 100 TB the outer join itself is trivial — the heavy lifting stays in
# the two partial-aggregated groupBys; coalesce() canonicalizes the join
# key and turns absent sides into explicit zeros.
# ---------------------------------------------------------------------------
def q28_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cust.join(supp, cust["c_nationkey"] == supp["s_nationkey"], "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


ORACLE_Q28 = """
WITH cust AS (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1),
     supp AS (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       CAST(COALESCE(n_customers, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(n_suppliers, 0) AS BIGINT) AS n_suppliers
FROM cust FULL OUTER JOIN supp ON c_nationkey = s_nationkey
"""


# ---------------------------------------------------------------------------
# q29 — unpivot (wide -> long): part's numeric attributes melted to
# (metric, value) rows via the built-in unpivot/melt, then aggregated per
# metric.  Unpivot is a narrow per-row transform (no shuffle — each input
# row expands to k output rows in place); only the tiny per-metric
# aggregate exchanges.
# ---------------------------------------------------------------------------
def q29_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    )
    melted = part.unpivot("p_partkey", ["size", "retailprice"], "metric", "value")
    return melted.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


ORACLE_Q29 = """
WITH melted AS (
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice', CAST(p_retailprice AS DOUBLE) FROM part
)
SELECT metric, COUNT(*) AS n, ROUND(SUM(value), 2) AS total,
       MIN(value) AS vmin, MAX(value) AS vmax
FROM melted
GROUP BY metric
"""


# ---------------------------------------------------------------------------
# q85 — the SQL-string surface: the same engine drives ANSI SQL text via
# spark.sql() over registered views (CTE + join + aggregate + window in
# one statement).  The reference has no SQL parser at all (SURVEY.md
# §2.4); here the parser, analyzer and optimizer come with Spark — this
# entry proves the registration + dialect path works end-to-end, and that
# SQL text gets the identical physical treatment (broadcast dim join,
# partial aggregation) as the DataFrame API.
# ---------------------------------------------------------------------------
def q85_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tinymr_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        WITH nation_rev AS (
            SELECT n.n_name AS nation,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        )
        SELECT nation, revenue, n_items,
               CAST(RANK() OVER (ORDER BY revenue DESC) AS INT) AS rev_rank
        FROM nation_rev
    """)


ORACLE_Q85 = """
WITH nation_rev AS (
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
)
SELECT nation, revenue, n_items,
       CAST(RANK() OVER (ORDER BY revenue DESC) AS INT) AS rev_rank
FROM nation_rev
"""


# ---------------------------------------------------------------------------
# q89 — recursive-CTE calendar gap-fill: build a month spine with Spark's
# native WITH RECURSIVE (new in Spark 4), then LEFT JOIN sparse monthly
# aggregates onto it so empty months surface as explicit zeros — the
# missing-period normalization every time-series rollup needs.  The spine
# bounds ride along in the anchor row (no subquery in the recursive
# step), the recursion is linear (one row per month, ~80 iterations, far
# under the default recursion limit), and at 100 TB the plan is ideal:
# the big side pre-aggregates to one row per month BEFORE the join, and
# the ~80-row spine broadcasts.  DuckDB's oracle uses generate_series —
# same spine, independently derived.
# ---------------------------------------------------------------------------
def q89_monthly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tinymr_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        WITH RECURSIVE months(m, mx) AS (
            SELECT date_trunc('MONTH', MIN(o_orderdate)),
                   date_trunc('MONTH', MAX(o_orderdate))
            FROM orders
            UNION ALL
            SELECT add_months(m, 1), mx FROM months WHERE m < mx
        ),
        monthly AS (
            SELECT date_trunc('MONTH', o_orderdate) AS m,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders
            WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 450000
            GROUP BY 1
        )
        SELECT CAST(months.m AS DATE) AS month,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(revenue, 0.0) AS revenue
        FROM months LEFT JOIN monthly ON months.m = monthly.m
    """)


ORACLE_Q89 = """
WITH months AS (
    SELECT unnest(generate_series(date_trunc('month', (SELECT MIN(o_orderdate) FROM orders)),
                                  date_trunc('month', (SELECT MAX(o_orderdate) FROM orders)),
                                  INTERVAL 1 MONTH)) AS m
),
monthly AS (
    SELECT date_trunc('month', o_orderdate) AS m,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 450000
    GROUP BY 1
)
SELECT CAST(months.m AS DATE) AS month,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(revenue, 0.0) AS revenue
FROM months LEFT JOIN monthly ON months.m = monthly.m
"""


# ---------------------------------------------------------------------------
# q139 — SQL-defined functions (Spark 4 `CREATE FUNCTION ... RETURN`):
# reusable user abstractions written IN SQL — a scalar function
# (discounted price) and a TABLE function (a bucket spine) — that
# Catalyst INLINES into the plan: unlike any Python UDF tier, the
# expanded expressions run inside whole-stage codegen at zero calling
# cost, which is why SQL UDFs are the first abstraction a shared 100 TB
# warehouse should reach for.  The table function drives a left join so
# EMPTY quantity buckets surface (the gap-fill idiom, q89's shape), and
# the scalar function feeds the aggregate — the oracle re-expands both
# inline, so the hash gate proves the expansion semantics.
# ---------------------------------------------------------------------------
def q139_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__q139_li")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION __q139_disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION __q139_buckets(maxb INT) "
        "RETURNS TABLE(qty_bucket INT) RETURN SELECT explode(sequence(0, maxb))"
    )
    return spark.sql(
        """
        WITH agg AS (
            -- FLOOR before the INT cast: Spark's double->int cast
            -- truncates toward zero while DuckDB rounds half-to-even,
            -- so a fractional-quantity corpus would silently diverge
            -- without it (the generated corpus is integral-valued, but
            -- the query must not depend on that).
            SELECT CAST(FLOOR(l_quantity) AS INT) div 10 AS qty_bucket,
                   COUNT(*) AS n,
                   ROUND(SUM(__q139_disc_price(l_extendedprice, l_discount)), 2)
                       AS revenue
            FROM __q139_li
            GROUP BY 1
        )
        SELECT b.qty_bucket, COALESCE(a.n, 0) AS n,
               COALESCE(a.revenue, 0.0) AS revenue
        FROM __q139_buckets(5) b LEFT JOIN agg a USING (qty_bucket)
        """
    )


ORACLE_Q139 = """
WITH agg AS (
    SELECT CAST(FLOOR(l_quantity) AS INT) // 10 AS qty_bucket,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY 1
)
SELECT b.qty_bucket, COALESCE(a.n, 0) AS n, COALESCE(a.revenue, 0.0) AS revenue
FROM (SELECT UNNEST(range(0, 6)) AS qty_bucket) b
LEFT JOIN agg a USING (qty_bucket)
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_join_broadcast": q03_join_broadcast,
    "q04_star_join_revenue": q04_star_join_revenue,
    "q05_semi_join": q05_semi_join,
    "q06_anti_join": q06_anti_join,
    "q07_global_topk": q07_global_topk,
    "q08_window_rank": q08_window_rank,
    "q09_window_running_sum": q09_window_running_sum,
    "q10_rollup": q10_rollup,
    "q11_cube": q11_cube,
    "q12_grouping_sets": q12_grouping_sets,
    "q13_distinct_agg": q13_distinct_agg,
    "q14_set_ops": q14_set_ops,
    "q15_scalar_functions": q15_scalar_functions,
    "q16_case_buckets": q16_case_buckets,
    "q17_agg_stats": q17_agg_stats,
    "q18_exists_subquery": q18_exists_subquery,
    "q19_having_scalar_subquery": q19_having_scalar_subquery,
    "q20_segment_order_value": q20_segment_order_value,
    "q21_percentiles": q21_percentiles,
    "q22_analytics_battery": q22_analytics_battery,
    "q23_window_range_frame": q23_window_range_frame,
    "q24_approx_distinct": q24_approx_distinct,
    "q25_array_functions": q25_array_functions,
    "q26_salted_agg": q26_salted_agg,
    "q27_stratified_sample": q27_stratified_sample,
    "q28_full_outer_join": q28_full_outer_join,
    "q29_unpivot": q29_unpivot,
    "q85_sql_interface": q85_sql_interface,
    "q89_monthly_gapfill": q89_monthly_gapfill,
    "q139_sql_udf": q139_sql_udf,
}

ORACLE = {
    "q01_pricing_summary": ORACLE_Q01,
    "q02_filter_project": ORACLE_Q02,
    "q03_join_broadcast": ORACLE_Q03,
    "q04_star_join_revenue": ORACLE_Q04,
    "q05_semi_join": ORACLE_Q05,
    "q06_anti_join": ORACLE_Q06,
    "q07_global_topk": ORACLE_Q07,
    "q08_window_rank": ORACLE_Q08,
    "q09_window_running_sum": ORACLE_Q09,
    "q10_rollup": ORACLE_Q10,
    "q11_cube": ORACLE_Q11,
    "q12_grouping_sets": ORACLE_Q12,
    "q13_distinct_agg": ORACLE_Q13,
    "q14_set_ops": ORACLE_Q14,
    "q15_scalar_functions": ORACLE_Q15,
    "q16_case_buckets": ORACLE_Q16,
    "q17_agg_stats": ORACLE_Q17,
    "q18_exists_subquery": ORACLE_Q18,
    "q19_having_scalar_subquery": ORACLE_Q19,
    "q20_segment_order_value": ORACLE_Q20,
    "q21_percentiles": ORACLE_Q21,
    "q22_analytics_battery": ORACLE_Q22,
    "q23_window_range_frame": ORACLE_Q23,
    "q24_approx_distinct": ORACLE_Q24,
    "q25_array_functions": ORACLE_Q25,
    "q26_salted_agg": ORACLE_Q26,
    "q27_stratified_sample": ORACLE_Q27,
    "q28_full_outer_join": ORACLE_Q28,
    "q29_unpivot": ORACLE_Q29,
    "q85_sql_interface": ORACLE_Q85,
    "q89_monthly_gapfill": ORACLE_Q89,
    "q139_sql_udf": ORACLE_Q139,
}
