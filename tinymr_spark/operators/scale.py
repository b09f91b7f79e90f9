"""Scale patterns: the shuffle-discipline utilities a 100 TB deployment
needs — key salting for skewed aggregations and bucketed table layout for
co-located (exchange-free) joins.

These are engine API, not queries: they parameterize HOW other operators
execute.  tests/test_scale_patterns.py proves the salted aggregate is
result-identical to the direct one and that bucketed joins plan without
exchanges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys.

    Stage 1 groups by (key, random salt) so a hot key's rows spread over
    ``n_salts`` reducers; stage 2 merges the partials by key.  ``aggs`` is
    a list of (agg_fn, column, alias) with agg_fn in {sum, count, min,
    max} — the merge of each is itself (count merges with sum).

    AQE's skew handling covers sort-merge JOINS; skewed AGGREGATES still
    need salting because a hash aggregate sends every row of a key to one
    reducer.
    """
    mergers = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for fn, _, _ in aggs:
        if fn not in mergers:
            raise ValueError(f"unsupported agg for salting: {fn}")

    salted = df.withColumn("_salt", (F.rand(seed=0) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        *[getattr(F, fn)(col).alias(alias) for fn, col, alias in aggs]
    )
    return partial.groupBy(key).agg(
        *[getattr(F, mergers[fn])(alias).alias(alias) for fn, _, alias in aggs]
    )


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int, path: str
) -> None:
    """Persist a table bucketed (and sorted) by its join key.  Two tables
    bucketed the same way join WITHOUT any exchange — at 100 TB this turns
    every recurring fact-fact join into a zip of co-located buckets."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )


def hash_repartition(df: DataFrame, cols: list[str], n: int) -> DataFrame:
    """Explicit hash partitioning — pre-shuffle once, reuse across several
    downstream keyed operations on the same key."""
    return df.repartition(n, *[F.col(c) for c in cols])


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Persist hive-style directory-partitioned parquet
    (``path/col=value/...``).

    Partition pruning is the coarsest and cheapest data-skipping layer at
    100 TB: a filter on a partition column never LISTS the other
    directories, let alone reads them — it shows up in the scan as
    ``PartitionFilters`` (asserted by tests/test_scale_patterns.py).
    Choose low-cardinality columns that dominate query predicates (date,
    region, language); high-cardinality partitioning creates a
    small-files problem instead.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
