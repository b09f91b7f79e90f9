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


# ---------------------------------------------------------------------------
# q105 — small-files compaction: the standing maintenance job of any
# long-lived 100 TB lake.  Streaming sinks and fine partitioning leave
# thousands of KB-scale files; each costs a listing entry, a footer
# read, and a scheduler task.  The compactor rewrites a directory into
# ceil(bytes / target) files.  The query stages a deliberately
# fragmented copy of `documents` (64 files), compacts it, and returns
# per-source content stats FROM THE COMPACTED OUTPUT — the oracle checks
# the whole round trip preserved every row and byte of content, while
# tests/test_scale_patterns.py asserts the file count actually dropped.
# (No reference counterpart: the reference has no storage layer at all,
# /root/reference/tinymr.py.)
# ---------------------------------------------------------------------------
COMPACT_TARGET_BYTES = 32 * 1024 * 1024
_FRAGMENT_FILES = 64


def compact_parquet(spark, src_dir: str, dst_dir: str,
                    target_bytes: int = COMPACT_TARGET_BYTES) -> int:
    """Rewrite ``src_dir`` into ``dst_dir`` with ceil(bytes/target)
    files; returns the output file count.  One narrow read + one
    round-robin repartition write — no keyed shuffle."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_dir).repartition(n_out).write.mode(
        "overwrite"
    ).parquet(dst_dir)
    return n_out


def q105_compact_small_files(spark, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from tinymr_spark.sources import load_table

    base = os.path.join(
        tempfile.gettempdir(),
        "tinymr_spark_compact",
        hashlib.md5(sf_dir.encode()).hexdigest(),
    )
    small, compacted = os.path.join(base, "small"), os.path.join(base, "compact")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(_FRAGMENT_FILES).write.mode("overwrite").parquet(small)
    compact_parquet(spark, small, compacted)
    return (
        spark.read.parquet(compacted)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum(F.length("text")).cast("bigint").alias("sum_text_len"),
        )
    )


ORACLE_Q105 = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
FROM documents
GROUP BY source
"""


QUERIES = {
    "q105_compact_small_files": q105_compact_small_files,
}

ORACLE = {
    "q105_compact_small_files": ORACLE_Q105,
}
