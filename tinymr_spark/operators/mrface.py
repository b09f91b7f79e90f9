"""Queries executed through the tinymr-compatible MapReduce face — proving
the parity API produces DuckDB-verifiable results on the driver testdata.

This is the reference's flagship word count (/root/reference/docs.rst:137-159)
run as a `tinymr_spark.MapReduce` task over a distributed RDD of document
texts, with the result dict lifted back into a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinymr_spark.mapreduce import MapReduce
from tinymr_spark.sources import load_table


class _WordCount(MapReduce):
    """Reference docs.rst:137-159 word count, unchanged user code —
    plus the engine's map-side combine (sum is associative), so the
    shuffle moves per-key partials instead of every (word, 1) pair."""

    combine = True

    def mapper(self, item):
        for word in item.split():
            yield (word, 1)

    def reducer(self, key, values):
        return (key, sum(values))


class _DistinctPerKey(MapReduce):
    """Reference docs.rst:396-407 idiom: distinct count per key."""

    def mapper(self, item):
        lang, source = item
        yield (lang, source)

    def reducer(self, key, values):
        return (key, len(set(values)))


def q80_mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select("text").rdd.map(lambda r: r[0])
    # Scale path: the result RDD becomes a DataFrame without ever touching
    # the driver (``__call__`` would collect the dict — fine for the parity
    # adapter, wrong at 100 TB).
    counts = _WordCount().to_rdd(lines, spark=spark)
    return spark.createDataFrame(
        counts.map(lambda kv: (kv[0], int(kv[1]))), schema="word string, n bigint"
    )


ORACLE_Q80 = r"""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
"""


def q81_mr_distinct_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select("lang", "source").rdd.map(lambda r: (r[0], r[1]))
    result = _DistinctPerKey().to_rdd(pairs, spark=spark)
    return spark.createDataFrame(
        result.map(lambda kv: (kv[0], int(kv[1]))),
        schema="lang string, n_sources bigint",
    )


ORACLE_Q81 = """
SELECT lang, COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
"""


def q82_mr_chain_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapReduce face composed INTO the DataFrame face: the reference word
    count runs as user MR code, `to_df()` lifts the distributed result
    into a DataFrame (no driver materialization), and declarative
    operators take over — the two-face contract SURVEY.md §7 promises
    (filter + projection here; any join/window/sink works the same)."""
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select("text").rdd.map(lambda r: r[0])
    counts = _WordCount().to_df(lines, spark=spark, key_type="string", value_type="bigint")
    return (
        counts.where(F.col("value") >= 50)
        .select(
            F.col("key").alias("word"),
            F.col("value").alias("n"),
            F.length("key").alias("word_len"),
        )
    )


ORACLE_Q82 = r"""
SELECT word, COUNT(*) AS n, CAST(LENGTH(word) AS INT) AS word_len
FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
HAVING COUNT(*) >= 50
"""


class _OverloadedCombine(MapReduce):
    """The reference docs' manual map-side-combine idiom VERBATIM
    (/root/reference/docs.rst:199-283): pre-aggregate each input item
    into a Counter, overload every record onto key ``None`` so one
    reducer merges the partials.  The docs themselves warn the single
    key serializes the reduce — the engine-automated alternative is
    ``combine = True`` (q80); this query proves the documented user
    pattern still runs unchanged, distributed."""

    def mapper(self, item):
        from collections import Counter

        yield None, Counter(item.split())

    def reducer(self, key, values):
        from functools import reduce
        from operator import add

        return key, reduce(add, values)


def q84_mr_overloaded_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select("text").rdd.map(lambda r: r[0])
    merged = _OverloadedCombine().to_rdd(lines, spark=spark)
    rows = merged.flatMap(lambda kv: [(w, int(n)) for w, n in kv[1].items()])
    return spark.createDataFrame(rows, schema="word string, n bigint")


ORACLE_Q84 = r"""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
"""


class _EarliestPerType(MapReduce):
    """Secondary sort in anger: 3-tuple mapper output (key, sort, value)
    triggers the engine's within-key ordering (reference docs.rst:300-307
    sort matrix); ``sort_map_with_value`` adds the value as tie-breaker so
    the result is total-ordered and engine-independent.  The reducer just
    takes the first K — "earliest K events per type" with ZERO sorting in
    user code, exactly how the reference's users exploit the sort stage."""

    sort_map_with_value = True
    K = 3

    def mapper(self, item):
        event_type, ts_us, event_id = item
        yield (event_type, ts_us, event_id)

    def reducer(self, key, values):
        return (key, list(values)[: self.K])


def q83_mr_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed secondary sort through the MapReduce face.  The sort
    key is integer microseconds (the engine compares Python values — µs
    ints sidestep the parquet-NANOS-vs-µs divergence; the oracle orders
    by epoch_ns // 1000 for the same reason)."""
    ev = load_table(spark, sf_dir, "events")
    triples = ev.select(
        "event_type",
        (F.unix_micros("ts")).alias("ts_us"),
        "event_id",
    ).rdd.map(lambda r: (r[0], int(r[1]), int(r[2])))
    result = _EarliestPerType().to_rdd(triples, spark=spark)
    rows = result.flatMap(
        lambda kv: [
            (kv[0], rank + 1, int(event_id))
            for rank, event_id in enumerate(kv[1])
        ]
    )
    return spark.createDataFrame(
        rows, schema="event_type string, rank int, event_id bigint"
    )


ORACLE_Q83 = f"""
SELECT event_type, CAST(rn AS INT) AS rank, event_id
FROM (
    SELECT event_type, event_id,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY epoch_ns(ts) // 1000, event_id) AS rn
    FROM events
)
WHERE rn <= {_EarliestPerType.K}
"""


QUERIES = {
    "q80_mr_wordcount": q80_mr_wordcount,
    "q81_mr_distinct_sources": q81_mr_distinct_sources,
    "q82_mr_chain_relational": q82_mr_chain_relational,
    "q83_mr_secondary_sort": q83_mr_secondary_sort,
    "q84_mr_overloaded_combine": q84_mr_overloaded_combine,
}

ORACLE = {
    "q80_mr_wordcount": ORACLE_Q80,
    "q81_mr_distinct_sources": ORACLE_Q81,
    "q82_mr_chain_relational": ORACLE_Q82,
    "q83_mr_secondary_sort": ORACLE_Q83,
    "q84_mr_overloaded_combine": ORACLE_Q84,
}
