"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`): the
extensibility half of the source surface — `spark.read.format(<name>)`
backed by plain Python, partition-parallel, no JVM code.

The reference's only "source" is an in-memory Python sequence
(/root/reference/tinymr.py:156-230); this is the Spark-native analog of
bringing your own generator, done as a first-class format: the engine
asks the reader for partitions, ships each to an executor, and the rows
enter the same DataFrame pipeline as any parquet scan.

The shipped source is `synthevents`, a DETERMINISTIC synthetic event
generator: every row is a pure function of its row id (multiplicative
hashing, integer cents — no RNG, no clock), so the same options produce
the same table on any partition count, and a SQL engine can reproduce it
from a row-number sequence — which is exactly how the q121 oracle checks
the source end to end.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_KINDS = ("view", "click", "purchase", "signup", "error")
USER_MOD = 1_000
AMOUNT_MOD = 10_000
HASH_MULT = 2_654_435_761  # Knuth multiplicative hash constant


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthevents").option("rows", N)
    .option("partitions", P)` — N rows striped over P input partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthevents"

    def schema(self) -> str:
        return "row_id bigint, user_id bigint, kind string, amount_cents bigint"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        # Striped assignment: row ids i, i+P, i+2P, ... — every id appears
        # exactly once regardless of P, so the TABLE is partition-count
        # independent (asserted in tests/test_sources_sinks.py).
        start = partition.value
        for rid in range(start, self.n_rows, self.n_parts):
            yield (
                rid,
                (rid * HASH_MULT) % USER_MOD,
                EVENT_KINDS[rid % len(EVENT_KINDS)],
                (rid * 97) % AMOUNT_MOD,
            )


def register(spark) -> None:
    """Idempotent per-session registration of the custom format."""
    if getattr(spark, "_tinymr_pyds_registered", False):
        return
    spark.dataSource.register(SyntheticEventsDataSource)
    spark._tinymr_pyds_registered = True
