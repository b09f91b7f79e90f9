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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


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
            yield _event_row(rid)


def _event_row(rid: int) -> tuple:
    """One deterministic row — shared by the batch and stream readers so
    both faces of the format produce the identical table."""
    return (
        rid,
        (rid * HASH_MULT) % USER_MOD,
        EVENT_KINDS[rid % len(EVENT_KINDS)],
        (rid * 97) % AMOUNT_MOD,
    )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """The STREAMING face of the same format (Spark 4 Python streaming
    data source): offsets are plain row positions, each micro-batch
    emits the next `chunk` rows, and `readBetweenOffsets` replays any
    committed range exactly — the replayability contract checkpoint
    recovery depends on.  The generator is the same pure function of
    row id as the batch reader, so a drained stream equals the batch
    table and the q136 oracle can hash-check the whole streaming path
    (offset management, micro-batching, recovery API) against a SQL row
    sequence."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.chunk = int(options.get("chunk", 250))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i = int(start["i"])
        end = min(i + self.chunk, self.n_rows)
        return iter([_event_row(r) for r in range(i, end)]), {"i": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_event_row(r) for r in range(int(start["i"]), int(end["i"]))])


def register(spark) -> None:
    """Idempotent per-session registration of the custom format."""
    if getattr(spark, "_tinymr_pyds_registered", False):
        return
    spark.dataSource.register(SyntheticEventsDataSource)
    spark._tinymr_pyds_registered = True
