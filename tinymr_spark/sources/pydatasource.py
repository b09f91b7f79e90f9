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
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
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

    def streamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    """Batch reader with NATIVE filter pushdown (Spark 4.1
    `pushFilters`): a generator source can invert its own row->value
    mapping, so pushed predicates shrink GENERATION, not just
    post-scan rows — `row_id` bounds narrow the rid range each
    partition walks, and `kind` equality/IN skips non-matching rids by
    modulus before building the row (kind is rid % len(EVENT_KINDS) by
    construction).  This is the same contract a database or API source
    implements, demonstrated on a source whose pushdown is exactly
    verifiable; everything else (user_id math, amount ranges) is
    returned to Spark unhandled, as the API requires.  Accepted filters
    mutate self before partitions()/read() are called — the documented
    lifecycle."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.rid_lo = 0
        self.rid_hi = self.n_rows
        self.kinds: frozenset | None = None  # None = all kinds

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)) and f.attribute == ("row_id",):
                self.rid_lo = max(
                    self.rid_lo,
                    f.value + 1 if isinstance(f, GreaterThan) else f.value,
                )
            elif isinstance(f, (LessThan, LessThanOrEqual)) and f.attribute == ("row_id",):
                self.rid_hi = min(
                    self.rid_hi,
                    f.value if isinstance(f, LessThan) else f.value + 1,
                )
            elif isinstance(f, EqualTo) and f.attribute == ("kind",):
                self._narrow_kinds(frozenset([f.value]))
            elif isinstance(f, In) and f.attribute == ("kind",):
                self._narrow_kinds(frozenset(f.value))
            else:
                yield f  # not natively evaluable: Spark keeps it

    def _narrow_kinds(self, new: frozenset) -> None:
        # INTERSECT, never overwrite: pushed filters are a conjunction,
        # and Catalyst does not fold `kind = 'x' AND kind IN (...)` into
        # one predicate — accepting both while keeping only the last
        # would silently widen the result (two contradictory EqualTo
        # must yield the empty set).
        self.kinds = new if self.kinds is None else self.kinds & new

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        # Striped assignment: row ids i, i+P, i+2P, ... — every id appears
        # exactly once regardless of P, so the TABLE is partition-count
        # independent (asserted in tests/test_sources_sinks.py).
        kind_mods = (
            None
            if self.kinds is None
            else {i for i, k in enumerate(EVENT_KINDS) if k in self.kinds}
        )
        start = self.rid_lo + (partition.value - self.rid_lo) % self.n_parts
        for rid in range(start, self.rid_hi, self.n_parts):
            if kind_mods is None or rid % len(EVENT_KINDS) in kind_mods:
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


class RangePartition(InputPartition):
    """One contiguous slice of the offset range; pickled to an executor,
    where `read()` regenerates exactly the rows [start, end)."""

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """The STREAMING face of the same format — the full partition-planning
    `DataSourceStreamReader`, NOT the driver-side-prefetch
    `SimpleDataSourceStreamReader`.  The split of responsibilities is the
    one that survives scale-up: only OFFSET BOOKKEEPING runs on the
    driver (`latestOffset` advances a row position by at most `chunk`
    per micro-batch — admission control), while the DATA path is
    `partitions(start, end)` striping each micro-batch's offset range
    into up to `partitions` contiguous slices that executors read
    independently via `read(partition)`.  No streamed byte ever passes
    through the driver, mirroring the batch reader above.

    Replay/recovery contract: a micro-batch is DEFINED by its
    (start, end] offset pair, and `partitions`/`read` are pure functions
    of those offsets, so any committed range replans to the identical
    rows after restart — the property checkpoint recovery depends on
    (asserted in tests/test_sources_sinks.py).  `latestOffset` state is
    only a high-water mark; `partitions()` fast-forwards it past
    already-committed ranges on restart, so a recovered query never
    re-announces data behind its checkpoint.

    The generator is the same pure function of row id as the batch
    reader, so a drained stream equals the batch table and the q136
    oracle hash-checks the whole streaming path — offset management,
    micro-batch planning, executor-side reads — against a SQL row
    sequence."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.chunk = int(options.get("chunk", 250))
        self.n_parts = int(options.get("partitions", 8))
        self._pos = 0  # driver-side high-water mark (announced offset)

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        # Admission control: announce at most `chunk` new rows per
        # micro-batch.  Offsets stop advancing at n_rows, so
        # processAllAvailable() drains and returns.
        self._pos = min(self._pos + self.chunk, self.n_rows)
        return {"i": self._pos}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["i"]), int(end["i"])
        # Restart fast-forward: a fresh reader instance must never
        # announce offsets behind any range it has SEEN — including the
        # committed START offset Spark passes after recovery (max over
        # lo as well as hi, so even a degenerate backwards range planned
        # from a stale first latestOffset() answer snaps the high-water
        # mark to the checkpoint).  Engine-level restart semantics
        # (no duplicates, no loss, across restarts with and without new
        # data) are integration-tested in tests/test_sources_sinks.py.
        self._pos = max(self._pos, lo, hi)
        n = hi - lo
        if n <= 0:
            return [RangePartition(lo, lo)]
        k = min(self.n_parts, n)
        step = -(-n // k)  # ceil
        return [
            RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: RangePartition):
        # EXECUTOR-side: regenerate this slice's rows locally.
        for rid in range(partition.start, partition.end):
            yield _event_row(rid)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: reads are pure functions of offsets


def register(spark) -> None:
    """Idempotent per-session registration of the custom format.  Also
    enables the Python-source pushdown flag: a reader implementing
    pushFilters() refuses to plan while it is off, so for a session this
    package did not create (the driver's, a user's) the flag must ride
    along with registration."""
    if getattr(spark, "_tinymr_pyds_registered", False):
        return
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    spark._tinymr_pyds_registered = True
