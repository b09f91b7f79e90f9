"""API-contract tests for tinymr_spark.MapReduce.

Covers the reference's tested surface (SURVEY.md §5): the four
yield/return API styles checked against an independent Counter oracle
(reference pattern: tests/test_mapreduce_concurrency.py), the output()
hook, key-collision first-wins semantics, first-encounter output
ordering, None keys, and empty input (documented deviation).
"""

from __future__ import annotations

from collections import Counter

import pytest

from tinymr_spark import ElementCountError, MapReduce


@pytest.fixture(autouse=True)
def _force_distributed(monkeypatch):
    """These modules pin the DISTRIBUTED lowering's semantics; disable the
    small-input local fast path so tiny fixtures still exercise it (the
    local path is differentially fuzzed in test_differential_reference)."""
    monkeypatch.setattr(MapReduce, "local_threshold", 0)

TEXT = [
    "word count is the flagship query",
    "the count of each word is the answer",
    "word word count",
]


def expected_counts():
    c = Counter()
    for line in TEXT:
        c.update(line.split())
    return dict(c)


class WCYieldYield(MapReduce):
    def mapper(self, item):
        for w in item.split():
            yield (w, 1)

    def reducer(self, key, values):
        yield (key, sum(values))

    def output(self, mapping):
        return {k: v[0] for k, v in mapping.items()}


class WCYieldReturn(MapReduce):
    def mapper(self, item):
        for w in item.split():
            yield (w, 1)

    def reducer(self, key, values):
        return (key, sum(values))


class WCReturnYield(MapReduce):
    def mapper(self, item):
        return (item, len(item.split()))

    def reducer(self, key, values):
        yield (key, sum(values))

    def output(self, mapping):
        return {k: v[0] for k, v in mapping.items()}


class WCReturnReturn(MapReduce):
    def mapper(self, item):
        return (item, len(item.split()))

    def reducer(self, key, values):
        return (key, sum(values))


@pytest.mark.parametrize("cls", [WCYieldYield, WCYieldReturn])
def test_word_count_yield_mapper(spark, cls):
    assert cls()(TEXT) == expected_counts()


@pytest.mark.parametrize("cls", [WCReturnYield, WCReturnReturn])
def test_word_count_return_mapper(spark, cls):
    # return-style mapper emits exactly one tuple per item (key = the line).
    expected = {line: len(line.split()) for line in TEXT}
    assert cls()(TEXT) == expected


def test_pool_kwargs_accepted(spark):
    # Reference signature compatibility: map/mapper_map/reducer_map
    # (/root/reference/tinymr.py:156) accepted; results identical.
    result = WCYieldReturn()(TEXT, map=map, mapper_map=map, reducer_map=map)
    assert result == expected_counts()


def test_pool_callables_are_live(spark):
    """An explicitly passed pool is the execution engine on sequence
    inputs: the user's callables actually carry the phases (the
    reference's live-pool contract, /root/reference/tinymr.py:184-211),
    so side effects like call metering happen."""
    calls = {"mapper": 0, "reducer": 0}

    def metered(phase):
        def pool_map(fn, iterable):
            out = []
            for x in iterable:
                calls[phase] += 1
                out.append(fn(x))
            return out
        return pool_map

    result = WCYieldReturn()(
        TEXT, mapper_map=metered("mapper"), reducer_map=metered("reducer")
    )
    assert result == expected_counts()
    assert calls["mapper"] == len(TEXT)  # one pooled call per input item
    assert calls["reducer"] == len(expected_counts())  # one per key


def test_pool_with_process_executor(spark):
    """The serialization wrappers must survive a real process pool —
    generator phases are expanded module-level exactly like the
    reference's _wrap_mapper/_wrap_reducer (tinymr.py:233-269)."""
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(2) as pool:
        result = WCYieldYield()(TEXT, mapper_map=pool.map, reducer_map=pool.map)
    assert result == expected_counts()


def test_pool_ignored_on_rdd_input(spark):
    # On RDD inputs Spark supplies the parallelism; pools are accepted
    # for signature compatibility but not invoked.
    rdd = spark.sparkContext.parallelize(TEXT, 2)

    def never_called(fn, iterable):  # pragma: no cover - must not run
        raise AssertionError("pool must not be used on RDD input")

    result = WCYieldReturn()(rdd, mapper_map=never_called, reducer_map=never_called)
    assert result == expected_counts()


def test_rdd_input(spark):
    rdd = spark.sparkContext.parallelize(TEXT, 3)
    assert WCYieldYield()(rdd) == expected_counts()


def test_empty_input_returns_empty_output(spark):
    # Documented deviation from the reference (which leaks StopIteration).
    assert WCYieldYield()([]) == {}


def test_empty_generator_input(spark):
    assert WCYieldYield()(iter([])) == {}


class NoneKeyCombine(MapReduce):
    """Key-overloading combine idiom (reference docs.rst:199-283)."""

    def mapper(self, item):
        yield (None, Counter(item.split()))

    def reducer(self, key, values):
        total = Counter()
        for c in values:
            total.update(c)
        return (key, total)

    def output(self, mapping):
        return mapping[None]


def test_none_key_map_side_combine(spark):
    assert dict(NoneKeyCombine()(TEXT)) == expected_counts()


class FirstWins(MapReduce):
    """Return-style reducer + colliding output keys: the first value by
    sort order survives (/root/reference/tinymr.py:223-227)."""

    def mapper(self, item):
        yield item

    def reducer(self, key, values):
        return ("all", (values[0], key))

    @property
    def sort_reduce_with_value(self):
        return True


def test_return_reducer_collision_first_wins(spark):
    data = [("b", 1), ("a", 2), ("c", 3)]
    # All reducer outputs collide on key "all"; with sort_reduce_with_value
    # the colliding values are sorted ascending and the smallest survives.
    result = FirstWins()(data)
    assert result == {"all": (1, "b")}


class PassThrough(MapReduce):
    def mapper(self, item):
        yield item

    def reducer(self, key, values):
        yield (key, values)


def test_output_key_first_encounter_order(spark):
    data = [("z", 1), ("m", 2), ("z", 3), ("a", 4), ("m", 5)]
    result = PassThrough()(data)
    assert list(result.keys()) == ["z", "m", "a"]
    assert result["z"] == [[1, 3]]


def test_reducer_yielding_nothing(spark):
    class Silent(MapReduce):
        def mapper(self, item):
            yield item

        def reducer(self, key, values):
            if False:
                yield None

    assert Silent()([("a", 1)]) == {}


class ContextTask(MapReduce):
    """Context-manager task (reference docs.rst:188-195)."""

    def __init__(self):
        self.closed = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.closed = True

    def mapper(self, item):
        yield (item % 2, item)

    def reducer(self, key, values):
        return (key, sum(values))


def test_context_manager_task(spark):
    with ContextTask() as task:
        result = task(range(10))
    assert task.closed
    assert result == {0: 20, 1: 25}


class NonGenReturningIterator(MapReduce):
    """A non-generator mapper returning an iterator is NOT flattened —
    style detection is on the function (/root/reference/tinymr.py:186,198).
    The returned list-of-2 is treated as one 2-element record."""

    def mapper(self, item):
        return [item, item]

    def reducer(self, key, values):
        return (key, len(values))


def test_style_detection_is_on_function_not_value(spark):
    result = NonGenReturningIterator()(["x", "y"])
    assert result == {"x": 1, "y": 1}


def test_strict_empty_raises_stop_iteration_like_reference(spark):
    """Opt-in exact parity with /root/reference/tinymr.py:301-303: the
    reference's first-record peek leaks StopIteration on an empty mapped
    or reduced stream.  Covers all three execution paths (empty list,
    local fast path whose mapper emits nothing, distributed RDD)."""
    import pytest

    class StrictWC(WCYieldYield):
        strict_empty = True

    with pytest.raises(StopIteration):
        StrictWC()([])
    with pytest.raises(StopIteration):
        StrictWC()(iter([]))

    class StrictDropAll(MapReduce):
        strict_empty = True

        def mapper(self, item):
            # generator that yields nothing: the mapped stream is empty
            return
            yield

        def reducer(self, key, values):
            yield key, values

    # yield-style mapper emitting nothing: local fast path...
    with pytest.raises(StopIteration):
        StrictDropAll()(["a", "b"])
    # ...and the distributed path (RDD input bypasses the local gate)
    with pytest.raises(StopIteration):
        StrictDropAll()(spark.sparkContext.parallelize(["a", "b"], 2))

    # default mode is unchanged
    assert WCYieldYield()([]) == {}
