"""Map-side combine (combine=True): same results as the uncombined path,
verified against the Counter oracle, plus guard-rail cases where combining
must be silently skipped."""

from __future__ import annotations

from collections import Counter

import pytest

from tinymr_spark import MapReduce


@pytest.fixture(autouse=True)
def _force_distributed(monkeypatch):
    """These modules pin the DISTRIBUTED lowering's semantics; disable the
    small-input local fast path so tiny fixtures still exercise it (the
    local path is differentially fuzzed in test_differential_reference)."""
    monkeypatch.setattr(MapReduce, "local_threshold", 0)

LINES = [f"w{i % 7} w{i % 3} common" for i in range(50)]


class WC(MapReduce):
    def mapper(self, item):
        for w in item.split():
            yield (w, 1)

    def reducer(self, key, values):
        return (key, sum(values))


class WCCombined(WC):
    combine = True


class WCCombinedSorted(WCCombined):
    # sort_map_with_value forces the fallback path (sorting needs the
    # full value list)
    @property
    def sort_map_with_value(self):
        return True


class GenReducerCombined(MapReduce):
    # generator reducers can't combine — must fall back, not crash
    combine = True

    def mapper(self, item):
        for w in item.split():
            yield (w, 1)

    def reducer(self, key, values):
        yield (key, sum(values))

    def output(self, mapping):
        return {k: v[0] for k, v in mapping.items()}


def expected():
    c = Counter()
    for line in LINES:
        c.update(line.split())
    return dict(c)


def test_combine_matches_plain(spark):
    assert WCCombined()(LINES) == WC()(LINES) == expected()


def test_combine_many_partitions(spark):
    task = WCCombined()
    task.input_partitions = 8
    assert task(LINES) == expected()


def test_combine_preserves_output_order(spark):
    plain = WC()(LINES)
    combined = WCCombined()(LINES)
    assert list(plain.keys()) == list(combined.keys())


def test_combine_skipped_when_sorting(spark):
    assert WCCombinedSorted()(LINES) == expected()


def test_combine_skipped_for_generator_reducer(spark):
    assert GenReducerCombined()(LINES) == expected()


class MaxTask(MapReduce):
    combine = True

    def mapper(self, item):
        yield (item[0], item[1])

    def reducer(self, key, values):
        return (key, max(values))


def test_combine_max(spark):
    data = [("a", i) for i in range(100)] + [("b", -i) for i in range(100)]
    task = MaxTask()
    task.input_partitions = 5
    assert task(data) == {"a": 99, "b": 0}
