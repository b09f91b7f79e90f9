"""Secondary-sort semantics: every row of the sort matrix (SURVEY.md §2.1),
ascending and descending, plus stable-tie behavior and the chained
two-stage composite-key case (reference tests/test_mapreduce_sorting.py
semantics, re-expressed)."""

from __future__ import annotations

import random

import pytest

from tinymr_spark import MapReduce


@pytest.fixture(autouse=True)
def _force_distributed(monkeypatch):
    """These modules pin the DISTRIBUTED lowering's semantics; disable the
    small-input local fast path so tiny fixtures still exercise it (the
    local path is differentially fuzzed in test_differential_reference)."""
    monkeypatch.setattr(MapReduce, "local_threshold", 0)


class CollectValues(MapReduce):
    """Group 2-tuples; reducer passes the (possibly sorted) list through."""

    def __init__(self, swv=False, rev=False):
        self._swv = swv
        self._rev = rev

    @property
    def sort_map_with_value(self):
        return self._swv

    @property
    def sort_map_reverse(self):
        return self._rev

    def mapper(self, item):
        yield item

    def reducer(self, key, values):
        return (key, values)


class CollectValues3(CollectValues):
    """Same but the mapper emits 3-tuples (key, sort, value)."""

    def mapper(self, item):
        yield item


DATA2 = [("k", 5), ("k", 1), ("k", 3), ("k", 1), ("j", 9), ("j", 2)]
DATA3 = [
    ("k", 2, "b"),
    ("k", 1, "z"),
    ("k", 2, "a"),
    ("k", 1, "a"),
    ("j", 7, "x"),
    ("j", 3, "y"),
]


def test_two_tuple_no_sort_keeps_encounter_order(spark):
    result = CollectValues()(DATA2)
    assert result["k"] == [5, 1, 3, 1]
    assert result["j"] == [9, 2]


def test_two_tuple_sort_with_value_ascending(spark):
    result = CollectValues(swv=True)(DATA2)
    assert result["k"] == [1, 1, 3, 5]
    assert result["j"] == [2, 9]


def test_two_tuple_sort_with_value_descending(spark):
    result = CollectValues(swv=True, rev=True)(DATA2)
    assert result["k"] == [5, 3, 1, 1]
    assert result["j"] == [9, 2]


def test_three_tuple_sorts_by_sort_element_only(spark):
    result = CollectValues3()(DATA3)
    # sort element only; ties keep encounter order: (1,"z") before (1,"a")
    assert result["k"] == ["z", "a", "b", "a"]
    assert result["j"] == ["y", "x"]


def test_three_tuple_descending_ties_keep_encounter_order(spark):
    result = CollectValues3(rev=True)(DATA3)
    # reverse=True but stable: within sort=2, "b" (first encountered) first
    assert result["k"] == ["b", "a", "z", "a"]
    assert result["j"] == ["x", "y"]


def test_three_tuple_sort_with_value(spark):
    result = CollectValues3(swv=True)(DATA3)
    # effective key (sort, value): (1,a),(1,z),(2,a),(2,b)
    assert result["k"] == ["a", "z", "a", "b"]


def test_three_tuple_sort_with_value_descending(spark):
    result = CollectValues3(swv=True, rev=True)(DATA3)
    assert result["k"] == ["b", "a", "z", "a"]


def test_input_order_independence(spark):
    rng = random.Random(7)
    data = [("k", i % 5, i) for i in range(50)]
    shuffled = data[:]
    rng.shuffle(shuffled)
    result = CollectValues3(swv=True)(shuffled)
    assert result["k"] == [v for _, _, v in sorted(shuffled, key=lambda t: (t[1], t[2]))]


class MonthlyRollup(MapReduce):
    """Chained two-stage aggregation with composite sort keys: mapper emits
    per-day rows sorted by (year, month, day); reducer re-keys by
    (year, month) and the engine's second grouping round regroups
    (/root/reference/tinymr.py:217-221 semantics)."""

    def mapper(self, item):
        y, m, d, v = item
        yield ((y, m, d), v)

    def reducer(self, key, values):
        y, m, d = key
        yield ((y, m), (d, sum(values)))

    @property
    def sort_reduce_with_value(self):
        return True


def test_chained_two_stage_composite_keys(spark):
    rows = []
    for y in (2023, 2024):
        for m in (1, 2):
            for d in (1, 2, 3):
                rows.append((y, m, d, d * 10 + m))
                rows.append((y, m, d, 1))
    random.Random(3).shuffle(rows)
    result = MonthlyRollup()(rows)
    assert set(result) == {(2023, 1), (2023, 2), (2024, 1), (2024, 2)}
    # per (year, month): days sorted ascending with their summed values
    assert result[(2023, 1)] == [(1, 12), (2, 22), (3, 32)]
    assert result[(2024, 2)] == [(1, 13), (2, 23), (3, 33)]


class ReduceSorted(MapReduce):
    """Sort applied on the SECOND round only (reducer output)."""

    def mapper(self, item):
        yield item

    def reducer(self, key, values):
        for v in values:
            yield ("out", -key, v)

    @property
    def sort_reduce_reverse(self):
        return False


def test_reduce_round_sorting(spark):
    data = [(3, "c"), (1, "a"), (2, "b")]
    result = ReduceSorted()(data)
    # sorted by -key ascending -> keys 3,2,1
    assert result["out"] == ["c", "b", "a"]
