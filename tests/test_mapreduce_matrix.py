"""Combination matrix (reference tests/test_mapreduce_concurrency.py
pattern, re-expressed): one word-count task under every yield/return API
style x input partition counts x combine on/off, each checked against an
independent collections.Counter oracle.  The reference's two pool axes
(mapper_map/reducer_map) are subsumed by Spark executors, so the matrix
covers what still varies in the distributed engine."""

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

LINES = [f"alpha w{i % 5} w{i % 11} beta" for i in range(60)]


def oracle():
    c = Counter()
    for line in LINES:
        c.update(line.split())
    return dict(c)


class YieldYield(MapReduce):
    def mapper(self, item):
        for w in item.split():
            yield (w, 1)

    def reducer(self, key, values):
        yield (key, sum(values))

    def output(self, mapping):
        return {k: v[0] for k, v in mapping.items()}


class YieldReturn(MapReduce):
    def mapper(self, item):
        for w in item.split():
            yield (w, 1)

    def reducer(self, key, values):
        return (key, sum(values))


class ReturnYield(MapReduce):
    def mapper(self, item):
        # return exactly one tuple: (first word, count of words)
        words = item.split()
        return (words[0], len(words))

    def reducer(self, key, values):
        yield (key, sum(values))

    def output(self, mapping):
        return {k: v[0] for k, v in mapping.items()}


class ReturnReturn(ReturnYield):
    def reducer(self, key, values):
        return (key, sum(values))

    def output(self, mapping):
        return mapping


YIELD_MAPPERS = [YieldYield, YieldReturn]
RETURN_MAPPERS = [ReturnYield, ReturnReturn]


@pytest.mark.parametrize("npart", [1, 4, 16])
@pytest.mark.parametrize("combine", [False, True])
@pytest.mark.parametrize("cls", YIELD_MAPPERS)
def test_matrix_yield_mapper(spark, cls, combine, npart):
    task = cls()
    task.input_partitions = npart
    if combine:
        task.combine = True  # no-op for generator reducers (YieldYield)
    assert task(LINES) == oracle()


@pytest.mark.parametrize("npart", [1, 4, 16])
@pytest.mark.parametrize("cls", RETURN_MAPPERS)
def test_matrix_return_mapper(spark, cls, npart):
    task = cls()
    task.input_partitions = npart
    expected = Counter()
    for line in LINES:
        words = line.split()
        expected[words[0]] += len(words)
    assert task(LINES) == dict(expected)
