"""Arity validation: records outside arity {2,3} raise ElementCountError
from both the map and reduce rounds (reference tests/test_exceptions.py
semantics, re-expressed)."""

from __future__ import annotations

import pytest

from tinymr_spark import ElementCountError, MapReduce


@pytest.fixture(params=["local", "distributed"], autouse=True)
def exec_mode(request, monkeypatch):
    """Arity validation must raise identically from the in-process fast
    path and the RDD lowering."""
    monkeypatch.setattr(
        MapReduce, "local_threshold", 10**9 if request.param == "local" else 0
    )
    return request.param


class BadMapperArity1(MapReduce):
    def mapper(self, item):
        yield (item,)

    def reducer(self, key, values):
        return (key, values)


class BadMapperArity4(MapReduce):
    def mapper(self, item):
        yield (item, 1, 2, 3)

    def reducer(self, key, values):
        return (key, values)


class BadReducerArity1(MapReduce):
    def mapper(self, item):
        yield (item, 1)

    def reducer(self, key, values):
        yield (key,)


class BadReducerArity4(MapReduce):
    def mapper(self, item):
        yield (item, 1)

    def reducer(self, key, values):
        yield (key, 1, 2, 3)


@pytest.mark.parametrize("cls", [BadMapperArity1, BadMapperArity4])
def test_mapper_arity_rejected(spark, cls):
    with pytest.raises(ElementCountError):
        cls()(["a", "b"])


@pytest.mark.parametrize("cls", [BadReducerArity1, BadReducerArity4])
def test_reducer_arity_rejected(spark, cls):
    with pytest.raises(ElementCountError):
        cls()(["a", "b"])


def test_error_message_mentions_size(spark):
    with pytest.raises(ElementCountError, match="Expected data of size 2 or 3"):
        BadMapperArity4()(["a"])
