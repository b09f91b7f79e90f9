"""In-process exercises for the parity-face paths a driver-side tracer
cannot observe through Spark (executor-side helpers — module-level
functions since round 14) plus the rare branches the behavioral suites
only reach distributively.  Exists so the 100%-line-coverage gate
(tests/test_zz_mapreduce_coverage.py; reference CI parity —
.github/workflows/tests.yml:50-53 ``--cov-fail-under 100``) holds with
zero exclusions beyond ``pragma: no cover``."""

from __future__ import annotations

import pytest

from tinymr_spark import ElementCountError, MapReduce
from tinymr_spark.mapreduce import (
    _collect_reraising,
    _combine_partition,
    _finish_combine,
    _finish_group,
    _flatten_kv,
    _index_partition,
    _kv_shape,
    _local_group_and_sort,
    _require_pairs,
    _run_reduce,
)


# ---------------------------------------------------------------------------
# Executor-side record/group helpers, called directly.
# ---------------------------------------------------------------------------
def test_kv_shape_two_and_three_tuples():
    assert _kv_shape(((0, 1), ("k", "v"))) == ("k", ((0, 1), "v"))
    assert _kv_shape(((0, 2), ("k", "s", "v"))) == ("k", ((0, 2), "s", "v"))


def test_finish_group_sort_matrix():
    # arity 3, sort element only
    idx, vals = _finish_group(
        [((0, 1), 2, "b"), ((0, 0), 1, "a")], sort_with_value=False, reverse=False
    )
    assert (idx, vals) == ((0, 0), ["a", "b"])
    # arity 3, (sort, value) composite
    _, vals = _finish_group(
        [((0, 0), 1, "z"), ((0, 1), 1, "a")], sort_with_value=True, reverse=False
    )
    assert vals == ["a", "z"]
    # arity 2, sort by value
    _, vals = _finish_group(
        [((0, 0), "z"), ((0, 1), "a")], sort_with_value=True, reverse=False
    )
    assert vals == ["a", "z"]
    # arity 2, encounter order only
    _, vals = _finish_group(
        [((0, 1), "z"), ((0, 0), "a")], sort_with_value=False, reverse=False
    )
    assert vals == ["a", "z"]
    # reverse flips each sorted branch
    _, vals = _finish_group(
        [((0, 0), 1, "a"), ((0, 1), 2, "b")], sort_with_value=False, reverse=True
    )
    assert vals == ["b", "a"]


def test_index_partition_tags_and_checks_arity():
    out = list(_index_partition(3, iter([("k", 1), ("k2", 2)])))
    assert out == [((3, 0), ("k", 1)), ((3, 1), ("k2", 2))]
    with pytest.raises(ElementCountError):
        list(_index_partition(0, iter([("too", "many", "parts", "here")])))


def test_run_reduce_generator_and_return_styles():
    def gen_reducer(key, values):
        for v in values:
            yield (key, v)

    out = list(_run_reduce(("k", ((0, 0), [1, 2])), gen_reducer, True))
    assert out == [((0, 0, 0), ("k", 1)), ((0, 0, 1), ("k", 2))]

    def ret_reducer(key, values):
        return (key, sum(values))

    out = list(_run_reduce(("k", ((0, 5), [1, 2])), ret_reducer, False))
    assert out == [((0, 5, 0), ("k", 3))]

    def bad_reducer(key, values):
        return (key,)

    with pytest.raises(ElementCountError):
        list(_run_reduce(("k", ((0, 0), [1])), bad_reducer, False))


def test_combine_partition_accumulates_and_keeps_min_index():
    def reducer(key, values):
        return (key, sum(values))

    # same key arriving with a LATER index first: min-idx update branch
    records = [((0, 2), ("k", 1)), ((0, 0), ("k", 2)), ((0, 1), ("j", 5))]
    out = dict()
    for k, (idx, partial_v) in _combine_partition(iter(records), reducer):
        out[k] = (idx, partial_v)
    assert out == {"k": ((0, 0), 3), "j": ((0, 1), 5)}

    with pytest.raises(ElementCountError, match="combine=True"):
        list(_combine_partition(iter([((0, 0), ("k", "s", "v"))]), reducer))


def test_finish_combine_restores_encounter_order():
    assert _finish_combine([((0, 3), 30), ((0, 1), 10)]) == ((0, 1), [10, 30])


def test_flatten_kv_list_and_scalar():
    assert _flatten_kv(("k", [1, 2])) == [("k", 1), ("k", 2)]
    assert _flatten_kv(("k", 7)) == [("k", 7)]


# ---------------------------------------------------------------------------
# Collect re-raise adapter: duck-typed on .collect(), so fakes suffice.
# ---------------------------------------------------------------------------
class _FakeRDD:
    def __init__(self, exc):
        self._exc = exc

    def collect(self):
        raise self._exc


def test_collect_reraising_passes_native_element_count_error():
    with pytest.raises(ElementCountError, match="native"):
        _collect_reraising(_FakeRDD(ElementCountError("native")))


def test_collect_reraising_passes_unrelated_errors():
    with pytest.raises(ValueError, match="boom"):
        _collect_reraising(_FakeRDD(ValueError("boom")))


def test_require_pairs_guards_arity():
    assert list(_require_pairs(iter([("k", 1)]))) == [("k", 1)]
    with pytest.raises(ElementCountError, match="combine=True"):
        list(_require_pairs(iter([("k", "s", "v")])))


def test_local_group_and_sort_empty_stream_is_none():
    assert _local_group_and_sort(iter([]), False, False) is None


# ---------------------------------------------------------------------------
# Empty-outcome paths of the local lowering and the lazy exports.
# ---------------------------------------------------------------------------
class _SilentMapper(MapReduce):
    def mapper(self, item):
        return iter(())  # generator-style mapper that yields nothing
        yield  # noqa  — marks this a generator function

    def reducer(self, key, values):
        yield (key, sum(values))


class _SilentReducer(MapReduce):
    def mapper(self, item):
        yield (item, 1)

    def reducer(self, key, values):
        return iter(())
        yield  # noqa


class _WordCount(MapReduce):
    def mapper(self, item):
        for w in item.split():
            yield (w, 1)

    def reducer(self, key, values):
        yield (key, sum(values))


def test_local_empty_map_round_finalizes_empty():
    assert _SilentMapper()(["a", "b"]) == {}


def test_local_empty_reduce_round_finalizes_empty():
    assert _SilentReducer()(["a", "b"]) == {}


def test_to_rdd_empty_sequence_is_none():
    assert _WordCount().to_rdd([]) is None


def test_to_rdd_runs_pipeline(spark):
    rdd = _WordCount().to_rdd(["a a b"], spark=spark)
    assert dict(rdd.collect()) == {"a": [2], "b": [1]}


def test_to_df_empty_sequence_yields_empty_frame(spark):
    df = _WordCount().to_df([], spark=spark)
    assert df.count() == 0
    assert df.columns == ["key", "value"]


def test_to_df_explodes_value_lists(spark):
    df = _WordCount().to_df(["a a b"], spark=spark, value_type="bigint")
    assert sorted(map(tuple, df.collect())) == [("a", 2), ("b", 1)]
