"""Operator registry: every module contributes QUERIES (name -> callable
(spark, sf_dir) -> DataFrame) and ORACLE (name -> DuckDB SQL twin).

Queries without an ORACLE entry are non-SQL-expressible (custom stateful /
ML-randomized) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from tinymr_spark import functions as fnlib
    from tinymr_spark import streaming
    from tinymr_spark.operators import (
        dedup,
        events,
        multimodal,
        mrface,
        relational,
        similarity,
        text,
    )

    merged: dict[str, QueryFn] = {}
    for mod in (relational, text, dedup, similarity, multimodal, events, mrface, streaming, fnlib):
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from tinymr_spark import functions as fnlib
    from tinymr_spark import streaming
    from tinymr_spark.operators import (
        dedup,
        events,
        multimodal,
        mrface,
        relational,
        similarity,
        text,
    )

    merged: dict[str, str] = {}
    for mod in (relational, text, dedup, similarity, multimodal, events, mrface, streaming, fnlib):
        merged.update(mod.ORACLE)
    return merged
