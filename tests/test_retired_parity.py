"""Round-11 registry consolidation: ten near-duplicate queries were
retired from the driver-gated registry (their gate/bench slots were
approaching the bench-line ladder's capacity), each superseded by a
strictly-more-general survivor:

    q42 minhash (r=1,b=8)      -> q45 banded minhash + q104 ML MinHashLSH
    q43 simhash                -> q47 banded simhash (reuses q43's signature)
    q51 grid-bucketed ANN      -> q54 IVF (learned buckets) + q53 machinery
    q53 LSH buckets            -> q55 LSH dedup + q159 streaming sign-buckets
    q56 normalize+quantize     -> q147 int8 quantization gate + q58/q59 PQ
    q105 small-file compaction -> q173 OPTIMIZE binpack (the lakehouse verb)
    q130 z-order layout        -> q200 ZORDER verb + q203 clustered compaction
    q164 append change feed    -> q181 change feed across DML
    q165 append incremental MV -> q182 incremental MV through update/delete
    q174 OPTIMIZE ZORDER       -> q200 zorder verb (where-scoped, recorded keys)
    (q204 explicit-CDF streaming was absorbed INTO q205's history, not here)

Round 12 added one more:

    q166 merge upsert          -> q208 conditional merge (update_where +
                                  delete clause + CDF; plain upsert is its
                                  degenerate no-condition case)

Round 13 added one more:

    q191 NULL-scrub delete     -> q178 delete NULL-safety tiers (same
                                  three-tier delete semantics) + q209
                                  column defaults (the new DDL-era delete
                                  coverage took its gate/bench slot)

The functions and their DuckDB oracles remain in the package (several
are load-bearing machinery for the survivors); THIS file keeps every
retired query's oracle assertion running in CI — out of the driver gate
and the bench line, never out of the test suite.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py"),
)
check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracle)


def _retired():
    from tinymr_spark.operators import dedup, scale, similarity

    return {
        "q42_dedup_minhash": (dedup.q42_dedup_minhash, dedup.ORACLE_Q42),
        "q43_dedup_simhash": (dedup.q43_dedup_simhash, dedup.ORACLE_Q43),
        "q51_ann_bucketed": (similarity.q51_ann_bucketed, similarity.ORACLE_Q51),
        "q53_lsh_buckets": (similarity.q53_lsh_buckets, similarity.ORACLE_Q53),
        "q56_normalize_quantize": (
            similarity.q56_normalize_quantize, similarity.ORACLE_Q56,
        ),
        "q105_compact_small_files": (
            scale.q105_compact_small_files, scale.ORACLE_Q105,
        ),
        "q130_zorder_layout": (scale.q130_zorder_layout, scale.ORACLE_Q130),
        "q164_change_feed": (scale.q164_change_feed, scale.ORACLE_Q164),
        "q165_incremental_mv": (scale.q165_incremental_mv, scale.ORACLE_Q165),
        "q174_optimize_zorder": (scale.q174_optimize_zorder, scale.ORACLE_Q174),
        "q166_merge_upsert": (scale.q166_merge_upsert, scale.ORACLE_Q166),
        "q191_null_scrub_delete": (
            scale.q191_null_scrub_delete, scale.ORACLE_Q191,
        ),
    }


RETIRED = _retired()


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_query_still_matches_oracle(spark, duck, sf_dir, name):
    fn, oracle = RETIRED[name]
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(oracle)
    dcols = rel.columns
    drows = rel.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert sorted(scols) == sorted(dcols)
    assert check_oracle.table_hash(srows, scols) == check_oracle.table_hash(
        drows, dcols
    )


def test_retired_names_absent_from_registry():
    from tinymr_spark.operators import all_oracles, all_queries

    qs, oracles = set(all_queries()), set(all_oracles())
    for name in list(RETIRED) + ["q204_stream_change_feed"]:
        assert name not in qs and name not in oracles, name
