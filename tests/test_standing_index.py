"""The write-then-probe standing-index lifecycle (sources.standing_index)
and its plan contract: q123/q140/q125 probe WRITTEN bucketed tables, so
the lake/index side of every probe join must consume the scan's bucket
partitioning directly — NO exchange on the index side, only the shard
shuffles — and a literal term filter must prune whole buckets."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tinymr_spark.plans import explain_str
from tinymr_spark.sources import session_cache, staging_root, standing_index


def _clone_sf(sf_dir: str, tmp_path) -> str:
    dst = str(tmp_path / "sf")
    os.makedirs(dst)
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(sf_dir, f), os.path.join(dst, f))
    return dst


def _bump(path: str) -> None:
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))


def test_standing_index_builds_once_and_prunes_stale_versions(spark, sf_dir, tmp_path):
    import uuid

    # unique tag per run: pytest keeps prior tmp roots alive, so a fixed
    # tag would see still-live src dirs from earlier test sessions
    tag = f"t_lifecycle_{uuid.uuid4().hex[:8]}"
    src = str(tmp_path / "src.parquet")
    spark.range(100).selectExpr("id", "id % 7 AS k").write.parquet(src)
    builds = []

    def build():
        builds.append(1)
        return spark.read.parquet(src).groupBy("k").agg(F.count("*").alias("n"))

    idx1 = standing_index(spark, tag, [src], build, ["k"])
    assert idx1.count() == 7 and builds == [1]
    # same version: no rebuild, same table
    standing_index(spark, tag, [src], build, ["k"]).collect()
    assert builds == [1]
    cache = session_cache(spark, "_tinymr_index_cache")
    old_name = next(v for k, v in cache.items() if k[0] == tag)

    # regenerated source (new mtime): rebuild; stale table dropped from
    # the catalog AND its staged version dir removed
    _bump(src)
    standing_index(spark, tag, [src], build, ["k"]).collect()
    assert builds == [1, 1]
    assert not spark.catalog.tableExists(old_name)
    keys = [k for k in cache if k[0] == tag]
    assert len(keys) == 1
    tag_root = os.path.join(staging_root("tinymr_spark_index"), tag)
    src_dirs = [d for d in os.listdir(tag_root)]
    assert len(src_dirs) == 1
    ver_dirs = [
        d for d in os.listdir(os.path.join(tag_root, src_dirs[0]))
        if d != "_sources.json"
    ]
    assert len(ver_dirs) == 1, f"superseded version dirs retained: {ver_dirs}"


def test_standing_index_reregisters_across_sessions_without_rebuild(spark, tmp_path):
    """The artifact must be build-once per CORPUS SNAPSHOT, not per
    session: when the (session-scoped, in-memory) catalog lacks the
    table but the version dir already holds the written files, the
    index is re-registered as an external CLUSTERED BY table — no
    rebuild — and the re-registered table still scans with bucket
    metadata (bucket pruning fires on a key filter)."""
    import uuid

    tag = f"t_rereg_{uuid.uuid4().hex[:8]}"
    src = str(tmp_path / "src.parquet")
    spark.range(100).selectExpr("id", "id % 7 AS k").write.parquet(src)
    builds = []

    def build():
        builds.append(1)
        return spark.read.parquet(src).groupBy("k").agg(F.count("*").alias("n"))

    standing_index(spark, tag, [src], build, ["k"]).collect()
    assert builds == [1]
    cache = session_cache(spark, "_tinymr_index_cache")
    key = next(k for k in cache if k[0] == tag)
    name = cache.pop(key)
    spark.sql(f"DROP TABLE {name}")  # simulate a fresh session's catalog

    idx = standing_index(spark, tag, [src], build, ["k"])
    assert builds == [1], "index was rebuilt despite existing files"
    assert idx.count() == 7
    # bucket metadata survived re-registration: an aggregation on the
    # bucket key consumes the scan's hash partitioning — no exchange
    # (a bare filter scan would disable bucketed reading by design)
    agg_plan = explain_str(idx.groupBy("k").agg(F.sum("n").alias("t")), "simple")
    assert "Exchange hashpartitioning" not in agg_plan, agg_plan
    detail = spark.sql(f"DESCRIBE TABLE EXTENDED {cache[key]}").collect()
    assert any("Num Buckets" in r[0] and "8" in r[1] for r in detail), detail


def test_standing_index_gcs_dead_source_dirs(spark, tmp_path):
    """An index whose SOURCE file no longer exists (deleted sf clone) is
    reclaimed on the next build of any index under the same tag."""
    import uuid

    tag = f"t_gc_{uuid.uuid4().hex[:8]}"
    src_a = str(tmp_path / "a.parquet")
    src_b = str(tmp_path / "b.parquet")
    for p in (src_a, src_b):
        spark.range(10).selectExpr("id", "id % 3 AS k").write.parquet(p)

    def build(p):
        return lambda: spark.read.parquet(p).groupBy("k").agg(F.count("*").alias("n"))

    standing_index(spark, tag, [src_a], build(src_a), ["k"]).collect()
    standing_index(spark, tag, [src_b], build(src_b), ["k"]).collect()
    tag_root = os.path.join(staging_root("tinymr_spark_index"), tag)
    assert len(os.listdir(tag_root)) == 2  # both sources live -> both kept

    shutil.rmtree(src_a)
    _bump(src_b)  # new dir mtime -> new version -> prune pass runs
    standing_index(spark, tag, [src_b], build(src_b), ["k"]).collect()
    assert len(os.listdir(tag_root)) == 1, "dead-source index dir not reclaimed"


def test_versioned_staging_dir_prunes_superseded_versions(tmp_path):
    """Staged format copies / stream checkpoints keyed by source version
    must not leak one directory per corpus regeneration: resolving the
    current version prunes superseded sibling version dirs AND their
    dot-suffixed marker files."""
    from tinymr_spark.sources import versioned_staging_dir

    src = str(tmp_path / "src.bin")
    open(src, "w").write("v1")
    d1 = versioned_staging_dir("tinymr_test_stage", src)
    os.makedirs(d1)
    open(d1 + "._done", "w").close()

    _bump(src)
    d2 = versioned_staging_dir("tinymr_test_stage", src)
    assert d2 != d1
    assert not os.path.exists(d1), "superseded staged dir retained"
    assert not os.path.exists(d1 + "._done"), "superseded marker retained"
    # same version again: current dir untouched
    os.makedirs(d2)
    assert versioned_staging_dir("tinymr_test_stage", src) == d2
    assert os.path.isdir(d2)


def _assert_index_scans_exchange_free(plan: str) -> int:
    """Walk the physical-plan tree: from every `idx_` table scan upward,
    no SHUFFLE Exchange may appear before the enclosing join — the
    bucketed index side must plug into the join as-is.  A
    BroadcastExchange is allowed: broadcasting a bucket-pruned index
    slice (q125's 5-term df table) moves no data through a shuffle and
    is itself a scale-sound probe shape.  Returns the number of index
    scans checked."""

    def depth(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-*"))

    lines = plan.splitlines()
    checked = 0
    for i, line in enumerate(lines):
        if "Scan parquet" in line and "default.idx_" in line:
            checked += 1
            cur = depth(line)
            for j in range(i - 1, -1, -1):
                d = depth(lines[j])
                if d < cur:
                    cur = d
                    if "Join" in lines[j]:
                        break
                    # Violations are REPARTITIONING shuffles of index
                    # data (hash/range).  Allowed: BroadcastExchange
                    # (q125's 5-term df slice) and Exchange
                    # SinglePartition (the 2-value global stats agg) —
                    # neither re-shuffles the index into a join.
                    is_shuffle = "Exchange hashpartitioning" in lines[j] or (
                        "Exchange rangepartitioning" in lines[j]
                    )
                    assert not is_shuffle, (
                        f"shuffle Exchange above index scan:\n{lines[j]}\n\n{plan}"
                    )
    return checked


def test_incremental_probes_plan_index_side_exchange_free(spark, sf_dir):
    """q123 (fingerprint + band lakes) and q140 (vector lake): with
    broadcast disabled (exposing the big-big path the layout exists
    for), every standing-index scan feeds its join without an Exchange —
    only the shard side shuffles."""
    from tinymr_spark.operators.dedup import q123_incremental_dedup
    from tinymr_spark.operators.similarity import q140_incremental_embedding_dedup

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p123 = explain_str(q123_incremental_dedup(spark, sf_dir), "simple")
        p140 = explain_str(q140_incremental_embedding_dedup(spark, sf_dir), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert _assert_index_scans_exchange_free(p123) >= 2  # lakefp + lakebands
    assert _assert_index_scans_exchange_free(p140) >= 1  # lakevecs


def test_ml_lsh_probes_plan_index_side_exchange_free(spark, sf_dir):
    """q104 (r7 migration): the band-table SELF-join must plug both sides
    in on the (entry, h) bucketing and the two set-table verification
    joins must scan exchange-free — with broadcast disabled, the only
    shuffles left are the candidate-pair distinct and the candidate side
    of the verification joins."""
    from tinymr_spark.operators.dedup import q104_ml_minhash_lsh

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(q104_ml_minhash_lsh(spark, sf_dir), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert _assert_index_scans_exchange_free(plan) >= 4  # bands x2 + sets x2


def test_semdedup_probe_plans_index_side_exchange_free(spark, sf_dir):
    """q157: the (cell, shard)-bucketed assignment table must plug BOTH
    sides of the intra-cluster self-join in on its bucketing — the only
    shuffle left in the probe is the final removed-vector aggregation."""
    from tinymr_spark.operators.dedup import q157_semdedup

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(q157_semdedup(spark, sf_dir), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert _assert_index_scans_exchange_free(plan) >= 2  # both self-join sides
    assert plan.count("Exchange hashpartitioning") <= 1


def test_bm25_postings_scan_prunes_buckets(spark, sf_dir):
    """q125's literal term IN-list must reach the bucketed postings scan
    and select a strict subset of buckets — the probe reads only the
    buckets its terms hash to."""
    from tinymr_spark.operators.text import q125_bm25_topk

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(q125_bm25_topk(spark, sf_dir), "formatted")
        simple = explain_str(q125_bm25_topk(spark, sf_dir), "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    import re

    pruned = [
        (int(m.group(1)), int(m.group(2)))
        for m in re.finditer(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    ]
    assert any(sel < total for sel, total in pruned), plan
    assert _assert_index_scans_exchange_free(simple) >= 1
