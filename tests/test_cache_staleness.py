"""Session-cache freshness: a regenerated corpus file at the same path
must evict (and release) the superseded cached entry — for BOTH the
connected-components group table (q46/q118) and the ML-LSH index (q104).
The lake contract is "materialize once per immutable snapshot"; without
eviction, every regeneration leaks one persisted table for the session's
lifetime."""

from __future__ import annotations

import os
import shutil


def _clone_sf(sf_dir: str, tmp_path) -> str:
    dst = str(tmp_path / "sf")
    os.makedirs(dst)
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(sf_dir, f), os.path.join(dst, f))
    return dst


def _regenerate(path: str) -> None:
    """Simulate the driver rewriting a testdata file in place: same
    content, new (mtime_ns, size) version — bump mtime."""
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))


def test_q46_group_cache_evicts_stale_versions(spark, sf_dir, tmp_path):
    from tinymr_spark.operators.dedup import q46_dedup_groups
    from tinymr_spark.sources import session_cache

    sf = _clone_sf(sf_dir, tmp_path)
    q46_dedup_groups(spark, sf)
    cache = session_cache(spark, "_tinymr_cc_groups_cache")
    old_keys = [k for k in cache if k[0] == sf]
    assert len(old_keys) == 1
    stale_df = cache[old_keys[0]]

    _regenerate(os.path.join(sf, "documents.parquet"))
    q46_dedup_groups(spark, sf)
    keys = [k for k in cache if k[0] == sf]
    assert len(keys) == 1, f"stale q46 entries retained: {keys}"
    assert keys[0] != old_keys[0]
    assert stale_df.storageLevel.useMemory is False, "stale table not unpersisted"


def test_ml_lsh_standing_index_evicts_stale_versions(spark, sf_dir, tmp_path):
    """q104's LSH artifacts are WRITTEN standing indexes since r7: a
    regenerated corpus must rotate BOTH tables (bands + sets) to a new
    version, dropping the superseded catalog entries — the on-disk analog
    of the old session-cache pop+unpersist this test used to assert."""
    from tinymr_spark.operators.dedup import _ml_lsh_index
    from tinymr_spark.sources import session_cache, table_path

    sf = _clone_sf(sf_dir, tmp_path)
    _ml_lsh_index(spark, sf)
    path = table_path(sf, "documents")
    cache = session_cache(spark, "_tinymr_index_cache")
    old = {k: v for k, v in cache.items() if k[1] == (path,) and "mllsh" in k[0]}
    assert len(old) == 2, f"expected bands+sets entries, got {list(old)}"

    _regenerate(path)
    _ml_lsh_index(spark, sf)
    new = {k: v for k, v in cache.items() if k[1] == (path,) and "mllsh" in k[0]}
    assert len(new) == 2, f"stale LSH index entries retained: {list(new)}"
    assert set(new).isdisjoint(old), "version rotation did not rekey the indexes"
    for stale_table in old.values():
        assert not spark.catalog.tableExists(stale_table), (
            f"superseded index table {stale_table} still registered"
        )


def test_bm25_index_cache_evicts_stale_versions(spark, sf_dir, tmp_path):
    """The BM25 index is now a WRITTEN standing index (three bucketed
    tables per corpus version); a regenerated corpus must drop the
    superseded catalog tables and replace the cache entries — the
    on-disk analog of pop+unpersist (dir pruning is covered by
    tests/test_standing_index.py)."""
    from tinymr_spark.operators.text import _bm25_index
    from tinymr_spark.sources import session_cache

    sf = _clone_sf(sf_dir, tmp_path)
    src = os.path.join(sf, "documents.parquet")
    _bm25_index(spark, sf)
    cache = session_cache(spark, "_tinymr_index_cache")
    old = {k: v for k, v in cache.items() if k[1] == (src,)}
    assert len(old) == 3  # bm25tf + bm25dl + bm25df
    assert all(spark.catalog.tableExists(t) for t in old.values())

    _regenerate(src)
    _bm25_index(spark, sf)
    keys = [k for k in cache if k[1] == (src,)]
    assert len(keys) == 3, f"stale BM25 entries retained: {keys}"
    assert not (set(keys) & set(old)), "stale version keys survived"
    for stale_table in old.values():
        assert not spark.catalog.tableExists(stale_table), (
            f"stale catalog table retained: {stale_table}"
        )


def test_observe_cache_evicts_stale_versions(spark, sf_dir, tmp_path):
    from tinymr_spark.operators.scale import q128_observe_metrics
    from tinymr_spark.sources import session_cache

    sf = _clone_sf(sf_dir, tmp_path)
    q128_observe_metrics(spark, sf)
    cache = session_cache(spark, "_tinymr_observe_cache")
    old_keys = [k for k in cache if k[0] == sf]
    assert len(old_keys) == 1
    _, stale_out = cache[old_keys[0]]

    _regenerate(os.path.join(sf, "events.parquet"))
    q128_observe_metrics(spark, sf)
    keys = [k for k in cache if k[0] == sf]
    assert len(keys) == 1, f"stale observe entries retained: {keys}"
    assert keys[0] != old_keys[0]
    assert stale_out.storageLevel.useMemory is False, "stale result not unpersisted"


def test_graph_edge_cache_evicts_stale_versions(spark, sf_dir, tmp_path):
    from tinymr_spark.operators.graph import _edge_cache
    from tinymr_spark.sources import session_cache

    sf = _clone_sf(sf_dir, tmp_path)
    _edge_cache(spark, sf)
    cache = session_cache(spark, "_tinymr_graph_cache")
    old_keys = [k for k in cache if k[0] == sf]
    assert len(old_keys) == 1
    stale_edges, stale_nodes = cache[old_keys[0]]

    _regenerate(os.path.join(sf, "lineitem.parquet"))
    _edge_cache(spark, sf)
    keys = [k for k in cache if k[0] == sf]
    assert len(keys) == 1, f"stale graph entries retained: {keys}"
    assert keys[0] != old_keys[0]
    assert stale_edges.storageLevel.useMemory is False, "stale edges not unpersisted"
    assert stale_nodes.storageLevel.useMemory is False, "stale nodes not unpersisted"


def test_copurchase_cache_coexists_and_evicts(spark, sf_dir, tmp_path):
    """The two graph kinds (bipartite PageRank edges, co-purchase
    triangle edges) share one session cache without evicting each other;
    regenerating the corpus evicts only the stale generation of each."""
    from tinymr_spark.operators.graph import _copurchase_cache, _edge_cache
    from tinymr_spark.sources import session_cache

    sf = _clone_sf(sf_dir, tmp_path)
    _edge_cache(spark, sf)
    _copurchase_cache(spark, sf)
    cache = session_cache(spark, "_tinymr_graph_cache")
    kinds = sorted(k[2] for k in cache if k[0] == sf)
    assert kinds == ["bipartite", "copurchase"], kinds
    old = [k for k in cache if k[0] == sf and k[2] == "copurchase"][0]

    _regenerate(os.path.join(sf, "lineitem.parquet"))
    _copurchase_cache(spark, sf)
    assert old not in cache, "stale copurchase generation retained"
    # the bipartite entry (other kind) was NOT collaterally evicted
    assert any(k[0] == sf and k[2] == "bipartite" for k in cache)


def test_bpe_cache_evicts_stale_versions(spark, sf_dir, tmp_path):
    """The trained BPE artifact (merge rules + encoded vocab) is rebuilt
    when the documents table regenerates; the stale encoded table is
    unpersisted."""
    from tinymr_spark.operators.text import _bpe_cache
    from tinymr_spark.sources import session_cache

    sf = _clone_sf(sf_dir, tmp_path)
    merges, encoded = _bpe_cache(spark, sf)
    assert merges and encoded.columns == ["w", "enc", "freq"]
    cache = session_cache(spark, "_tinymr_bpe_cache")
    old_keys = [k for k in cache if k[0] == sf]
    assert len(old_keys) == 1

    _regenerate(os.path.join(sf, "documents.parquet"))
    _bpe_cache(spark, sf)
    keys = [k for k in cache if k[0] == sf]
    assert len(keys) == 1 and keys[0] != old_keys[0], keys
    assert encoded.storageLevel.useMemory is False, "stale encoding not unpersisted"
