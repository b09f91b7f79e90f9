"""Semantic invariants of the corpus-construction operators (q101-q103)
beyond the oracle hash: packing covers every doc exactly once, mixture
sampling actually equalizes token shares, and vocab encoding is
deterministic with a correct OOV boundary.  (Cross-engine value equality
is tests/test_oracle_parity.py; these pin the semantics a hash can't
explain.)"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tinymr_spark.operators.text import (
    CONTEXT_TOKENS,
    VOCAB_SIZE,
    q101_sequence_packing,
    q102_domain_mixture,
    q103_vocab_encode,
    with_tokens,
)
from tinymr_spark.sources import load_table


def test_q101_packing_partitions_docs_exactly_once(spark, sf_dir):
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()
    total_tokens = docs.select(F.sum(F.size("toks"))).first()[0]
    packed = q101_sequence_packing(spark, sf_dir)
    agg = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_tokens").alias("toks")
    ).first()
    assert agg["docs"] == n_docs
    assert agg["toks"] == total_tokens
    # A sequence holds >= 1 doc and starts within one doc of its capacity:
    # a doc's start offset lands inside the window, so at least one token
    # of every member doc belongs to the window's [k*C, (k+1)*C) range.
    rows = packed.collect()
    assert all(r["n_docs"] >= 1 for r in rows)
    # Per source, seq ids are dense from 0 (concat-and-chunk leaves no gaps).
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["seq_id"])
    for src, ids in per_src.items():
        assert sorted(ids) == list(range(len(ids))), src


def test_q101_straddling_doc_counts_toward_its_start_window(spark, sf_dir):
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    one_src = (
        docs.select("doc_id", "source", F.size("toks").alias("n"))
        .where(F.col("source") == "src0")
        .orderBy("doc_id")
        .collect()
    )
    start = 0
    want = {}
    for r in one_src:
        want.setdefault(start // CONTEXT_TOKENS, []).append(r["doc_id"])
        start += r["n"]
    got = {
        r["seq_id"]: (r["n_docs"], r["first_doc"], r["last_doc"])
        for r in q101_sequence_packing(spark, sf_dir)
        .where(F.col("source") == "src0")
        .collect()
    }
    assert got == {
        k: (len(v), min(v), max(v)) for k, v in want.items()
    }


def test_q102_mixture_caps_each_source_near_smallest(spark, sf_dir):
    rows = q102_domain_mixture(spark, sf_dir).collect()
    cap = min(r["source_tokens"] for r in rows)
    for r in rows:
        # Expected kept tokens = cap (each source downsampled to the
        # smallest source's token count); hash draws are Bernoulli per
        # doc, so allow generous sampling slack around the target.
        assert r["kept_tokens"] <= r["source_tokens"]
        assert 0.3 * cap < r["kept_tokens"] < 2.2 * cap, (r, cap)
    # The smallest source keeps everything: rate == 1 exactly.
    smallest = [r for r in rows if r["source_tokens"] == cap]
    assert all(r["kept_tokens"] == cap for r in smallest)


def test_q103_vocab_ids_and_oov(spark, sf_dir):
    enc = q103_vocab_encode(spark, sf_dir)
    rows = enc.collect()
    # n_oov counts exactly the -1 ids; prefix ids are within [-1, V).
    for r in rows[:50]:
        ids = json.loads(r["ids_prefix"])
        assert all(-1 <= i < VOCAB_SIZE for i in ids)
        assert len(ids) == min(8, r["n_tokens"])
    # Deterministic across runs (vocab tie-break is total, not hash-order).
    again = {r["doc_id"]: r["ids_prefix"] for r in enc.collect()}
    assert all(again[r["doc_id"]] == r["ids_prefix"] for r in rows)


def test_q103_top_token_gets_id_zero(spark, sf_dir):
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    top = (
        docs.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .count()
        .orderBy(F.desc("count"), F.asc("tok"))
        .first()["tok"]
    )
    # Re-derive id 0's token by encoding a one-token probe through the
    # pipeline's vocab: cheapest check is that some doc whose first token
    # is `top` has prefix starting with 0.
    probe = (
        docs.where(F.element_at("toks", 1) == top)
        .select("doc_id")
        .first()
    )
    if probe is not None:
        row = (
            q103_vocab_encode(spark, sf_dir)
            .where(F.col("doc_id") == probe["doc_id"])
            .first()
        )
        assert json.loads(row["ids_prefix"])[0] == 0


# ---------------------------------------------------------------------------
# Distributed connected components (q46's engine).  The sf testdata
# converges in 2 rounds, so these synthetic graphs force the multi-round
# paths: a long chain (worst-case diameter), disjoint cliques (the
# LSH-dup shape), and a star colliding with a chain.  Oracle is a local
# union-find.
# ---------------------------------------------------------------------------
def _uf_groups(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


import pytest


@pytest.mark.parametrize(
    "name,edges",
    [
        ("chain", [(i, i + 1) for i in range(60)]),
        ("cliques", [(b + i, b + j) for b in (0, 100, 200)
                     for i in range(5) for j in range(i + 1, 5)]),
        ("star_plus_chain", [(0, i) for i in range(1, 20)]
                            + [(19, 50), (50, 51), (51, 52)]),
        ("two_pairs", [(7, 3), (10, 20)]),
    ],
)
def test_connected_components_matches_union_find(spark, name, edges):
    from tinymr_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["doc_id"]: r["group_id"] for r in connected_components(df).collect()}
    assert got == _uf_groups(edges), name


def test_q117_fingerprint_invariant_under_layout(spark, sf_dir):
    """The XOR fingerprint's whole purpose: identical content in any
    row order / partitioning produces the identical fingerprint."""
    import os
    import tempfile

    from tinymr_spark.operators.scale import doc_row_hash, q117_table_fingerprint

    base = {tuple(r) for r in q117_table_fingerprint(spark, sf_dir).collect()}

    # restage the same rows shuffled across 7 partitions in scrambled order
    docs = load_table(spark, sf_dir, "documents")
    out = os.path.join(tempfile.gettempdir(), "tinymr_fp_restage")
    docs.orderBy(F.md5(F.col("doc_id").cast("string"))).repartition(7).write.mode(
        "overwrite"
    ).parquet(out)
    restaged = spark.read.parquet(out)
    again = {
        tuple(r)
        for r in restaged.select("source", doc_row_hash().alias("rh"))
        .groupBy("source")
        .agg(F.count("*").alias("n_rows"), F.bit_xor("rh").alias("xor_fp"))
        .collect()
    }
    assert again == base


def test_q116_split_assignment_stable_under_growth(spark, sf_dir):
    """A doc's split must not depend on what else is in the corpus: the
    sf0.001 docs are a subset of sf0.01's id space formula-wise, and the
    assignment is a pure row function — verify directly that per-doc
    assignment matches between a full corpus and a filtered half."""
    from tinymr_spark.operators.text import SPLIT_TRAIN_PCT, SPLIT_VAL_PCT

    docs = load_table(spark, sf_dir, "documents")
    slot = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % 100
    )
    split = (
        F.when(slot < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(slot < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    full = {r["doc_id"]: r["s"] for r in docs.select("doc_id", split.alias("s")).collect()}
    half = {
        r["doc_id"]: r["s"]
        for r in docs.where(F.col("doc_id") % 2 == 0)
        .select("doc_id", split.alias("s"))
        .collect()
    }
    assert all(full[k] == v for k, v in half.items())
    assert set(full.values()) == {"train", "val", "test"}


def test_connected_components_self_loops(spark):
    """Self-loops add no connectivity, and a node whose ONLY edge is a
    self-loop is its own singleton component (the documented contract)."""
    from tinymr_spark.operators.dedup import connected_components

    edges = [(5, 5), (1, 2), (2, 2), (9, 9)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["doc_id"]: r["group_id"] for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}


def test_q123_incremental_dedup_status_branches(spark, tmp_path):
    """The driver corpus has no byte-identical duplicates, so the exact
    branches of the shard-vs-lake verdict never fire there; this synthetic
    corpus exercises every status with a known answer.  doc_id % 5 == 0 is
    the shard."""
    import duckdb
    import pandas as pd

    from tinymr_spark.operators.dedup import ORACLE_Q123, q123_incremental_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near = base.rsplit(" ", 2)[0] + " MUTATED"  # long shared prefix
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 5, 10, 15, 20, 25], dtype="int64"),
            "text": [
                base,                              # lake original
                "completely different words here entirely unrelated content",
                base,                              # shard: exact dup of lake 1
                "one two three four five six seven eight nine ten",  # shard
                "one two three four five six seven eight nine ten",  # shard: dup of 10
                "unique shard document with plenty of novel tokens inside",
                near,                              # shard: near-dup of lake 1
            ],
            "lang": ["en"] * 7,
            "source": ["t"] * 7,
            "n_chars": pd.Series([0] * 7, dtype="int64"),
        }
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    docs.to_parquet(sf + "/documents.parquet")

    got = {
        r["doc_id"]: (r["status"], r["ref_doc_id"])
        for r in q123_incremental_dedup(spark, sf).collect()
    }
    assert got[5] == ("exact_dup_lake", 1)
    assert got[15] == ("exact_dup_shard", 10)
    assert got[10][0] == "kept"
    assert got[20][0] == "kept"
    assert got[25] == ("near_dup_lake", 1)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS FROM read_parquet('{sf}/documents.parquet')")
    orows = {
        r[0]: (r[1], r[2]) for r in con.execute(ORACLE_Q123).fetchall()
    }
    assert got == orows


def test_q158_bpe_matches_pure_python_reference(spark, sf_dir):
    """Differential check of the distributed BPE learner against a
    straight-line pure-Python implementation (tuple-list symbol
    sequences, dict pair counting with multiplicity, greedy leftmost
    merge) on the real corpus — the same strategy the MapReduce face
    uses against the reference library.  This pins the SEMANTICS (the
    oracle twin pins only cross-engine agreement)."""
    from collections import Counter

    from tinymr_spark.operators.text import BPE_MERGES, q158_bpe_merges, with_tokens

    words = Counter()
    for row in (
        with_tokens(load_table(spark, sf_dir, "documents"))
        .select(F.explode("toks").alias("w"))
        .where(~F.col("w").contains("|"))
        .collect()
    ):
        words[row["w"]] += 1
    seqs = {w: tuple(w) for w in words}
    expected = []
    for step in range(1, BPE_MERGES + 1):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            f = words[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # argmax with the engine's tie-break: max count, then max (a, b)
        cnt, (a, b) = max((c, p) for p, c in counts.items())
        expected.append((step, a, b, cnt, a + b))
        merged = {}
        for w, syms in seqs.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[w] = tuple(out)
        seqs = merged
    got = [
        (r["step"], r["sym_a"], r["sym_b"], r["pair_count"], r["merged"])
        for r in q158_bpe_merges(spark, sf_dir).orderBy("step").collect()
    ]
    assert got == expected


def test_q160_pps_sample_hits_every_grid_point_exactly_once(spark, sf_dir):
    """The PPS sample must place exactly the grid's points: sum(n_hits)
    equals the number of grid points inside (0, total], and every
    selected document's weight interval contains its claimed number of
    points (recomputed independently in Python integers)."""
    from tinymr_spark.operators.scale import PPS_K, q160_weighted_sample

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.col("n_chars").cast("bigint").alias("w"))
        .where(F.col("w") > 0)
        .orderBy("doc_id")
        .collect()
    )
    total = sum(r["w"] for r in rows)
    step = max(total // PPS_K, 1)
    offset = step // 2
    # Count grid points the ENGINE can attribute — coordinates in
    # (0, total], via the engine's own g(x) = (x-offset+step) div step:
    # when step==1 (offset==0) the j=0 point sits at coordinate 0,
    # outside every half-open (cum_lo, cum_hi] interval, and must not be
    # counted.
    n_grid = (total - offset + step) // step - (0 - offset + step) // step
    got = {r["doc_id"]: r for r in q160_weighted_sample(spark, sf_dir).collect()}
    assert sum(r["n_hits"] for r in got.values()) == n_grid
    cum = 0
    for r in rows:
        lo, hi = cum, cum + r["w"]
        cum = hi
        hits = sum(
            1 for j in range((hi - offset) // step + 2) if lo < offset + j * step <= hi
        )
        if hits:
            sel = got.get(r["doc_id"])
            assert sel is not None and sel["n_hits"] == hits and sel["cum_lo"] == lo
        else:
            assert r["doc_id"] not in got
