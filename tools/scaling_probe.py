"""Empirical scaling probe: do the heavy operators scale linearly?

Stages a 5x copy of the big tables (lineitem / orders / customer /
events) in /tmp by unioning key-offset copies — offsets keep join keys
consistent within a copy and disjoint across copies, so query semantics
(join fan-out, group counts) scale linearly by construction.  Then times
a battery of shuffle-heavy queries at sf0.1 and at 5x and reports the
wall-time ratio.  A ratio near 5 (or below, when fixed overhead
amortizes) is evidence the plan is data-linear; a super-linear ratio
flags an operator that would not survive a 100x scale-up.

Small dims (region/nation/supplier/part/documents/embeddings) are
symlink-copied unscaled: they are broadcast sides, and scaling them 5x
would change dedup/ANN pair SEMANTICS (quadratic output), not engine
behavior.

Usage: python tools/scaling_probe.py   (~2-3 min; prints a table)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

N_COPIES = 5
BASE = "/root/testdata/sf0.1"
STAGE = "/tmp/tinymr_spark_scale5x"

SCALED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
}
KEY_OFFSET = 1_000_000_000

BATTERY = [
    "q01_pricing_summary",
    "q04_star_join_revenue",
    "q07_global_topk",
    "q08_window_rank",
    "q13_distinct_agg",
    "q26_salted_agg",
    "q89_monthly_gapfill",
    "q70_tumbling_window",
    "q72_sessionize",
    "q77_funnel",
    "q78_retention",
    # corpus ops that are LINEAR in documents (not pair-based, so a 5x
    # doc copy scales work without changing output semantics; the
    # dedup/ANN family stays excluded — 5x dups would change the answer
    # quadratically, not the engine behavior)
    "q101_sequence_packing",
    "q103_vocab_encode",
    "q108_scd2_history",      # per-user ordered window, linear in events
    "q109_unigram_logprob",   # vocab counts shift 5x but work is per-token linear
    "q116_train_val_split",   # row-pure assignment + tiny agg
    "q117_table_fingerprint", # one scan, XOR merge
    # round-5 linear additions (q123/q127 stay excluded with the rest of
    # the pair-based dedup family — 5x identical doc copies are
    # cross-copy near-dups, a semantic blowup not an engine one; q128's
    # session result cache would make the timed warm run a no-op)
    "q125_bm25_topk",          # warm probe against the cached index
    "q126_shard_manifest",     # row-pure keys + one agg
    "q129_map_in_arrow",       # Arrow batch transform, per-doc linear
    "q130_zorder_layout",      # per-row bit math + one agg
    "q131_histogram_quantiles", # per-event counters
    "q132_countmin_sketch",    # per-token counters
    "q133_snapshot_diff",      # row-hash full-outer join, per-doc linear
    "q134_bloom_semi_join",    # build+probe both key-linear
    # round-7 linear additions (q157/q159 stay excluded with the
    # pair-based dedup family)
    "q158_bpe_merges",         # corpus pass linear; iterations run on the
                               # distinct-word table, which 5x IDENTICAL
                               # copies leave unchanged — expect strongly
                               # sub-linear (the design claim itself)
    "q160_weighted_sample",    # two-phase cumsum, per-doc linear
]


def stage(spark):
    from pyspark.sql import functions as F

    from tinymr_spark.sources import load_table

    done = os.path.join(STAGE, "_STAGED")
    if os.path.exists(done):
        return
    os.makedirs(STAGE, exist_ok=True)
    for name, keys in SCALED.items():
        df = load_table(spark, BASE, name)
        copies = []
        for i in range(N_COPIES):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(STAGE, f"{name}.parquet"))
    # documents scale too (doc_id offset keeps ids disjoint): the probe's
    # corpus queries (q101/q103) are per-doc linear, and no battery query
    # does cross-doc pairing on documents.
    docs = load_table(spark, BASE, "documents")
    dcopies = []
    for i in range(N_COPIES):
        dcopies.append(docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_OFFSET)))
    dout = dcopies[0]
    for c in dcopies[1:]:
        dout = dout.unionByName(c)
    dout.write.mode("overwrite").parquet(os.path.join(STAGE, "documents.parquet"))
    for name in (
        "region nation supplier part embeddings".split()
    ):
        src = os.path.join(BASE, f"{name}.parquet")
        dst = os.path.join(STAGE, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)
    open(done, "w").close()


def main():
    import __spark_entry__ as entrymod
    from tinymr_spark.session import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    stage(spark)
    qs = entrymod.queries()
    print(f"{'query':28s} {'sf0.1':>8s} {'5x':>8s} {'ratio':>6s}")
    worst = 0.0
    for name in BATTERY:
        fn = qs[name]
        fn(spark, BASE).count()  # warm plan
        t0 = time.perf_counter()
        fn(spark, BASE).count()
        t_base = time.perf_counter() - t0
        fn(spark, STAGE).count()  # warm 5x plan/stats
        t0 = time.perf_counter()
        fn(spark, STAGE).count()
        t_5x = time.perf_counter() - t0
        ratio = t_5x / t_base if t_base > 0 else float("inf")
        worst = max(worst, ratio)
        print(f"{name:28s} {t_base:8.2f} {t_5x:8.2f} {ratio:6.2f}")
    print(f"\nworst ratio: {worst:.2f} (linear scaling target: <= {N_COPIES}"
          f" + fixed-overhead amortization typically pushes it below)")
    return 0 if worst <= N_COPIES * 1.5 else 1


if __name__ == "__main__":
    sys.exit(main())
