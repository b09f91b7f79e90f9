"""Round-14 drift adjudication (VERDICT r13 tasks 2 and 7).

Re-measures the BENCH_r13 movers idle-box at sf0.1, interleaved
min-of-3, per the procedure BASELINE.md has used since round 5:
warm each plan once at sf0.001 (codegen cache), then three timed
passes over the whole mover set in round-robin order so a contention
spike cannot land on the same query every pass.  Prints one JSON line
with per-query min/all-samples for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOVERS = [
    "q98_stream_stream_join",      # 2.81 -> 4.04 driver (+44%)
    "q161_embedding_covariance",   # 0.77 -> 1.78 (+131%)
    "q200_zorder_verb",            # 0.73 -> 1.54 (+111%)
    "q193_table_history",          # 0.65 -> 1.28 (+97%)
    "q41_dedup_jaccard",           # 1.49 -> 2.06 (+38%)
    "q171_stream_table_source",    # 2.92 -> 3.51 (+20%)
    "q99_stream_dedup_bounded",    # 1.60 -> 2.14 (+34%)
    "q146_pagerank",               # task 7: re-pin the K=3 cadence win (r13 idle 2.32)
    "q136_python_stream_source",   # the documented oscillating floor row (context)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from tinymr_spark.session import get_session

    spark = get_session(app_name="tinymr-spark-adjudicate-r14")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    movers = {name: qs[name] for name in MOVERS}

    warm_sf = "/root/testdata/sf0.001"
    spark.sparkContext.parallelize(range(64), 32).map(lambda x: x).count()
    for name, fn in movers.items():
        fn(spark, warm_sf).count()

    samples: dict[str, list[float]] = {name: [] for name in movers}
    for _pass in range(3):
        for name, fn in movers.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples[name].append(round(time.perf_counter() - t0, 3))

    out = {
        "procedure": "idle-box interleaved min-of-3, sf0.1, warm codegen",
        "mins": {n: min(s) for n, s in samples.items()},
        "samples": samples,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
