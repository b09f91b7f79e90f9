"""Round-15 drift adjudication (VERDICT r14 task 3).

Re-measures q172 k-core — the one BENCH_r14 mover the r14 round did not
explicitly adjudicate (driver 2.17 -> 3.38, samples [3.38, 9.35]: the
wide-spread contention signature) — idle-box at sf0.1, interleaved
min-of-3, per the procedure BASELINE.md has used since round 5: warm
each plan once at sf0.001 (codegen cache), then three timed passes over
the mover set in round-robin order so a contention spike cannot land on
the same query every pass.  q146 pagerank and q136 python-stream-source
ride along as the documented noisiest-row references (localCheckpoint /
micro-batch floors) to contextualize the box state.  Prints one JSON
line with per-query min/all-samples for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOVERS = [
    "q172_kcore_peel",             # 2.17 -> 3.38 driver; samples [3.38, 9.35]
    "q146_pagerank",               # noisiest-row reference (localCheckpoint jobs)
    "q136_python_stream_source",   # oscillating micro-batch floor reference
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from tinymr_spark.session import get_session

    spark = get_session(app_name="tinymr-spark-adjudicate-r15")
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

    try:
        load = tuple(round(x, 2) for x in os.getloadavg())
    except OSError:
        load = None
    out = {
        "procedure": "idle-box interleaved min-of-3, sf0.1, warm codegen",
        "mins": {n: min(s) for n, s in samples.items()},
        "samples": samples,
        "loadavg_at_end": load,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
