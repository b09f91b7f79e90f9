"""Head-to-head throughput: the reference engine vs this one, same data.

The build goal is "matches-or-beats the reference's single-node
throughput at the same data scale".  The reference publishes no numbers
(BASELINE.md), so this race produces them: word count — the reference's
flagship query (docs.rst:137-159) — over the documents table at the
given SF, run through

  1. the reference itself, serial (`tinymr.py` imported read-only),
  2. the reference with its own multiprocessing pool path
     (docs.rst:309-331, `mapper_map=Pool.imap_unordered`),
  3. our MapReduce face (identical user code, lowered to RDDs), and
  4. our DataFrame lowering (q30: explode + groupBy, the idiomatic form).

Timings exclude interpreter/JVM startup (both engines' fixed costs are
paid before the clock starts; bench.py applies the same policy) and are
min-of-N wall seconds.  Results land in the table printed at the end —
paste into BASELINE.md when they move.

Usage: python tools/reference_race.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import pyarrow.parquet as pq

import tinymr as reference  # noqa: E402  (read-only behavioral baseline)


class RefWordCount(reference.MapReduce):
    def mapper(self, item):
        for w in item.lower().split():
            yield w, 1

    def reducer(self, key, values):
        yield key, sum(values)


def _our_wordcount_cls():
    from tinymr_spark import MapReduce as OurMR

    class OurWordCount(OurMR):
        def mapper(self, item):
            for w in item.lower().split():
                yield w, 1

        def reducer(self, key, values):
            yield key, sum(values)

    return OurWordCount


def _our_wordcount_combine_cls():
    from tinymr_spark import MapReduce as OurMR

    class OurWordCountCombine(OurMR):
        combine = True  # associative return-style reducer -> map-side combine
        local_threshold = 0  # always measure the distributed path

        def mapper(self, item):
            for w in item.lower().split():
                yield w, 1

        def reducer(self, key, values):
            return key, sum(values)

    return OurWordCountCombine


def _race(label, fn, reps):
    best, result = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        result = fn()
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    print(f"{label:44s} {best:8.3f}s")
    return best, result


def _df_wordcount(spark, df):
    from pyspark.sql import functions as F

    return (
        df.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .count()
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    scales = [int(s) for s in (sys.argv[3].split(",") if len(sys.argv) > 3 else [1, 20, 50])]

    base_texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()

    import multiprocessing as mp

    from tinymr_spark.session import get_session

    spark = get_session(app_name="reference-race")
    spark.sparkContext.setLogLevel("ERROR")
    OurWordCount = _our_wordcount_cls()
    # Warm the DISTRIBUTED machinery (executor Python workers, codegen):
    # local_threshold must be 0 here or the tiny warm input takes the
    # in-process fast path and the first timed row pays worker spawn.
    warm_cls = _our_wordcount_combine_cls()
    warm_cls()(base_texts[:50])
    warm_plain = type("Warm", (OurWordCount,), {"local_threshold": 0})
    warm_plain()(base_texts[:50])

    for scale in scales:
        texts = base_texts * scale
        mb = sum(map(len, texts)) / 1e6
        print(f"\n=== {len(texts)} docs, {mb:.1f} MB text ({sf_dir} x{scale}) ===")
        results = {}

        RefWordCount()(texts)  # steady-state warm-up, same policy as ours
        results["reference_serial"], ref_out = _race(
            "reference serial", lambda: RefWordCount()(texts), reps
        )

        with mp.Pool(os.cpu_count()) as pool:
            # The reference's own concurrency story: pooled mapper
            # (docs.rst:309-331) with a sane chunksize.
            def pooled():
                chunk = max(1, len(texts) // (os.cpu_count() * 4))
                return RefWordCount()(
                    texts, mapper_map=lambda f, it: pool.imap_unordered(f, it, chunk)
                )

            results["reference_pooled"], pooled_out = _race(
                f"reference pooled ({os.cpu_count()} procs)", pooled, reps
            )
        assert dict(pooled_out) == dict(ref_out), "reference pooled path diverged"

        results["ours_mr_face"], our_out = _race(
            "ours: MapReduce face (incl. parallelize)",
            lambda: OurWordCount()(texts),
            reps,
        )
        assert dict(our_out) == dict(ref_out), "MR face diverged from reference"

        OurWordCountCombine = _our_wordcount_combine_cls()
        results["ours_mr_combine"], comb_out = _race(
            "ours: MR face, combine=True (O(keys) shuffle)",
            lambda: OurWordCountCombine()(texts),
            reps,
        )
        assert dict(comb_out) == {k: v[0] for k, v in dict(ref_out).items()}

        sdf = spark.createDataFrame([(t,) for t in texts], "text string").persist()
        sdf.count()  # materialize: input resident like the in-RAM python list
        results["ours_dataframe"], _ = _race(
            "ours: DataFrame lowering (resident input)",
            lambda: _df_wordcount(spark, sdf).count(),
            reps,
        )
        sdf.unpersist()

        base = results["reference_serial"]
        print("speedup vs reference serial:")
        for k, v in results.items():
            print(f"  {k:24s} {base / v:6.2f}x")


if __name__ == "__main__":
    main()
