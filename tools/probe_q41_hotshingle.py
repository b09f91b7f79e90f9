"""Hot-shingle scaling probe for q41 (VERDICT r13 task 4 done-criterion).

Stages K-times-scaled copies of sf0.1 `documents` with:

* per-copy-UNIQUE tokens (every token suffixed with the copy id), so
  each copy contributes its own shingles and pairs — work and output
  scale LINEARLY by construction, the honest way to scale a pair-based
  operator (the main scaling_probe deliberately excludes dedup because
  naive row copies change the answer quadratically);
* a DELIBERATELY HOT boilerplate sentence appended to every document in
  every copy — its pure-interior 3-gram shingles have df = total corpus
  size, exactly the d^2 bucket HOT_SHINGLE_DF_CAP exists to suppress
  (at 25x that bucket alone would be ~125k^2/2 = 7.8e9 candidate pairs).

Prints min-of-2 wall times at 1x/5x/25x; sub-linear per-doc time (ratio
growth <= copy growth) is the pass signal.  Run on an idle box.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
STAGE_ROOT = "/tmp/tinymr_spark_q41_hotshingle"
BOILER = " all rights reserved worldwide respectively"
COPIES = (1, 5, 25)


def stage(spark, n_copies: int) -> str:
    from pyspark.sql import functions as F

    out = f"{STAGE_ROOT}_{n_copies}x"
    done = os.path.join(out, "_done")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    parts = []
    for c in range(n_copies):
        parts.append(
            docs.select(
                (F.col("doc_id") + c * 1_000_000_000).alias("doc_id"),
                F.concat(
                    F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{c}"),
                    F.lit(BOILER),
                ).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + len(BOILER)).alias("n_chars"),
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    union.repartition(32).write.parquet(os.path.join(out, "documents.parquet"))
    open(done, "w").close()
    return out


def main() -> None:
    from tinymr_spark.operators.dedup import q41_dedup_jaccard
    from tinymr_spark.session import get_session

    spark = get_session(app_name="probe-q41-hotshingle")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in COPIES:
        sf_dir = stage(spark, n)
        q41_dedup_jaccard(spark, sf_dir).count()  # warm codegen/workers
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            cnt = q41_dedup_jaccard(spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        rows.append((n, min(ts), cnt))
        print(f"{n:3d}x  min {min(ts):7.2f} s   pairs={cnt}")
    t1 = rows[0][1]
    for n, t, _ in rows[1:]:
        print(f"ratio {n}x/1x: {t / t1:.2f} (copies grew {n}x)")
    spark.stop()


if __name__ == "__main__":
    main()
