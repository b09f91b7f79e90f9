"""Decompose the heavy streaming rows (guide §1): where do q122 / q124 /
q171 / q136 actually spend their seconds?

Replicates each query's body with phase timers and captures
StreamingQueryProgress (durationMs per micro-batch) so the cost splits
into: staging / query start / per-batch addBatch / offset+commit log /
final read.  Pure measurement — no behavior change.

Usage: python tools/probe_stream_decomp.py [q122 q124 q171 q136]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def spin() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return round(time.perf_counter() - t0, 3)


def probe_q122(spark, sf_dir):
    """Time q122's phases; the query itself is untouched."""
    from tinymr_spark import streaming as S

    out = {}
    t0 = time.perf_counter()
    S._staged_event_files(spark, sf_dir)  # warm staging (cached after 1st)
    out["staging"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    df = S.q122_stream_upsert_sink(spark, sf_dir)
    out["construct+run"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    df.count()
    out["final_count"] = round(time.perf_counter() - t0, 3)
    return out


def probe_q124(spark, sf_dir):
    from tinymr_spark import streaming as S

    out = {}
    t0 = time.perf_counter()
    S._staged_event_files(spark, sf_dir)
    out["staging"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    df = S.q124_stream_delta_compact(spark, sf_dir)
    out["construct+run"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    df.count()
    out["final_count"] = round(time.perf_counter() - t0, 3)
    return out


def probe_q122_batches(spark, sf_dir):
    """Re-run q122's streaming part manually to capture per-batch metrics
    and the time split between the stream machinery and the foreachBatch
    body (which runs driver-side between addBatch bookends)."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from tinymr_spark import streaming as S

    stage = S._staged_event_files(spark, sf_dir)
    out_dir = os.path.join(
        S._staging_root("tinymr_spark_upsert_probe"),
        hashlib.md5(stage.encode()).hexdigest(),
    )
    S._pre_stream_cleanup(spark)
    shutil.rmtree(out_dir, ignore_errors=True)
    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
        .where(F.col("event_type") == "view")
        .select("user_id", "ts", "event_id", "value")
    )
    latest = F.max(F.struct("ts", "event_id", "value")).alias("m")
    batch_times = []

    def upsert(batch_df, batch_id):
        bt0 = time.perf_counter()
        sess = batch_df.sparkSession
        inc = batch_df.groupBy("user_id").agg(F.count("*").alias("n_updates"), latest)
        prev_versions = sorted(
            v
            for d in (os.listdir(out_dir) if os.path.isdir(out_dir) else [])
            if d.startswith("v") and (v := int(d[1:])) < batch_id
        )
        if prev_versions:
            prev = sess.read.parquet(os.path.join(out_dir, f"v{prev_versions[-1]}"))
            merged = (
                prev.unionByName(inc)
                .groupBy("user_id")
                .agg(F.sum("n_updates").alias("n_updates"), F.max("m").alias("m"))
            )
        else:
            merged = inc
        merged.write.mode("overwrite").parquet(os.path.join(out_dir, f"v{batch_id}"))
        batch_times.append(round(time.perf_counter() - bt0, 3))

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    t0 = time.perf_counter()
    q = (
        stream.writeStream.foreachBatch(upsert)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = round(time.perf_counter() - t0, 3)
    progress = [json.loads(p.json) for p in q.recentProgress]
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    S._unload_state_stores(spark)
    return {
        "stream_total": total,
        "foreachBatch_bodies": batch_times,
        "foreachBatch_sum": round(sum(batch_times), 3),
        "batches": [
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
            }
            for p in progress
        ],
    }


def probe_q171(spark, sf_dir):
    import uuid

    from tinymr_spark import streaming as S
    from tinymr_spark.sources import minitable_stream

    # staging warmed by a prior full call
    out = {}
    t0 = time.perf_counter()
    df = S.q171_stream_table_source(spark, sf_dir)
    out["construct+run"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    df.count()
    out["final_count"] = round(time.perf_counter() - t0, 3)

    # decompose: stream-to-memory alone (no aggregate), then agg alone
    minitable_stream.register(spark)
    S._pre_stream_cleanup(spark)
    from tinymr_spark.sources import table_path, versioned_staging_dir

    src = table_path(sf_dir, "orders")
    table = versioned_staging_dir("tinymr_spark_minitable_cdf", src)
    view = f"probe_feed_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("tinymr_minitable_stream")
        .option("path", table)
        .option("columns", "o_orderkey,o_custkey,o_orderpriority,o_totalprice")
        .load()
    )
    t0 = time.perf_counter()
    q = (
        stream.writeStream.format("memory")
        .queryName(view)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out["stream_to_memory"] = round(time.perf_counter() - t0, 3)
    out["progress"] = [
        {
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "durationMs": p.durationMs,
        }
        for p in q.recentProgress
    ]
    t0 = time.perf_counter()
    spark.table(view).count()
    out["memory_count"] = round(time.perf_counter() - t0, 3)
    return out


def probe_q136(spark, sf_dir):
    from tinymr_spark import streaming as S

    out = {}
    t0 = time.perf_counter()
    df = S.q136_python_stream_source(spark, sf_dir)
    out["construct+run"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    df.count()
    out["final_count"] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    names = sys.argv[1:] or ["q122", "q122b", "q124", "q171", "q136"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tinymr_spark.session import get_session

    spark = get_session(app_name="tinymr-probe-stream")
    spark.sparkContext.setLogLevel("ERROR")
    print("spin_preflight", spin())
    res = {"spin_preflight": spin()}
    fns = {
        "q122": probe_q122,
        "q122b": probe_q122_batches,
        "q124": probe_q124,
        "q171": probe_q171,
        "q136": probe_q136,
    }
    for n in names:
        spark.sparkContext.setJobDescription(f"stream-decomp {n}")
        res[n] = fns[n](spark, sf_dir)
        print(n, json.dumps(res[n]))
    res["spin_post"] = spin()
    print("spin_post", res["spin_post"])
    with open("/root/repo/plans/r15/measure_stream_decomp.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
