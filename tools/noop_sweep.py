"""Full-registry noop-vs-count comparison (round-15 optimization, guide §1.4).

The bench times `count()`, which lets Catalyst prune output columns; the
noop sink evaluates EVERY column of every row — the honest full cost.  A
query whose noop time far exceeds its count time is hiding per-row
compute from the bench (q41's n_sh recompute was found exactly this
way).  One pass each at the given SF on a warm plan (per-query sf0.001
warm-up); flags ratio > 2 at delta > 0.75s.

Usage: python tools/noop_sweep.py [sf_dir] [out_json]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "plans/r15/noop_sweep.json"
    import __spark_entry__ as entrymod
    from tinymr_spark.session import get_session

    spark = get_session(app_name="noop-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    rows = {}
    for name, fn in qs.items():
        try:
            fn(spark, "/root/testdata/sf0.001").count()  # warm codegen/caches
        except Exception:
            pass
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            t_count = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t_noop = time.perf_counter() - t0
        except Exception as e:
            print(f"# error {name}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        rows[name] = {"count": round(t_count, 3), "noop": round(t_noop, 3)}
        flag = " <== HIDDEN" if (t_noop > 2 * t_count and t_noop - t_count > 0.75) else ""
        print(f"{name:34s} count={t_count:6.2f} noop={t_noop:6.2f}{flag}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"sf": sf_dir, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
