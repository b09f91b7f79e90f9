"""Interleaved A/B for the _ivf_assigned codebook localCheckpoint (r15).

One warm Spark session; alternates reps of q54/q57 with the checkpoint ON
and OFF so both variants sample the same box-speed phases (the repo's
established interleave procedure for this oscillating sandbox).  Timing is
construct + noop sink (and construct + count), matching the bench's
construct-inside-the-timed-region methodology — the checkpoint moves work
into an eager construct-time job, so timing the action alone would flatter
it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import __spark_entry__ as entrymod
    from tinymr_spark.operators import similarity
    from tinymr_spark.session import get_session

    spark = get_session(app_name="ab-ivf-checkpoint")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    targets = ["q54_ann_ivf", "q57_kmeans_iteration"]

    # The checkpoint/dup toggle lives HERE, not in production code
    # (VERDICT r15 hygiene): rebind the module's _ivf_assigned so q54/q57
    # construct against the chosen variant.
    _orig_ivf_assigned = similarity._ivf_assigned

    def _set_variant(flag: bool) -> None:
        similarity._ivf_assigned = (
            _orig_ivf_assigned
            if flag
            else (lambda s, d: _orig_ivf_assigned(s, d, _checkpoint=False))
        )

    # Warm both variants at the tiny SF (codegen priming for both shapes).
    for flag in (True, False):
        _set_variant(flag)
        for t in targets:
            qs[t](spark, "/root/testdata/sf0.001").count()

    def spin() -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(20_000_000):
            x += i
        return round(time.perf_counter() - t0, 3)

    out: dict = {"sf": sf_dir, "rows": {}, "spin": []}
    for rnd in range(rounds):
        out["spin"].append(spin())
        for flag in (True, False):
            _set_variant(flag)
            key = "ckpt" if flag else "dup"
            for t in targets:
                sc.setJobDescription(f"ab {t} {key} r{rnd}")
                t0 = time.perf_counter()
                df = qs[t](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                noop = round(time.perf_counter() - t0, 4)
                t0 = time.perf_counter()
                qs[t](spark, sf_dir).count()
                cnt = round(time.perf_counter() - t0, 4)
                row = out["rows"].setdefault(t, {}).setdefault(
                    key, {"noop": [], "count": []}
                )
                row["noop"].append(noop)
                row["count"].append(cnt)
    out["spin"].append(spin())
    sc.setJobDescription(None)

    for t, variants in out["rows"].items():
        for key, row in variants.items():
            print(
                f"{t:24s} {key:5s} noop_min={min(row['noop']):6.2f} "
                f"count_min={min(row['count']):6.2f}  noop={row['noop']} count={row['count']}"
            )
    print("spin samples:", out["spin"])
    path = "/root/repo/plans/r15/measure_ab_ivf_checkpoint.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
