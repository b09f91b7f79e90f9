"""SparkSession bootstrap with scale-oriented defaults.

The reference has no session concept (execution is ``MapReduce.__call__``
on the calling thread, /root/reference/tinymr.py:156-230); here the
session is the unit of resource lifecycle.  Defaults are chosen for the
driver environment (local[32], 128 GiB) but express cluster-safe policy:
AQE on (runtime re-planning, skew-join handling, partition coalescing),
modest broadcast threshold, UTC session timezone so timestamp semantics
match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def _ensure_worker_pythonpath() -> None:
    """Make the tinymr_spark package importable in executor python workers.

    Task closures (MapReduce subclasses) are unpickled by module reference
    on workers; if the package was imported from a directory not on the
    workers' PYTHONPATH, every task fails with ModuleNotFoundError.  Must
    run before the JVM starts (workers inherit the driver environment in
    local mode; on a cluster, ship the package with --py-files instead).
    """
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    current = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = os.pathsep.join(p for p in (pkg_parent, current) if p)


def ensure_shipped(spark) -> None:
    """Make `tinymr_spark` importable on executor Python workers for a
    session THIS package did not create.

    RDD task closures (MapReduce subclasses, the union-find contraction)
    unpickle by module reference on workers; a harness that builds its own
    SparkSession never ran `_ensure_worker_pythonpath`, so those tasks die
    with ModuleNotFoundError.  `addPyFile` ships a zip of the package with
    every task and prepends it to the worker's sys.path — works after JVM
    start, on any session, local or cluster (the --py-files mechanism).
    Idempotent per SparkContext; rebuilt zip per driver process.
    Accepts a SparkSession or a bare SparkContext.
    """
    sc = getattr(spark, "sparkContext", spark)
    if getattr(sc, "_tinymr_spark_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"tinymr_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(root, fname)
                        rel = os.path.join(
                            "tinymr_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._tinymr_spark_shipped = True


def get_session(app_name: str = "tinymr-spark", cpus: str | None = None) -> SparkSession:
    """Return the active SparkSession, creating one if needed."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    _ensure_worker_pythonpath()
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # this is what turns a static 32-partition plan into a sane one.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Scale-adaptive: AQE coalesces below this at runtime; a cluster
        # deployment raises it via env (~2-3x total cores) without a code
        # edit. Local default unchanged so bench numbers stay comparable.
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get(
                "SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS
            ),
        )
        # Dimension tables (region/nation/supplier/part) should broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for pandas UDF / toPandas hot paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (4.1 feature flag, default
        # off): a reader implementing pushFilters() REFUSES to plan at
        # all while this is false, so the flag is part of the source's
        # contract, not an optimization toggle (synthevents pushes
        # row_id bounds + kind equality into generation).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Default codegen class cache (100 entries) thrashes when ~70
        # distinct query plans run in one session: whole-stage units
        # evicted mid-run recompile multi-second pipelines (janino compile
        # of the shingle/md5 stages alone is ~3-4s).  Static conf — must
        # be set before the first session.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.sql.session.timeZone", "UTC")
        # Read parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) as regular
        # TimestampType instead of TIMESTAMP_NTZ: keeps ts filters pushable
        # at the scan (no cast projection) and watermark/unix_micros legal.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        # local mode = ONE JVM for driver + all 32 executor threads; an
        # undersized heap turns the shuffle-heavy queries into GC storms
        # (measured: multi-second per-query variance at 16g, stable at 48g).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    return builder.getOrCreate()
