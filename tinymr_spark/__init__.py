"""tinymr-spark: a PySpark-native analytics engine with tinymr's capabilities.

Two faces share one SparkSession:

1. ``tinymr_spark.MapReduce`` — a drop-in replacement for the reference's
   ``tinymr.MapReduce`` ABC (/root/reference/tinymr.py:27-230).  Same
   subclass contract (``mapper``/``reducer``/``output`` + four sort
   properties), same tuple IR, same sort/tie/collision semantics — but the
   shuffle is Spark's distributed shuffle instead of an in-memory
   ``defaultdict`` (/root/reference/tinymr.py:332-334), so datasets no
   longer need to fit in one process's RAM.

2. ``tinymr_spark.operators`` / ``functions`` / ``sources`` / ``streaming``
   — first-class DataFrame operators (joins, window functions, grouping
   sets, dedup, similarity search, text analysis, streaming windows) that
   the reference can only express as hand-written mapper/reducer code.
   These stay in Catalyst/Tungsten land for 100 TB-scale execution.
"""

import importlib.metadata

from tinymr_spark.mapreduce import ElementCountError, MapReduce
from tinymr_spark.session import get_session

# Resolve the installed version like the reference does
# (/root/reference/tinymr.py:17-24); fall back to the in-tree version when
# the package is just copied onto a path and has no metadata.
try:
    __version__ = importlib.metadata.version("tinymr-spark")
except importlib.metadata.PackageNotFoundError:
    __version__ = "0.1.0"

__all__ = ["ElementCountError", "MapReduce", "get_session", "__version__"]
