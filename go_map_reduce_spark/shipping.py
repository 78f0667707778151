"""Ship the go_map_reduce_spark package to Python workers.

Functions defined inside this package (parity map/reduce fns, pandas
UDFs) are pickled **by reference** — the worker re-imports their module.
That works only if the package is importable on the worker, which is
true when the driver's cwd happens to be the repo root and false
otherwise (observed: ModuleNotFoundError from an executor when the
driver ran elsewhere). The fix is the standard Spark mechanism: zip the
package and ``addPyFile`` it once per SparkContext — exactly what
spark-submit --py-files would do on a real cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_gmrs_pyfiles_shipped"


def ensure_package_shipped(spark: SparkSession) -> None:
    """Idempotently add a zip of this package to the SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="gmrs_pyfiles_"), "go_map_reduce_spark.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "go_map_reduce_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    sc.addPyFile(zpath)
    setattr(sc, _SHIPPED_ATTR, True)
