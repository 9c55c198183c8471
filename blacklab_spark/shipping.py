"""Ship the package to Spark executors (`spark-submit --py-files` at
runtime). Python workers deserializing our Arrow kernels must import
``blacklab_spark`` on their side; when the driver imported it by path
(foreign cwd, driver harness), workers would fail without this."""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def make_pkg_zip(zip_path: str) -> str:
    """Write the package as a ``--py-files`` zip (the artifact a
    ``spark-submit --py-files blacklab_spark.zip`` launch ships to the
    driver and every executor)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join("blacklab_spark",
                                       os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    return zip_path


def ship(spark: SparkSession) -> None:
    key = id(spark)
    if key in _SHIPPED:
        return
    zip_path = os.path.join("/tmp", f"blacklab_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        make_pkg_zip(zip_path)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)
