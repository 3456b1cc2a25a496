"""Package distribution to executors.

Python UDFs are pickled by reference (module + qualname), so executor-side
Python workers must be able to import ``logicaldecoding_spark`` regardless of
the driver's working directory.  ``ship_package`` zips this package and
registers it via ``SparkContext.addPyFile`` — the same mechanism
``spark-submit --py-files`` uses, made self-serve for library consumers.
Idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def package_zip(dest_dir: str | None = None) -> str:
    """Build (or reuse) a zip of the logicaldecoding_spark package."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    dest = os.path.join(dest_dir or tempfile.gettempdir(), "logicaldecoding_spark.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    return dest


def ship_package(spark: SparkSession) -> None:
    """Make the package importable on executor Python workers."""
    ctx_id = spark.sparkContext.applicationId
    if ctx_id in _SHIPPED:
        return
    spark.sparkContext.addPyFile(package_zip())
    _SHIPPED.add(ctx_id)
