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
    """Build (or reuse) a deterministic zip of the logicaldecoding_spark
    package (fixed timestamps + sorted entries: same sources => same bytes,
    so addPyFile never conflicts with a --py-files copy of the same build)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    dest = os.path.join(dest_dir or tempfile.gettempdir(), "logicaldecoding_spark.zip")
    entries = []
    for dirpath, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, root), full))
    entries.sort()
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, full in entries:
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as f:
                z.writestr(info, f.read())
    return dest


def ship_package(spark: SparkSession) -> None:
    """Make the package importable on executor Python workers.

    No-op when a --py-files / prior addPyFile copy is already registered."""
    ctx_id = spark.sparkContext.applicationId
    if ctx_id in _SHIPPED:
        return
    sc = spark.sparkContext
    try:
        listed = sc._jsc.sc().listFiles()
        for i in range(listed.size()):
            if "logicaldecoding_spark.zip" in str(listed.apply(i)):
                _SHIPPED.add(ctx_id)
                return
    except Exception:
        pass  # private-API probe failed: fall through to addPyFile
    sc.addPyFile(package_zip())
    _SHIPPED.add(ctx_id)
