"""Ship the package to executors — the spark-submit --py-files pattern.

UDF closures reference ``fingerprint_spark``; Python workers must be able
to import it regardless of the driver's cwd/sys.path. ``ensure_pyfiles``
zips the package (mtime-gated, atomic rename) and registers it with
``sc.addPyFile`` once per SparkContext. ``session.get_spark`` calls this
automatically; users with their own SparkSession call it directly.

On a real cluster the same zip is what you pass to
``spark-submit --py-files`` (north_rule deployment shape).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PYFILES_ZIP = os.path.join(
    tempfile.gettempdir(), "fingerprint_spark_pyfiles.zip"
)


def build_pyfiles_zip(path: str = _PYFILES_ZIP) -> str:
    """Zip the package for worker-side import (idempotent, mtime-gated)."""
    sources = []
    for root, _dirs, files in os.walk(_PKG_DIR):
        for f in sorted(files):
            if f.endswith(".py"):
                sources.append(os.path.join(root, f))
    newest = max(os.path.getmtime(s) for s in sources)
    if not os.path.exists(path) or os.path.getmtime(path) < newest:
        tmp = path + f".tmp{os.getpid()}"
        parent = os.path.dirname(_PKG_DIR)
        with zipfile.ZipFile(tmp, "w") as z:
            for s in sources:
                z.write(s, os.path.relpath(s, parent))
        os.replace(tmp, path)
    return path


def ensure_pyfiles(spark: SparkSession) -> None:
    """addPyFile once per SparkContext."""
    sc = spark.sparkContext
    if not getattr(sc, "_fingerprint_spark_pyfiles", False):
        sc.addPyFile(build_pyfiles_zip())
        sc._fingerprint_spark_pyfiles = True
