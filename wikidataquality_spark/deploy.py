"""Ship the package to Spark Python workers (the spark-submit --py-files story).

BASELINE.json:6 deploys via `spark-submit --py-files`; when the engine is
instead imported into an existing SparkSession (the driver-harness path, or a
notebook), the Python workers spawned for pandas UDFs need the package on
their import path — the driver's sys.path does NOT propagate. ensure_shipped()
zips the package once and registers it with sc.addPyFile, which is exactly
what --py-files does at submit time.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def package_zip() -> str:
    """Zip wikidataquality_spark/ (source + model artifacts, deterministic
    order). The frozen LM .npz ships with the code — workers load it via
    pkgutil so the zip-import path works (operators/perplexity.py).

    The zip is CODE SHIPPED TO WORKERS, so its path gets the per-uid 0o700
    cache root (a fixed shared-/tmp path was squattable by another local
    uid — worker code injection) and an atomic staged rename (two drivers
    zipping concurrently previously interleaved writes into one torn zip;
    now the last COMPLETE zip wins). Not write-once: the zip must track
    code edits, so every call re-zips and atomically replaces (r04 review)."""
    from wikidataquality_spark.io.locking import user_cache_root

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(
        user_cache_root("wdq_pyfiles"), "wikidataquality_spark_pyfiles.zip"
    )
    files = []
    for root, _, names in os.walk(pkg_dir):
        for n in names:
            if n.endswith((".py", ".npz")):
                full = os.path.join(root, n)
                rel = os.path.join("wikidataquality_spark", os.path.relpath(full, pkg_dir))
                files.append((full, rel))
    files.sort(key=lambda t: t[1])
    staging = f"{out}.staging.{os.getpid()}"
    try:
        with zipfile.ZipFile(staging, "w", zipfile.ZIP_DEFLATED) as z:
            for full, rel in files:
                z.write(full, rel)
        os.replace(staging, out)
    finally:
        if os.path.exists(staging):
            os.remove(staging)
    return out


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotent per-SparkContext: make the package importable on workers."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    sc.addPyFile(package_zip())
    _SHIPPED.add(key)
