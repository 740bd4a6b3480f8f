"""Ship this package to Spark Python workers.

Driver-side ``sys.path`` manipulation does not reach executor Python
workers: a Pandas-UDF kernel that references any symbol from this
package unpickles on the worker by importing the module, and fails if
the package is not on the worker's import path. The cluster-correct
answer — identical in local mode and on 1000 executors — is to
distribute the package archive with ``SparkContext.addPyFile``.

Every operator that runs Python kernels calls
``ensure_package_on_workers`` first; it zips the package once per
process and registers it idempotently.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_ADDED_FLAG = "spotify_pipeline_gcp_spark.pyfiles.added"


def ensure_package_on_workers(spark: SparkSession) -> None:
    jconf = spark.sparkContext.environment
    if jconf.get(_ADDED_FLAG):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    jconf[_ADDED_FLAG] = "1"
