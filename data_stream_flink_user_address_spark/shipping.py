"""Ship this package to Spark's Python workers.

Functions passed to ``applyInPandasWithState`` / ``mapInPandas`` are
cloudpickled **by module reference**: workers must be able to
``import data_stream_flink_user_address_spark``.  When the driver process
runs from a different working directory (e.g. an external harness), the
package is not on the workers' sys.path -- so any operator that ships
Python code calls :func:`ensure_package_on_workers` first, which zips the
package once per session and distributes it via ``sc.addPyFile``.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_dsfua_pkg_shipped"


def ensure_package_on_workers(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)
