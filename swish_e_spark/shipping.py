"""Ship the swish_e_spark package to executors.

In production the job runs ``spark-submit --py-files swish_e_spark.zip``
(north rule). For interactive/driver-created sessions this helper
provides the same effect: zip the package once and ``addPyFile`` it so
every executor worker can import the UDF kernels, wherever its cwd is.
Idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set = set()


def ship_package(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"swish_e_spark_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full,
                                              os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    _shipped.add(key)


def write_zip(out_path: str = "swish_e_spark.zip") -> str:
    """Write the --py-files zip for spark-submit (scripts/index_job.py).
    Run as ``python -m swish_e_spark.shipping [out.zip]``."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    import sys

    print(write_zip(sys.argv[1] if len(sys.argv) > 1
                    else "swish_e_spark.zip"))
