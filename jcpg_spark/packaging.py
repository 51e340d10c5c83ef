"""Packaging: ship the jcpg_spark package to executors.

north_rule requires the job to run via ``spark-submit --py-files`` on a
multi-executor cluster. ``build_pyfiles_zip`` produces that artifact; the
session factory also calls ``ship_package`` so any programmatically created
session (tests, bench, driver harness) gets the package on the executor
python path regardless of the driver's CWD — without it, every pandas UDF
deserialization fails with ModuleNotFoundError on the workers.
"""

from __future__ import annotations

import os
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the jcpg_spark package for ``spark-submit --py-files``.

    The zip contains ``jcpg_spark/*.py`` at the archive root so it is
    directly importable when placed on PYTHONPATH.
    """
    if dest is None:
        dest = os.path.join(os.path.dirname(_PKG_DIR), "dist", "jcpg_spark.zip")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join("jcpg_spark", os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    return dest


def ship_package(spark) -> None:
    """Make jcpg_spark importable on executors via addPyFile of the zip.

    The zip path is CONTENT-ADDRESSED (sha256 of the package sources): a
    fixed path breaks a running session whenever another process rebuilds
    the zip with different content (Spark refuses a re-added file whose
    bytes changed), e.g. two bench subprocesses racing a live session
    across a source edit. Same content -> same path -> addPyFile is an
    idempotent no-op; new content -> new path -> clean re-ship.
    """
    import hashlib
    import tempfile

    h = hashlib.sha256()
    for root, _dirs, files in os.walk(_PKG_DIR):
        for fn in sorted(files):
            if fn.endswith(".py"):
                with open(os.path.join(root, fn), "rb") as f:
                    h.update(fn.encode())
                    h.update(f.read())
    dest = os.path.join(tempfile.gettempdir(), f"jcpg_spark_pyfiles_{h.hexdigest()[:16]}.zip")
    if not os.path.exists(dest):
        build_pyfiles_zip(dest)
    spark.sparkContext.addPyFile(dest)


if __name__ == "__main__":
    # `python -m jcpg_spark.packaging [dest]` — the documented build step
    # for `spark-submit --py-files dist/jcpg_spark.zip` (north_rule run
    # mode; scripts/run_kg_job.py's usage header). Prints the artifact
    # path so shell pipelines can capture it.
    import sys

    print(build_pyfiles_zip(sys.argv[1] if len(sys.argv) > 1 else None))
