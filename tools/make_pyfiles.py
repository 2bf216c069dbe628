"""Package the engine for spark-submit --py-files.

Produces a zip of nhse_probabilistic_linkage_spark/ suitable for shipping to
executors (north rule: "runs via spark-submit --py-files on multi-executor
clusters"). Pure-Python package, no build step.

Usage: python tools/make_pyfiles.py [out.zip]   (default /tmp/nhse_dedup_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "nhse_probabilistic_linkage_spark"


def build(out_path: str) -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nhse_dedup_spark.zip"
    print(build(out))
