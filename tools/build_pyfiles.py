#!/usr/bin/env python
"""Package networkx_graph_spark as a --py-files zip for spark-submit.

    python tools/build_pyfiles.py            # -> dist/networkx_graph_spark.zip

The zip contains the pure-Python package only (no tests, no caches) and
is what executors import on a real cluster:

    spark-submit --master <cluster> \
        --py-files dist/networkx_graph_spark.zip \
        tools/submit_job.py pagerank --edges s3://.../edges --output ...
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "networkx_graph_spark")
OUT_DIR = os.path.join(ROOT, "dist")
OUT = os.path.join(OUT_DIR, "networkx_graph_spark.zip")


def main() -> int:
    os.makedirs(OUT_DIR, exist_ok=True)
    n = 0
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(PKG):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                z.write(full, rel)
                n += 1
    print(f"wrote {OUT} ({n} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
