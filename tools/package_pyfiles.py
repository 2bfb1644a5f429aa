#!/usr/bin/env python
"""Package fastobo_py_spark for ``spark-submit --py-files`` (north rule).

Produces a deterministic zip of the package sources (no __pycache__, no
timestamps beyond zip's minimum) so cluster submissions are reproducible:

    python tools/package_pyfiles.py dist/fastobo_py_spark.zip
    spark-submit --py-files dist/fastobo_py_spark.zip jobs/build_kg.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str, root: str = _ROOT) -> str:
    pkg = os.path.join(root, "fastobo_py_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                entries.append((full, os.path.relpath(full, root)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc)  # fixed epoch timestamp → reproducible
            # a bare ZipInfo defaults to ZIP_STORED and writestr honors it
            # over the archive-level ZIP_DEFLATED — set it explicitly or
            # the artifact ships uncompressed
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/fastobo_py_spark.zip"
    print(build_zip(out))
