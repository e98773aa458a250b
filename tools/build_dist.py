#!/usr/bin/env python
"""Package the engine for spark-submit --py-files: zips the
datasketches_java_spark package into dist/engine.zip (pure-Python +
NumPy kernels — nothing to compile), the artifact
bench/run_bench.py ships to executors on a real cluster."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "datasketches_java_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith((".py", ".npz")):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    print(build())
