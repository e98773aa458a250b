#!/usr/bin/env python
"""Provenance: regenerates kernels/data/hll_composite_xtable.npz from
the reference's published CompositeInterpolationXTable
(hll/CompositeInterpolationXTable.java, Apache-2.0) — 18 lgK levels
(4..21), 257 x-knots each, plus the per-level y strides. The table IS
the published composite estimator (like the CPC kappa tables extracted
by tools/extract_cpc_tables.py); it is shipped as binary package data
and loaded zip-safely by kernels/hll_compat.py.
"""

import re
import sys

import numpy as np

REF = "/root/reference/src/main/java/org/apache/datasketches/hll/CompositeInterpolationXTable.java"
OUT = "datasketches_java_spark/kernels/data/hll_composite_xtable.npz"


def main(ref: str = REF, out: str = OUT) -> None:
    src = open(ref).read()
    ys = re.search(r"yStrides\s*=\s*\{([^}]*)\}", src).group(1)
    y_strides = np.array([int(t) for t in re.findall(r"\d+", ys)], dtype=np.int64)
    body = src[src.index("xArrs"):]
    blocks = re.findall(r"\{([^{}]*)\}", body[body.index("{") + 1:])
    arrs = [
        np.array([float(t) for t in re.findall(r"[-\d.eE+]+", b)], dtype=np.float64)
        for b in blocks
    ]
    assert len(arrs) == 18 == len(y_strides), (len(arrs), len(y_strides))
    assert all(len(a) == 257 for a in arrs)
    np.savez_compressed(
        out, y_strides=y_strides, **{f"x_{i + 4}": a for i, a in enumerate(arrs)}
    )
    print(f"wrote {out}: 18 levels x 257 knots")


if __name__ == "__main__":
    main(*sys.argv[1:])
