"""datasketches_java_spark — a PySpark-native near-duplicate detection engine.

Re-expresses the stochastic sketch kernels of apache/datasketches-java
(KMV/Theta bottom-k signatures, Jaccard-with-bounds, HLL audits, KLL
quantiles, SimHash, LSH banding, connected components) as vectorized
NumPy kernels orchestrated by DataFrame ops and Arrow-batched pandas
UDFs. See SURVEY.md for the full reference mapping.
"""

__version__ = "0.1.0"

import os as _os

# This sandbox's page-fault cost makes glibc's default behavior of
# mmap/munmap-ing every >128 KiB buffer pathological (~50x slowdowns on
# NumPy temporaries, observed as 80% system time). Keep large
# allocations on the reusable heap: mallopt for this process (env vars
# are only read at process start), env for children (Spark workers).
# glibc rejects thresholds above DEFAULT_MMAP_THRESHOLD_MAX (32 MiB on
# 64-bit) — use exactly the cap or the call silently does nothing
_MMAP_THRESHOLD = 32 * 1024 * 1024
_os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(_MMAP_THRESHOLD))
_os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(2**30))
try:
    import ctypes as _ctypes

    _libc = _ctypes.CDLL("libc.so.6", use_errno=True)
    _libc.mallopt(-3, _MMAP_THRESHOLD)  # M_MMAP_THRESHOLD
    _libc.mallopt(-1, 2**30)            # M_TRIM_THRESHOLD
except Exception:  # non-glibc platforms: defaults are fine
    pass
