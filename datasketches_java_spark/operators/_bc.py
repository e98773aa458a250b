"""Keyed registry for operator-owned SparkContext broadcasts.

Operators that broadcast a sketch/matrix at plan-construction time
(bloom probe, count-min scorer, top-k matmul matrix, IVF centroids,
ssjoin bitmap) register it under a stable key; registering a NEW
broadcast under the same key `unpersist(blocking=False)`s the previous
one — executors drop their cached copies, bounding block accumulation
in long-lived sessions (the bench loop runs every query per rep), while
the driver copy stays valid so an EARLIER returned DataFrame that
closes over the old broadcast still executes: tasks simply re-fetch it
from the driver. We deliberately never `destroy()` (round-4 advice: a
destroyed broadcast fails a not-yet-materialized plan hard, which
contradicts the "released results recompute, uncached" contract).
"""

from __future__ import annotations

_REG: dict[str, object] = {}


def register(key: str, bc):
    """Register `bc` under `key`, unpersisting the previous holder."""
    old = _REG.get(key)
    if old is not None and old is not bc:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped
    _REG[key] = bc
    return bc


def release_all() -> None:
    """Unpersist every registered broadcast (session teardown)."""
    while _REG:
        _, old = _REG.popitem()
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
