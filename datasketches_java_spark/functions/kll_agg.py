"""KLL quantile sketch as a distributed partial/final aggregation.

The reference's quantile story at scale is the mergeable sketch
(kll/KllDoublesSketch.java:275 merge, kll/KllDoublesHelper.java:134-196);
this is its Spark face over kernels/kll.py:

 1. partial (mapInPandas): one serialized KLL sketch per (Arrow batch,
    group) — map-side combine; O(k log n) state per group crosses the
    shuffle regardless of group size.
 2. final (applyInPandas per group): merge sketches, answer quantile
    queries from the weight-sorted view.

Quantile extraction uses INTEGER rank fractions (p/q), not float ranks:
the inclusive criterion "min v with q·(#items <= v) >= p·n"
(quantilescommon/QuantileSearchCriteria.java:41 INCLUSIVE) evaluates in
exact integer math on both our side and a SQL oracle's, so results
compare exactly when the sketch is in its exact regime (n <= k, no
compaction — the same exact-mode trick the KMV gate query uses). At
lossy tiers the rank-error contract 2.446/k^0.9433
(kll/KllHelper.java:295-299) is pytest-gated.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.kll import DEFAULT_K, KllDoubles


def _quantile_frac(sk: KllDoubles, p: int, q: int) -> float:
    """min v with q·cumweight(v) >= p·n — inclusive rank, integer math."""
    it, wt = sk._sorted_view()
    if len(it) == 0:
        return float("nan")
    cum = np.cumsum(wt)
    idx = int(np.searchsorted(q * cum, p * sk.n, side="left"))
    return float(it[min(idx, len(it) - 1)])


def kll_quantile_agg(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: Sequence[tuple[int, int]] = ((1, 2), (99, 100)),
    k: int = DEFAULT_K,
    seed: int = 9001,
) -> DataFrame:
    """Per-group KLL quantiles. `quantiles` are integer rank fractions
    (p, q); output columns are named q_p_q (e.g. q_1_2 for the median).

    Output: (group, n, q_p_q...) with n = exact item count."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_g, out_s = [], []
            for g, sub in pdf.groupby(group_col, sort=False):
                sk = KllDoubles(k=k, seed=seed)
                sk.update_many(sub[value_col].to_numpy(np.float64))
                out_g.append(g)
                out_s.append(sk.serialize())
            yield pd.DataFrame({group_col: out_g, "sketch": out_s})

    partials = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(value_col).cast("double").alias(value_col),
    ).mapInPandas(partial, f"{group_col} string, sketch binary")

    qcols = [f"q_{p}_{q}" for p, q in quantiles]

    def final(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KllDoubles.deserialize(pdf["sketch"].iloc[0], seed=seed)
        for b in pdf["sketch"].iloc[1:]:
            sk.merge(KllDoubles.deserialize(b, seed=seed))
        row = {group_col: [key[0]], "n": [sk.n]}
        for (p, q), name in zip(quantiles, qcols):
            row[name] = [_quantile_frac(sk, p, q)]
        return pd.DataFrame(row)

    schema = f"{group_col} string, n bigint, " + ", ".join(
        f"{c} double" for c in qcols
    )
    return partials.groupBy(group_col).applyInPandas(final, schema)
