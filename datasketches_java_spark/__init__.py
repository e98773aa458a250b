"""datasketches_java_spark — a PySpark-native near-duplicate detection engine.

Re-expresses the stochastic sketch kernels of apache/datasketches-java
(KMV/Theta bottom-k signatures, Jaccard-with-bounds, HLL audits, KLL
quantiles, SimHash, LSH banding, connected components) as vectorized
NumPy kernels orchestrated by DataFrame ops and Arrow-batched pandas
UDFs. See SURVEY.md for the full reference mapping.
"""

__version__ = "0.1.0"
