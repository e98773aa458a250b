"""Pure-NumPy sketch kernels — no Spark imports here.

Each module is unit-testable without a JVM; the Spark layer
(operators/, functions/) only orchestrates these over Arrow batches.
"""
