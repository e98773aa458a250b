"""Session factory invariants (session.py)."""

from datasketches_java_spark.session import plan_width


def test_plan_width_matches_shuffle_partitions(spark):
    """Explicit pipeline repartitions must use the same width Catalyst
    gives implicit exchanges, or co-partitioned joins re-shuffle."""
    assert plan_width(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
