"""Skew mitigation: salted join/repartition correctness + distribution."""

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.operators.skew import salted_join, salted_repartition


@pytest.fixture(scope="module")
def skewed(spark):
    """1 hot predicate (90%) + tail, joined against a predicate-dim."""
    big = spark.range(20_000).select(
        F.concat(F.lit("<s/"), F.col("id").cast("string"), F.lit(">")).alias("s"),
        F.when(F.col("id") % 10 < 9, "<p/type>")
        .otherwise(
            F.concat(F.lit("<p/"), (F.col("id") % 50).cast("string"), F.lit(">"))
        )
        .alias("key"),
    )
    dim = spark.createDataFrame(
        [("<p/type>", "TYPE")] + [(f"<p/{i}>", f"P{i}") for i in range(50)],
        "key string, label string",
    )
    return big, dim


def test_salted_join_exact_equivalence(spark, skewed):
    big, dim = skewed
    plain = big.join(dim, "key").groupBy("key", "label").count()
    salted = salted_join(big, dim, "key", n_salts=8).groupBy("key", "label").count()
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b


def test_salted_join_left_outer(spark, skewed):
    big, dim = skewed
    dim_partial = dim.filter(F.col("key") != "<p/type>")
    plain = big.join(dim_partial, "key", "left_outer")
    salted = salted_join(big, dim_partial, "key", n_salts=8, how="left_outer")
    assert plain.count() == salted.count()
    assert (
        plain.filter(F.col("label").isNull()).count()
        == salted.filter(F.col("label").isNull()).count()
    )


def test_salted_repartition_spreads_hot_key(spark, skewed):
    big, _ = skewed
    df = salted_repartition(big, "key", n_parts=16, n_salts=16)
    sizes = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    # the hot key alone is 18k rows; without salting one partition would
    # hold >= 18k.  With salting the max partition must be far smaller.
    assert max(counts) < 6_000, sorted(counts, reverse=True)[:5]
    assert df.count() == 20_000
