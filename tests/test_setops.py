"""SO2 set-difference contract: since the registry entry merged into
j7_anti_join (driver 50-entry cap), the EXCEPT ≡ anti-join equivalence is
pinned here on real tables."""

from pyspark.sql import functions as F


def test_except_equals_anti_join(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    via_except = (
        cust.select(F.col("c_custkey").alias("k")).distinct()
        .exceptAll(orders.select(F.col("o_custkey").alias("k")).distinct())
        .distinct()
    )
    via_anti = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    assert sorted(r["k"] for r in via_except.collect()) == sorted(
        r["k"] for r in via_anti.collect()
    )
