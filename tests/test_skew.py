"""Salted-join/agg equivalence on an intentionally skewed key."""

from __future__ import annotations

from pyspark.sql import functions as F

from nonconsumptive_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # 90% of rows share key=1 (the hot key), remainder spread over 2..10.
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise((F.col("id") % 9) + 2).alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") * 3 % 7).cast("double").alias("v"),
    )


def test_salted_join_equals_plain(spark):
    big = _skewed(spark)
    dim = spark.range(1, 11).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    plain = {tuple(r) for r in big.join(dim, "k").select("k", "row_id", "name").collect()}
    salted = {
        tuple(r)
        for r in salted_join(big, dim, key="k", n_salt=4, salt_cols=["row_id"])
        .select("k", "row_id", "name")
        .collect()
    }
    assert salted == plain and len(plain) == 2000


def test_salted_join_spreads_hot_key(spark):
    big = _skewed(spark)
    salts = (
        big.withColumn("s", F.pmod(F.xxhash64("row_id"), F.lit(4)))
        .filter(F.col("k") == 1)
        .select("s").distinct().count()
    )
    assert salts == 4  # the hot key occupies every salt bucket


def test_salted_join_keyonly_big_requires_explicit_salt(spark):
    import pytest

    big = spark.range(100).select(F.lit(1).alias("k"))  # key column only
    dim = spark.createDataFrame([(1, "x")], ["k", "name"])
    with pytest.raises(ValueError, match="position_salt"):
        salted_join(big, dim, key="k", n_salt=4)
    # position salt spreads even fully-identical rows across buckets
    out = salted_join(big, dim, key="k", n_salt=4, position_salt=True)
    assert out.count() == 100
    plain = {tuple(r) for r in big.join(dim, "k").collect()}
    assert {tuple(r) for r in out.collect()} == plain


def test_salted_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"], r["n"], round(r["s"], 6))
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        (r["k"], r["n_rows"], round(r["sum_v"], 6))
        for r in salted_agg(df, keys=["k"], sum_cols=["v"], n_salt=4).collect()
    }
    assert salted == plain


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join demonstration (the runtime half of the skew story:
    salting above is the planner-side fix, this pins the engine-side
    one).  A deliberately hot key — ~90% of a 200k-row side — exceeds
    the lowered skew thresholds, so the final adaptive plan must mark
    the sort-merge join with skew=true, i.e. AQE actually split the
    oversized partition into parallel subtasks instead of running the
    hot key on one core.  At 100 TB this is what keeps an organic hot
    key (a viral document, a bot user) from serializing a join."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        other = spark.range(1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        joined = big.join(other, "k")
        # run THIS DataFrame (not a derived count() plan): AQE only
        # finalizes — and skew-splits — its own AdaptiveSparkPlan at
        # execution time
        n = len(joined.collect())
        assert n > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
