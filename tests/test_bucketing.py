"""Bucketed tables co-locate joins: writing both sides bucketed by the
join key must eliminate the shuffle (no Exchange in the join plan) —
the at-scale answer for repeated fact-to-fact joins where neither side
broadcasts (SURVEY §4 / PLANS.md scale notes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped (managed => files removed) on teardown.
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    (li.write.mode("overwrite").bucketBy(N_BUCKETS, "l_orderkey")
       .sortBy("l_orderkey").format("parquet").saveAsTable("li_bucketed"))
    (orders.withColumnRenamed("o_orderkey", "l_orderkey")
       .write.mode("overwrite").bucketBy(N_BUCKETS, "l_orderkey")
       .sortBy("l_orderkey").format("parquet").saveAsTable("ord_bucketed"))
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    joined = spark.table(li_t).join(spark.table(ord_t), "l_orderkey").select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    # and the join result is still correct
    n = joined.count()
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert n == expect > 0


def test_unbucketed_join_does_shuffle(spark):
    # control: the same join over raw parquet shuffles (unless broadcast —
    # disable it for the check)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        plan = (
            li.join(orders, "l_orderkey")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
