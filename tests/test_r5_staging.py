"""The r5-staged (spark_fn, oracle) pairs, verified with the exact
driver-gate compare — so round-5 registration is a mechanical move."""

from __future__ import annotations

import pytest

from nonconsumptive_spark.queries import Query
from nonconsumptive_spark.queries.r5_staging import STAGED
from tools.check_oracle import compare_query, duck_connection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_parity(spark, duck, name):
    fn, oracle = STAGED[name]
    res = compare_query(spark, duck, name,
                        Query(name=name, spark_fn=fn, oracle=oracle), SF)
    assert res["status"] == "ok", res
    assert res["rows"] > 0, res
