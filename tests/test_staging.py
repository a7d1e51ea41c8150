"""The staged (spark_fn, oracle) pairs awaiting promotion, verified with
the exact driver-gate compare — so registration is a mechanical move.
(The round-4 cohort that lived here was promoted wholesale in round 5;
see queries/promoted.py and test_oracle_parity.py, which now covers it.)"""

from __future__ import annotations

import pytest

from nonconsumptive_spark.queries import Query
from nonconsumptive_spark.queries.staging import STAGED
from tools.check_oracle import compare_query, duck_connection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", sorted(STAGED) or ["<empty>"])
def test_staged_oracle_parity(spark, duck, name):
    if name == "<empty>":
        pytest.skip("no staged entries this round")
    fn, oracle = STAGED[name]
    res = compare_query(spark, duck, name,
                        Query(name=name, spark_fn=fn, oracle=oracle), SF)
    assert res["status"] == "ok", res
    assert res["rows"] > 0, res
