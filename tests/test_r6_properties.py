"""Property tests for the round-6 staging cohort (queries/staging.py):
Cox PH recovers a closed-form hazard ratio on a constructed two-cohort
conversion table, the pinball readout's quantile actually minimizes the
loss, and the mixture materialization's integer accounting closes."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest

from nonconsumptive_spark.queries.staging import STAGED

SF = "/root/testdata/sf0.001"


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")


def test_cox_recovers_sqrt3_hazard_ratio(spark):
    """Two cohorts, two event times: treat converts 15@1h + 5@3h,
    control 5@1h + 15@3h.  The Breslow partial-likelihood score
    1 = theta/(1+theta) + theta/(3+theta) has the closed-form root
    theta* = sqrt(3) — Newton from 1.0 must land on it."""
    from nonconsumptive_spark.operators.survival import cox_ph_binary

    t0 = datetime(2024, 1, 1)
    rows = []
    odd = [2 * i + 1 for i in range(20)]   # treat cohort (g = 1)
    even = [2 * i + 2 for i in range(20)]  # control
    for u in odd[:15] + even[:5]:
        rows += [(u, t0, "signup"),
                 (u, t0 + timedelta(minutes=90), "purchase")]
    for u in odd[15:] + even[5:]:
        rows += [(u, t0, "signup"),
                 (u, t0 + timedelta(minutes=210), "purchase")]
    out = cox_ph_binary(_events(spark, rows)).collect()[0]
    assert out["n_treat"] == 20 and out["n_control"] == 20
    assert out["d_total"] == 40 and out["d_treat"] == 20
    assert out["theta"] == pytest.approx(3 ** 0.5, abs=1e-4)
    assert out["beta"] == pytest.approx(0.549306, abs=1e-4)
    # converged: the final round's quantized score is ~0
    assert abs(out["us"]) < out["js"] // 1000


def test_cox_fully_censored_is_identity(spark):
    """No purchases anywhere -> every Newton round is a no-op."""
    from nonconsumptive_spark.operators.survival import cox_ph_binary

    t0 = datetime(2024, 1, 1)
    rows = []
    for u in range(1, 11):
        rows += [(u, t0, "signup"),
                 (u, t0 + timedelta(hours=u), "click")]
    out = cox_ph_binary(_events(spark, rows)).collect()[0]
    assert out["d_total"] == 0 and out["us"] == 0 and out["js"] == 0
    assert out["theta"] == 1.0 and out["beta"] == 0.0
    assert out["se_beta"] is None


def test_pinball_quantile_minimizes_loss(spark):
    """The ceil(tau*n) order statistic minimizes pinball loss: shifting
    the pivot by +-1 cent can never do better (ties allowed)."""
    rows = STAGED["q_pinball_quantile"][0](spark, SF).collect()
    assert rows
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    for r in rows:
        for delta in (-1, 1):
            alt = con.sql(f"""
                SELECT sum(CASE WHEN v >= {r['q_hat_cents'] + delta}
                           THEN 3 * (v - ({r['q_hat_cents'] + delta}))
                           ELSE 1 * (({r['q_hat_cents'] + delta}) - v) END)
                FROM (SELECT CAST(floor(100.0 * l_extendedprice + 0.5)
                             AS BIGINT) AS v
                      FROM lineitem
                      WHERE l_returnflag = '{r['flag']}')
            """).fetchone()[0]
            assert r["loss_q"] <= alt, (r["flag"], delta)


def test_mixture_materialize_accounting_closes(spark):
    """target = full_epochs * n_tokens + rem_budget exactly; the selected
    remainder never exceeds its budget; sqrt-temperature upsamples the
    smallest source harder than the largest (ratio ordering)."""
    rows = {r["source"]: r for r in
            STAGED["q_mixture_materialize"][0](spark, SF).collect()}
    assert rows
    budget = sum(r["n_tokens"] for r in rows.values())
    assert sum(r["target"] for r in rows.values()) <= budget
    for r in rows.values():
        assert r["target"] == (r["full_epochs"] * r["n_tokens"]
                               + r["rem_budget"])
        assert r["rem_tokens"] <= r["rem_budget"]
        assert r["rem_docs"] <= r["n_docs"]
    small = min(rows.values(), key=lambda r: r["n_tokens"])
    large = max(rows.values(), key=lambda r: r["n_tokens"])
    if small["n_tokens"] < large["n_tokens"]:
        assert (small["target"] / small["n_tokens"]
                >= large["target"] / large["n_tokens"])
