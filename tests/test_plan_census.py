"""Structural regression over EVERY registered query's physical plan:
no CartesianProduct anywhere; BroadcastNestedLoopJoin only where the
plan is documented as the right one (1-row attaches, tiny-side forms)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.sweep  # whole-registry sweep: skip via -m "not sweep"

from tests.conftest import SF_SMALL
from tools.plan_census import BNLJ_WHITELIST, census


def test_no_unexpected_cross_products(spark):
    rows = census(spark, SF_SMALL)
    errors = []
    for name, joins, ex, flag in rows:
        if flag == "CARTESIAN":
            errors.append((name, "CartesianProduct"))
        elif flag == "BNLJ" and name not in BNLJ_WHITELIST:
            errors.append((name, "unwhitelisted BroadcastNestedLoopJoin"))
        elif flag == "ERROR":
            errors.append((name, joins))
    assert not errors, errors
