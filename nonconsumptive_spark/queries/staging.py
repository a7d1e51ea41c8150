"""Registration staging: (spark_fn, oracle_sql) pairs for operators not
yet promoted into the judged registry.

NOT imported by ``queries/__init__.all_queries`` — the driver never sees
these until promotion — but continuously verified against DuckDB by
``tests/test_staging.py`` with the exact dtype-strict compare the driver
gate uses (sf0.001 in the suite; ``python tools/check_staged.py`` for
sf0.01), and censused pre-promotion by tools/plan_census.py.  Promotion
= re-home the entry into a topic module (or promote the whole file in
place, like the r5/r6/r7 cohorts: ``queries/promoted.py``,
``queries/promoted_r6.py``, ``queries/promoted_r7.py``) with
``@register`` and append its name to the PRIORITY queue.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (used by staged entries)

from nonconsumptive_spark.queries import load  # noqa: F401

_DUCK_TOKS = "list_filter(regexp_split_to_array(text, '[^\\pL]+'), x -> x <> '')"

STAGED: dict[str, tuple] = {}


def _stage(name: str, oracle: str):
    def deco(fn):
        STAGED[name] = (fn, oracle)
        return fn

    return deco
