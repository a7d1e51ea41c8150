"""Skew-handling operators: deterministic salted joins and aggregations.

Spark's own defenses cover most skew: hash aggregation does map-side
partial aggregation (a hot group key is pre-collapsed per task), and AQE
splits oversized sort-merge join partitions at runtime
(``spark.sql.adaptive.skewJoin``, on in session.py).  The remaining gap is
a *shuffle hash/sort-merge join where one key dominates* and the other
side is too large to broadcast: every row of the hot key lands on one
task.  The classic fix is salting — split the hot key into ``n_salt``
sub-keys on the big side and replicate the other side once per salt — at
the cost of an ``n_salt``× blow-up of the replicated side's shuffle.

Salts here are DETERMINISTIC (hash of named columns, never ``rand()``):
re-running a stage after executor loss must route rows identically, or
shuffle-replay corrupts the join (the engine-wide determinism rule,
SURVEY §4 "deterministic dense ids").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, other: DataFrame, key: str, n_salt: int = 8,
                salt_cols: list[str] | None = None, how: str = "inner",
                position_salt: bool = False) -> DataFrame:
    """Equi-join robust to a skewed ``key`` distribution on ``big``.

    ``big`` rows get salt = hash(salt_cols) mod n_salt (or a hash of all
    non-key columns if unspecified); ``other`` is replicated once per salt
    via an exploded literal sequence.  The join key becomes (key, salt),
    so a hot key's rows spread over ``n_salt`` shuffle partitions.
    Output matches ``big.join(other, key, how)`` for inner/left/semi/anti
    ONLY — right/full would emit one null-padded row per salt replica for
    every unmatched ``other`` row, so those modes are rejected.

    Column-hash salting cannot spread a hot key whose rows are IDENTICAL
    across ``salt_cols`` (they all hash to one bucket).  For that case —
    and for a ``big`` with no non-key columns at all — pass
    ``position_salt=True``: the salt derives from the row's physical
    position (partition id + offset), which is stable across shuffle
    replays when ``big`` is a deterministic scan (file sources; NOT the
    output of a previous shuffle — reorderings there would re-salt rows).
    """
    if how.replace("_", "").lower() in (
        "right", "rightouter", "full", "fullouter", "outer"
    ):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched `other` "
            "rows once per salt replica; salt the other side instead"
        )
    if position_salt:
        salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    else:
        if salt_cols is None:
            salt_cols = [c for c in big.columns if c != key]
        if not salt_cols:
            raise ValueError(
                "salted_join: `big` has no non-key columns to derive a salt "
                "from; pass salt_cols explicitly or position_salt=True"
            )
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt))
    b = big.withColumn("__salt", salt.cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return b.join(o, [key, "__salt"], how).drop("__salt")


def salted_agg(df: DataFrame, keys: list[str], sum_cols: list[str],
               n_salt: int = 16, salt_cols: list[str] | None = None) -> DataFrame:
    """Two-phase sum/count aggregation with an explicit salt stage:
    partial ``groupBy(keys + salt)`` then final ``groupBy(keys)``.

    Mostly pedagogical on Spark — the built-in hash aggregate already
    partial-aggregates map-side — but it is the required shape when the
    aggregation buffer is NOT reducible map-side (e.g. exact distinct
    sets per hot key) and documents the pattern for such operators."""
    if salt_cols is None:
        salt_cols = keys + sum_cols
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count("*").alias("__n"),
            *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
