"""2-D skyline (Pareto frontier) — maximal points under coordinate-wise
dominance, the classic Borzsony/Kossmann database operator.

Curation use: "keep documents no other document beats on BOTH axes"
(e.g. longest AND most lexically diverse) — a selection rule that needs
no weights, unlike a blended score.

Dominance here: q dominates p iff q.x >= p.x and q.y >= p.y with at
least one strict.  Duplicate points do not dominate each other (both
survive).

Scale shape — the naive form is an all-pairs anti-join (quadratic, the
oracle's NOT EXISTS); this is the standard two-phase plan instead:

  phase 1  bucket rows on a deterministic hash and take each bucket's
           LOCAL skyline with one sort-descending running-max window per
           bucket — a dominated point always has some dominator that is
           itself bucket-locally undominated (transitivity), so the
           local pass never drops a needed witness and survivors are a
           superset of the frontier, expected O(buckets x frontier);
  phase 2  exact dominance filter over that small survivor frame with
           one global window (bounded by the survivor count, documented
           cap — same class as the vocab post-limit windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 8


def _survivors(df: DataFrame, xcol: str, ycol: str, part_cols: list[str],
               exact: bool) -> DataFrame:
    """Rows not dominated within their partition.  ``exact=False`` keeps
    y-ties unconditionally (conservative superset, no same-y max needed);
    ``exact=True`` resolves same-y dominance via the per-y max of x."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.desc(xcol), F.desc(ycol))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = df.withColumn("_rm", F.max(ycol).over(w))
    keep = F.col("_rm").isNull() | (F.col("_rm") < F.col(ycol))
    if exact:
        wy = Window.partitionBy(*part_cols, ycol)
        df = df.withColumn("_mx", F.max(xcol).over(wy))
        keep = keep | (
            (F.col("_rm") == F.col(ycol)) & (F.col(xcol) == F.col("_mx"))
        )
        return df.filter(keep).drop("_rm", "_mx")
    keep = keep | (F.col("_rm") == F.col(ycol))
    return df.filter(keep).drop("_rm")


def skyline(df: DataFrame, xcol: str, ycol: str,
            n_buckets: int = N_BUCKETS) -> DataFrame:
    """The 2-D skyline of ``df`` maximizing (xcol, ycol).  All input
    columns pass through; row multiplicity of duplicate frontier points
    is preserved."""
    bucketed = df.withColumn(
        "_b", F.pmod(F.xxhash64(*df.columns), F.lit(n_buckets))
    )
    local = _survivors(bucketed, xcol, ycol, ["_b"], exact=False).drop("_b")
    # phase 2: exact pass over the bounded survivor frame (single global
    # window partition — survivors ~ n_buckets x frontier, not corpus)
    return _survivors(local.withColumn("_g", F.lit(0)), xcol, ycol,
                      ["_g"], exact=True).drop("_g")


def _local_skyline_pdf(pdf, cols):
    """O(n log n + n·f) in-memory maximal-points filter for one bucket
    (f = local frontier size): sort lexicographically descending, keep
    points no kept point dominates.  Exact for any dimension count."""
    import numpy as np

    vals = pdf[list(cols)].to_numpy()
    order = np.lexsort(tuple(vals[:, i] for i in reversed(range(len(cols)))))[::-1]
    kept: list[int] = []
    for idx in order:
        v = vals[idx]
        dominated = False
        for k in kept:
            w = vals[k]
            if (w >= v).all() and (w > v).any():
                dominated = True
                break
        if not dominated:
            kept.append(idx)
    return pdf.iloc[sorted(kept)]


def skyline_kd(df: DataFrame, cols: list[str],
               n_buckets: int = N_BUCKETS) -> DataFrame:
    """k-dimensional skyline (maximal points, coordinate-wise dominance,
    duplicates survive) for ANY number of criteria — beyond 2-D the
    running-max window trick no longer applies, so the local pass is an
    Arrow-batched ``applyInPandas`` maximal-points filter per hash
    bucket (the sanctioned Python path for semantics Catalyst can't
    express), and the exact global pass re-runs the same kernel on the
    bounded survivor union.  The witness argument from the 2-D operator
    carries over unchanged: a dominated point's maximal dominator
    survives its bucket, so phase 1 never loses a needed witness."""
    if len(cols) < 2:
        raise ValueError("skyline needs at least 2 criteria")
    schema = df.schema

    def kernel(pdf):
        return _local_skyline_pdf(pdf, cols)

    bucketed = df.withColumn(
        "_b", F.pmod(F.xxhash64(*df.columns), F.lit(n_buckets))
    )
    local = (
        bucketed.groupBy("_b")
        .applyInPandas(lambda pdf: kernel(pdf.drop(columns=["_b"])), schema)
    )
    return (
        local.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: kernel(pdf.drop(columns=["_g"])), schema)
    )
