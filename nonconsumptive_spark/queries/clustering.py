"""Clustering / SemDeDup registry entries.

Both oracles replay the ENTIRE integer-grid k-means recurrence as
generated CTEs (one assign + one update block per iteration), the same
full-replay discipline as the BPE and PageRank oracles in queries/text.py.
All interim values are exact integers, so the hash-compare carries no
float-ordering risk; the single double operation per update —
``floor(sum/count + 0.5)`` — is the identical IEEE divide on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from nonconsumptive_spark.operators import clustering as cl
from nonconsumptive_spark.queries import load, register

_K = 10
_ITERS = 4
_GRID = cl.GRID
_TAU = (7, 20)  # cosine threshold 0.35 as an exact rational


def _kmeans_cte(k: int, n_iter: int, grid: int) -> str:
    """WITH-clause body computing a_{n_iter+1}: the final assignment
    (vec_id, xq, cid, dist) under the centroids after n_iter updates."""
    parts = [f"""
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {grid}.0 + 0.5) AS BIGINT)) AS xq
      FROM embeddings),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, xq AS cq
      FROM (SELECT vec_id, xq FROM q ORDER BY vec_id LIMIT {k}))"""]
    for i in range(1, n_iter + 2):
        parts.append(f"""
    a{i} AS (
      SELECT vec_id, xq, cid, dist
      FROM (SELECT q.vec_id, q.xq, c.cid,
                   list_sum(list_transform(list_zip(q.xq, c.cq),
                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
            FROM q CROSS JOIN c{i - 1} c)
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)""")
        if i == n_iter + 1:
            break  # final assignment needs no further update
        parts.append(f"""
    s{i} AS (
      SELECT cid, pos,
             CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cv
      FROM (SELECT cid, generate_subscripts(xq, 1) AS pos, unnest(xq) AS v
            FROM a{i})
      GROUP BY cid, pos),
    c{i} AS (
      SELECT p.cid, coalesce(n.cq, p.cq) AS cq
      FROM c{i - 1} p
      LEFT JOIN (SELECT cid, list(cv ORDER BY pos) AS cq
                 FROM s{i} GROUP BY cid) n USING (cid))""")
    return "WITH" + ",".join(parts)


def _kmeans_oracle(k: int, n_iter: int, grid: int) -> str:
    return (
        _kmeans_cte(k, n_iter, grid)
        + f"""
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist_sq
    FROM a{n_iter + 1}"""
    )


def _semdedup_oracle(k: int, n_iter: int, grid: int, num: int, den: int) -> str:
    fin = f"a{n_iter + 1}"
    return (
        _kmeans_cte(k, n_iter, grid)
        + f""",
    m AS (
      SELECT vec_id, cid, xq,
             list_sum(list_transform(xq, x -> x * x)) AS nq
      FROM {fin}),
    pr AS (
      SELECT b.vec_id AS ib, a.nq AS na, b.nq AS nb,
             list_sum(list_transform(list_zip(a.xq, b.xq),
               p -> p[1] * p[2])) AS dot
      FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id),
    dup AS (
      SELECT DISTINCT ib AS vec_id FROM pr
      WHERE dot > 0
        AND {den * den} * CAST(dot AS HUGEINT) * dot
            >= {num * num} * CAST(na AS HUGEINT) * nb)
    SELECT m.vec_id, CAST(m.cid AS BIGINT) AS cluster,
           (d.vec_id IS NOT NULL) AS pruned
    FROM m LEFT JOIN dup d USING (vec_id)"""
    )


_MMR_M = 8


def _mmr_oracle(m: int, grid: int) -> str:
    """Unrolled m-round greedy MMR replay: argmax(rel - penalty) with id
    tie-break per round, selected set accumulated across CTEs."""
    parts = [f"""
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {grid}.0 + 0.5) AS BIGINT)) AS xq
      FROM embeddings),
    g AS (
      SELECT list(cv ORDER BY pos) AS cq
      FROM (SELECT pos,
                   CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cv
            FROM (SELECT generate_subscripts(xq, 1) AS pos, unnest(xq) AS v
                  FROM q)
            GROUP BY pos)),
    r AS MATERIALIZED (
      SELECT q.vec_id, q.xq,
             list_sum(list_transform(list_zip(q.xq, g.cq),
               p -> p[1] * p[2])) AS rel
      FROM q CROSS JOIN g),
    sel1 AS MATERIALIZED (
      SELECT 1 AS step, vec_id, xq, rel, CAST(0 AS BIGINT) AS penalty
      FROM r ORDER BY rel DESC, vec_id LIMIT 1)"""]
    # each sel{t} is referenced twice by level t+1 (join + NOT IN) — without
    # MATERIALIZED DuckDB inlines the chain and the plan grows exponentially
    for t in range(2, m + 1):
        parts.append(f"""
    pick{t} AS MATERIALIZED (
      SELECT {t} AS step, r.vec_id, r.xq, r.rel,
             max(list_sum(list_transform(list_zip(r.xq, s.xq),
               p -> p[1] * p[2]))) AS penalty
      FROM r JOIN sel{t - 1} s ON true
      WHERE r.vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
      GROUP BY r.vec_id, r.xq, r.rel
      ORDER BY r.rel - max(list_sum(list_transform(list_zip(r.xq, s.xq),
               p -> p[1] * p[2]))) DESC, r.vec_id
      LIMIT 1),
    sel{t} AS MATERIALIZED (
      SELECT * FROM sel{t - 1} UNION ALL SELECT * FROM pick{t})""")
    return (
        "WITH" + ",".join(parts)
        + f"""
    SELECT CAST(step AS BIGINT) AS step, vec_id,
           CAST(rel AS BIGINT) AS rel, CAST(penalty AS BIGINT) AS penalty
    FROM sel{m}"""
    )


@register(
    "q_mmr_select",
    oracle=_mmr_oracle(_MMR_M, _GRID),
    doc=f"Maximal-marginal-relevance exemplar selection: {_MMR_M} greedy "
        "rounds of argmax(relevance − max-dot-to-selected) on the integer "
        "grid (Carbonell & Goldstein 1998).  Each round is one zero-"
        "shuffle scan with the selected set as a constant-folded literal "
        "+ TakeOrdered(1); the oracle replays all rounds as unrolled "
        "CTEs.  Greedy selection is inherently sequential in m.",
)
def q_mmr_select(spark, sf_dir):
    return cl.mmr_select(load(spark, sf_dir, "embeddings"), m=_MMR_M)


@register(
    "q_kmeans_assign",
    oracle=_kmeans_oracle(_K, _ITERS, _GRID),
    doc=f"Integer-grid Lloyd k-means (k={_K}, {_ITERS} iterations) over the "
        "embedding column: (vec_id, cluster, dist_sq) with exact-integer "
        "distances.  Assignment is a zero-shuffle scan against a constant-"
        "folded centroid literal; the update is one k-group hash agg of "
        "per-dimension sums — shuffle volume k·d longs regardless of row "
        "count.  The oracle replays every iteration as generated CTEs.",
)
def q_kmeans_assign(spark, sf_dir):
    return cl.kmeans(load(spark, sf_dir, "embeddings"), k=_K, n_iter=_ITERS)


@register(
    "q_semdedup_prune",
    oracle=_semdedup_oracle(_K, _ITERS, _GRID, *_TAU),
    doc="SemDeDup (arXiv:2303.09540): within each k-means cluster, prune "
        f"every vector cosine-similar (≥ {_TAU[0]}/{_TAU[1]}) to a lower-id "
        "member.  The pairwise stage is an equi-join on the cluster id "
        "(cost Σ|cluster|², bounded by growing k with N); the threshold is "
        "an exact integer comparison (decimal(38,0) vs HUGEINT), so the "
        "prune decisions hash-match bit-for-bit.",
)
def q_semdedup_prune(spark, sf_dir):
    return cl.semdedup(
        load(spark, sf_dir, "embeddings"),
        k=_K, n_iter=_ITERS, tau_num=_TAU[0], tau_den=_TAU[1],
    )
