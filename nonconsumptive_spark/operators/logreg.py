"""In-engine logistic-regression training by full-batch gradient descent —
the TRAINED complement to the closed-form Naive Bayes classifier
(`textstats.nb_lang_confusion`), and the third member of the iterative
replay family (k-means, PageRank, BPE): every training round is expressed
as exact-integer DataFrame algebra that the DuckDB oracle replays via
generated CTEs.

Model: binary classifier (y = 1 iff n_chars >= 320 — a label the
features genuinely predict, so convergence is observable: training
accuracy reaches ~0.96 from a 0.54 majority baseline) over d=5 integer
features (per-language stopword hits + CENTERED token count) + bias:

    z      = b + sum_f w[f] * cnt[f]
    p      = sigmoid(z)
    w     -= lr/n * sum_docs (p - y) * cnt      (full-batch GD, T rounds)

Hash-parity discipline: weights live as BIGINTs in 1e-9 units, so z is an
exact integer; the ONLY float in the loop is the mirrored sigmoid
expression (LOGREG_E_SQL, shared verbatim with the oracle), whose output
is quantized back to 1e-9 units per doc BEFORE any engine-ordered sum;
the learning-rate update is an exact floor division implemented with
pmod so both engines agree on negative gradients.  The emitted scores
are raw integer z_q values — no float ever reaches the output.

Plan shape (100 TB): the wide (doc, y, feature-array) table materializes
once and feeds every round; a round is pure IN-ROW arithmetic over that
scan (z = explicit d+1-term dot product against literal weights, e = the
mirrored sigmoid) collapsing into ONE 1-row map-side-combined aggregate
of d+1 gradient sums — zero per-round shuffles, and the driver collects
exactly d+1 numbers per round (the bounded-collect pattern shared with
k-means/BPE).  Feature dimension, not corpus size, bounds all state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nonconsumptive_spark.functions.text import tokenize
from nonconsumptive_spark.plans.checkpoint import materialize_once

LOGREG_D = 5             # 4 per-language stopword-count features + length
LOGREG_T = 8             # full-batch GD rounds
LOGREG_LR_DEN = 16       # learning rate = 1/LOGREG_LR_DEN
LOGREG_LEN_CENTER = 55   # token-count feature centered near the corpus mean
LOGREG_LABEL_CHARS = 320 # y = 1 iff n_chars >= this (near-median cut)
LOGREG_SCALE = 1_000_000_000  # weight/error quantization: 1e-9 units

# The one float expression in the loop, shared verbatim with the oracle:
# quantized error e_q = round((sigmoid(z) - y) * 1e9).
LOGREG_E_SQL = (
    "CAST(floor((1.0 / (1.0 + exp(-(zq / 1000000000.0))) - y)"
    " * 1000000000.0 + 0.5) AS BIGINT)"
)


def _stop_pred(words):
    arr = F.array(*[F.lit(w) for w in words])
    return lambda x: F.array_contains(arr, F.lower(x))


def _nn_size(c):
    # NULL-text safe on BOTH engines: Spark's size() yields -1 (legacy)
    # or NULL (ANSI) for a NULL array, DuckDB's len() yields NULL — all
    # normalize to 0 (mirrored as coalesce(len(...), 0) in the oracle).
    return F.when(F.size(c) >= 0, F.size(c)).otherwise(F.lit(0))


def _count_exprs(t):
    """The d per-doc feature counts over a let-bound token array — the
    ONE definition both feature layouts (long and wide) are built from."""
    from nonconsumptive_spark.operators.textstats import LANG_STOPWORDS

    langs = sorted(LANG_STOPWORDS)  # deterministic feature order
    cs = [
        _nn_size(F.filter(t, _stop_pred(LANG_STOPWORDS[lang]))).cast("long")
        for lang in langs
    ]
    cs.append((_nn_size(t) - F.lit(LOGREG_LEN_CENTER)).cast("long"))
    return cs


def feature_array(text_col: str):
    """array<long> of the d feature counts + a constant-1 bias slot —
    the wide in-row layout the trainer scans (one tokenize per row)."""
    from nonconsumptive_spark.functions.text import let

    return let(
        tokenize(text_col),
        lambda t: F.array(*_count_exprs(t), F.lit(1).cast("long")),
    )


def doc_features(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, f, cnt != 0): integer features — f0..f3 = how many of the
    doc's tokens appear in each language's stopword list (the same lists
    the lang-ID heuristic votes with; lists may overlap, features count
    independently), f4 = token count MINUS LOGREG_LEN_CENTER (centering
    keeps the bias gradient on the same scale as the weights — without
    it full-batch GD oscillates between the two trivial predictors).
    One in-row projection per doc, zero shuffle.  This long form is the
    hand-checkable surface; the trainer scans the wide ``feature_array``
    layout (same ``_count_exprs``, layout parity test-asserted)."""
    from nonconsumptive_spark.functions.text import let

    def build(t):
        return F.array(*[
            F.struct(F.lit(i).alias("f"), c.alias("cnt"))
            for i, c in enumerate(_count_exprs(t))
        ])

    return (
        df.select(id_col, F.explode(let(tokenize(text_col), build)).alias("s"))
        .select(id_col, F.col("s.f").alias("f"), F.col("s.cnt").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def logreg_train_scores(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", d: int = LOGREG_D,
                        n_rounds: int = LOGREG_T,
                        lr_den: int = LOGREG_LR_DEN,
                        label_expr=None) -> DataFrame:
    """(doc_id, score_q, pred, y) after ``n_rounds`` of exact full-batch
    GD: score_q is the final integer logit (1e-9 units), pred the pure
    integer inequality score_q >= 0 (== p >= 0.5), y the training label
    (default: n_chars >= LOGREG_LABEL_CHARS)."""
    if label_expr is None:
        label_expr = F.col("n_chars") >= LOGREG_LABEL_CHARS
    # WIDE per-doc feature array (d counts + constant-1 bias slot): the
    # whole training round becomes in-row arithmetic over one materialized
    # (id, y, cnts) scan — zq and eq are projections, the gradient is ONE
    # 1-row map-side-combined agg of d+1 sums.  The original long-form
    # (doc, f, cnt)-join formulation spent its round time on four tiny
    # shuffles' scheduling overhead (A/B at sf0.1 warm: 11.5s -> 2.4s).
    # doc_features (the long form) stays as the hand-checkable surface;
    # parity between the two is asserted in tests.
    wide = materialize_once(
        df.select(
            id_col,
            F.when(label_expr, F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("y"),
            feature_array(text_col).alias("cnts"),
        ),
        "logreg_wide",
    )
    n = df.count()
    m = lr_den * n  # floor-div denominator for the lr/n * grad update

    w = [0] * (d + 1)  # w[d] is the bias

    def zq_expr():
        # z is an exact BIGINT dot product, spelled as a codegen-friendly
        # explicit sum (d+1 terms) against the current literal weights
        return sum(
            (F.element_at("cnts", f + 1) * F.lit(w[f]) for f in range(d + 1)),
            start=F.lit(0),
        ).cast("long")

    for _ in range(n_rounds):
        e = wide.select("cnts", zq_expr().alias("zq"), "y").select(
            "cnts", F.expr(LOGREG_E_SQL).alias("eq")
        )
        grads = e.agg(*[
            F.sum(F.element_at("cnts", f + 1) * F.col("eq"))
            .cast("long").alias(f"g{f}")
            for f in range(d + 1)
        ]).collect()[0]  # 1 row x d+1 numbers — the bounded collect
        for f in range(d + 1):
            w[f] -= grads[f"g{f}"] // m  # Python // floors, like the oracle

    return wide.select(id_col, "y", zq_expr().alias("zq")).select(
        id_col,
        F.col("zq").alias("score_q"),
        (F.col("zq") >= 0).alias("pred"),
        "y",
    )
