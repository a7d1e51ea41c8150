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

Plan shape (100 TB): the (doc, feature, count) table materializes once
and feeds every round; per round the corpus does ONE broadcast join
against the d-row weight table, one map-side-combinable per-doc sum,
and one d-group gradient agg; the driver collects exactly d+1 numbers
per round (the documented bounded-collect pattern shared with
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


def doc_features(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, f, cnt != 0): integer features — f0..f3 = how many of the
    doc's tokens appear in each language's stopword list (the same lists
    the lang-ID heuristic votes with; lists may overlap, features count
    independently), f4 = token count MINUS LOGREG_LEN_CENTER (centering
    keeps the bias gradient on the same scale as the weights — without
    it full-batch GD oscillates between the two trivial predictors).
    One in-row projection per doc, zero shuffle before the training
    joins."""
    from nonconsumptive_spark.functions.text import let
    from nonconsumptive_spark.operators.textstats import LANG_STOPWORDS

    langs = sorted(LANG_STOPWORDS)  # deterministic feature order

    def stop_pred(words):
        arr = F.array(*[F.lit(w) for w in words])
        return lambda x: F.array_contains(arr, F.lower(x))

    def nn_size(c):
        # NULL-text safe on BOTH engines: Spark's size() yields -1 (legacy)
        # or NULL (ANSI) for a NULL array, DuckDB's len() yields NULL — all
        # normalize to 0 (mirrored as coalesce(len(...), 0) in the oracle).
        return F.when(F.size(c) >= 0, F.size(c)).otherwise(F.lit(0))

    def build(t):
        structs = [
            F.struct(
                F.lit(i).alias("f"),
                nn_size(F.filter(t, stop_pred(LANG_STOPWORDS[lang])))
                .cast("long").alias("cnt"),
            )
            for i, lang in enumerate(langs)
        ]
        structs.append(
            F.struct(
                F.lit(len(langs)).alias("f"),
                (nn_size(t) - F.lit(LOGREG_LEN_CENTER)).cast("long")
                .alias("cnt"),
            )
        )
        return F.array(*structs)

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
    spark = df.sparkSession
    feats = materialize_once(
        doc_features(df, id_col, text_col), "logreg_feats"
    )
    if label_expr is None:
        label_expr = F.col("n_chars") >= LOGREG_LABEL_CHARS
    ydf = df.select(
        id_col,
        F.when(label_expr, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("y"),
    )
    n = df.count()
    m = lr_den * n  # floor-div denominator for the lr/n * grad update

    w = {f: 0 for f in range(d)}
    b = 0

    def z_frame():
        wdf = spark.createDataFrame(
            [(f, w[f]) for f in range(d)], "f int, wq long"
        )
        s = (
            feats.join(F.broadcast(wdf), "f")
            .groupBy(id_col)
            .agg(F.sum(F.col("cnt") * F.col("wq")).cast("long").alias("s"))
        )
        return ydf.join(s, id_col, "left").select(
            id_col, "y",
            (F.lit(b) + F.coalesce("s", F.lit(0))).cast("long").alias("zq"),
        )

    for _ in range(n_rounds):
        e = z_frame().select(id_col, F.expr(LOGREG_E_SQL).alias("eq"))
        grads = {
            r["f"]: r["g"]
            for r in feats.join(e, id_col)
            .groupBy("f")
            .agg(F.sum(F.col("cnt") * F.col("eq")).cast("long").alias("g"))
            .collect()  # <= d rows — bounded like the k-means round collect
        }
        gb = e.agg(F.sum("eq").cast("long").alias("g")).collect()[0]["g"]
        for f in range(d):
            w[f] -= grads.get(f, 0) // m  # Python // floors, like the oracle
        b -= gb // m

    return z_frame().select(
        id_col,
        F.col("zq").alias("score_q"),
        (F.col("zq") >= 0).alias("pred"),
        "y",
    )
