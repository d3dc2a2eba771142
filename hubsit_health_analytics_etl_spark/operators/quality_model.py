"""Model-based document quality scoring — the learned complement of
the heuristic C4/Gopher filters in textanalysis.py (real pipelines
bootstrap a linear/fastText-style classifier from heuristic labels and
score the whole corpus with it; cf. the GPT-3/LLaMA data recipes).

Two-phase shape, mirroring the engine's KMeans-IVF / PQ posture:

1. TRAIN on a (small) labelled slice — distributed Spark ML
   LogisticRegression; the fitted model is a handful of floats.
2. SCORE the 100 TB corpus with those floats inlined as a LITERAL
   linear expression — pure map-side whole-stage-codegen arithmetic
   over the feature columns, no Python stage, no ML library on the
   scoring path, no shuffle. ``raw logit >= 0`` IS ``p >= 0.5``, so
   the keep decision never evaluates exp() (which also keeps the
   fixed-weight twin engine-portable: +/* are IEEE-deterministic
   cross-engine, exp() is not).

No reference counterpart (the pandas reference has no ML); beyond-
reference LLM-pipeline surface per the brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .textanalysis import quality_features

# Feature vector (order matters — weights pair positionally):
# stopword ratio, mean word length, punctuation ratio, tokens/100.
QUALITY_LR_FEATURES = ["swr", "mwl", "pr", "ntok_h"]


def quality_feature_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, swr, mwl, pr, ntok_h) — the raw heuristic features as
    plain double columns (map-only; one pass over the text)."""
    f = quality_features(text_col)
    return docs.select(
        "doc_id",
        f["stopword_ratio"].cast("double").alias("swr"),
        f["mean_word_len"].cast("double").alias("mwl"),
        f["punct_ratio"].cast("double").alias("pr"),
        (f["n_tokens"] / F.lit(100.0)).cast("double").alias("ntok_h"),
    )


def logit_expr(
    weights: list[float], intercept: float, cols: list[str] | None = None
) -> Column:
    """The literal linear logit  z = b + Σ w_i·x_i  as a fixed-order
    expression tree — identical arithmetic on any IEEE engine, so a
    fixed-weight variant can be oracle-hash-checked. ``z >= 0`` is the
    p >= 0.5 keep decision without ever computing exp."""
    cols = cols or QUALITY_LR_FEATURES
    assert len(weights) == len(cols)
    z: Column = F.lit(float(intercept))
    for w, c in zip(weights, cols):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def train_quality_lr(
    train: DataFrame,
    label_col: str = "label",
    feature_cols: list[str] | None = None,
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> tuple[list[float], float]:
    """Fit a distributed LogisticRegression on the feature frame and
    return (weights, intercept) — the MODEL is k floats collected to
    the driver (like the KMeans centroids / PQ codebooks), everything
    else stays on the cluster. Deterministic optimizer (L-BFGS) but
    float reduction order is engine/partitioning-specific, so trained
    weights are rows-only territory — quality is pinned by value
    bounds in pytest, not by a cross-engine hash."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feature_cols = feature_cols or QUALITY_LR_FEATURES
    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="features", handleInvalid="skip"
    ).transform(train)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    model = lr.fit(assembled)
    return [float(w) for w in model.coefficients], float(model.intercept)
