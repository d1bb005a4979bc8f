"""Model-assisted quality curation: a trained logistic quality classifier
(the fastText-quality-filter analog every production corpus pipeline runs,
e.g. GPT-3's WebText-vs-CommonCrawl classifier) — re-expressed so the
WHOLE path stays in the correctness gate:

- features are the engine-proven rounded text statistics (length, mean
  token length, punctuation ratio, stopword ratio — each already
  hash-verified against DuckDB in the text entries);
- the weak label is the Gopher composite rule (a DIFFERENT rule family, so
  the classifier learns a real decision boundary, not an identity);
- training is full-batch numpy gradient descent on a bounded sample —
  deterministic given (corpus, seed), weights rounded to 6 decimals;
- scoring inlines the rounded weights as literals into a FIXED-ORDER
  linear form, so Spark and any SQL engine produce bit-identical logits
  (the sigmoid is monotone — thresholding the logit at 0 IS thresholding
  the probability at 0.5, and skipping exp() avoids cross-engine libm
  divergence).

At 100 TB: training touches a bounded sample once; scoring is one
row-local JVM expression over the corpus — zero shuffle, whole-stage
codegen, exactly like the hand-written quality score it upgrades.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

FEATURE_NAMES = ["f_len", "f_mtl", "punct_ratio", "stopword_ratio"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The classifier's feature columns, every one a rounded deterministic
    statistic: capped token count / 200, capped mean token length / 12,
    punctuation ratio, English stopword ratio."""
    from naru_spark.pipeline.text import with_text_stats

    d = with_text_stats(df, text_col)
    return d.withColumn(
        "f_len", F.round(F.least(F.col("n_tokens"), F.lit(200)) / 200.0, 6)
    ).withColumn(
        "f_mtl", F.round(F.least(F.col("mean_token_len"), F.lit(12.0)) / 12.0, 6)
    )


def train_logistic(X: np.ndarray, y: np.ndarray, iters: int = 400, lr: float = 1.0):
    """Full-batch logistic regression in numpy — deterministic (no
    minibatch order, float64, fixed iterations). Returns (weights, bias)
    rounded to 6 decimals, ready for literal inlining."""
    n, d = X.shape
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / n
        b -= lr * float(g.mean())
    return np.round(w, 6), round(float(b), 6)


def score_logit(df: DataFrame, weights, bias: float) -> DataFrame:
    """Inline the trained weights as literals into one fixed-order linear
    expression: logit = b + w0*f0 + w1*f1 + ... (left-associated adds over
    6-decimal operands — bit-identical across engines); pred = logit > 0
    (== probability > 0.5, sigmoid-free)."""
    d = quality_features(df)
    expr = F.lit(float(bias))
    for wv, name in zip(weights, FEATURE_NAMES):
        expr = expr + F.lit(float(wv)) * F.col(name)
    return d.withColumn("logit", F.round(expr, 6)).withColumn(
        "pred_keep", F.col("logit") > 0
    )
