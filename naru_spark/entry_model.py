"""Driver-gate entry for the neural estimator (rows-only: progressive
sampling is stochastic — correctness is gated statistically in
tests/test_model.py, mirroring the reference's q-error acceptance,
eval_model.py:258-265)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def q_psample_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train ResMADE on lineitem at sf_dir, score the seeded workload with
    ProgressiveSampling, and report per-query (est, true, q_err)."""
    from naru_spark.encoding import DictionaryEncoder
    from naru_spark.entry_queries import LINEITEM_COLS, workload
    from naru_spark.estimators import Oracle, q_error
    from naru_spark.estimators.progressive import ProgressiveSampling
    from naru_spark.model.train import NaruEstimator
    from naru_spark.sources import load_table

    df = load_table(spark, "lineitem", sf_dir, LINEITEM_COLS).cache()
    enc = DictionaryEncoder(LINEITEM_COLS).fit(df)
    meta = enc.table_meta(df, "lineitem")
    model = NaruEstimator(
        LINEITEM_COLS,
        hidden=64,
        blocks=2,
        max_model_domain=256,
        epochs=5,
        lr=5e-3,
        sample_rows=100_000,
        seed=0,
    ).fit(df, meta, enc)

    wl = list(workload())
    truths = Oracle(df).query_batch(wl)
    ps = ProgressiveSampling(model, num_samples=256, seed=7)
    ests = ps.estimate_batch(spark, wl)
    rows = [
        (i, float(e), int(t), float(q_error(e, t)) if t > 0 else None)
        for i, (e, t) in enumerate(zip(ests, truths))
    ]
    return spark.createDataFrame(
        rows, "query_id int, est_card double, true_card bigint, q_err double"
    )


def build_model_registry():
    return {"psample_estimates": q_psample_estimates}, {}
