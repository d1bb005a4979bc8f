"""ProgressiveSampling — the reference's core estimator (B4), numpy edition.

Reference ``estimators.py:134-418``: per column in model order, softmax the
column's logits, multiply by the predicate's valid-bin vector, sum -> the
conditional selectivity of that predicate given the sampled prefix;
renormalize, multinomial-sample the next value, write its encoding into the
input buffer, forward again. Estimate = mean over samples of the product of
per-column masked sums x cardinality (estimators.py:356-363).

Reference parity notes:
- wildcard short-circuit (estimators.py:238-255) is implemented: models
  trained with column masking (made.py:186-191) write the MASK token for
  unfiltered columns and skip their forward passes;
- custom per-model column orderings are honored (``made.order``), and
  ``MultiOrderEnsemble`` averages estimates across orderings
  (estimators.py:409-418);
- domains above ``max_model_domain`` are equal-freq binned with fractional
  boundary masks (see model/binning.py) — the reference's BN estimator does
  the same re-discretization (estimators.py:683-740).

Batch scoring (``estimate_batch``): queries ship to executors via
``mapInPandas`` with the (small) model broadcast — the Spark replacement for
the reference's Ray-parallel eval (eval_model.py:303-375).
"""

from __future__ import annotations

import numpy as np

from naru_spark.estimators.base import CardEst
from naru_spark.model.train import NaruModel
from naru_spark.predicates import Query


class ProgressiveSampling(CardEst):
    name = "psample"

    def __init__(
        self,
        model: NaruModel,
        num_samples: int = 512,
        seed: int = 0,
        order: list[int] | None = None,
    ):
        """``order``: pin a multi-mask (order-cycled) model to one of its
        trained orderings before each query (made.update_order — exact
        in-place mask rebuild). None = use the model's current ordering."""
        super().__init__()
        self.model = model
        self.num_samples = num_samples
        self.seed = seed
        self.order = list(order) if order is not None else None
        self.name = f"psample_{num_samples}"

    def _masks(self, q: Query) -> list[np.ndarray | None]:
        """Per-column fractional model-bin masks; None for wildcards."""
        masks: list[np.ndarray | None] = [None] * len(self.model.columns)
        for c, op, v in zip(q.cols, q.ops, q.vals):
            i = self.model.columns.index(c)
            m = self.model.binnings[c].predicate_mask(op, v)
            masks[i] = m if masks[i] is None else masks[i] * m
        return masks

    def query(self, q: Query) -> float:
        made = self.model.made
        prev_order = None
        if self.order is not None and list(made.order) != list(self.order):
            # pin the shared multi-mask model to this estimator's ordering;
            # restored below so other estimators holding the same model
            # (e.g. an unpinned ProgressiveSampling created earlier) are
            # not silently re-ordered by this query
            prev_order = list(made.order)
            made.update_order(self.order)
        try:
            from naru_spark.predicates import DisjunctiveQuery, ie_terms

            if isinstance(q, DisjunctiveQuery):
                # OR of conjunctions by inclusion-exclusion: each term is
                # conjunctive (branch predicates concatenated — repeated
                # columns INTERSECT via _masks' mask product), so the whole
                # disjunction is 2^k - 1 runs of the conjunctive sampler.
                # Selectivities combine BEFORE the final ceil.
                sel = sum(
                    coef * self._sel_pinned(t) for coef, t in ie_terms(q)
                )
                sel = min(max(sel, 0.0), 1.0)
                return float(np.ceil(sel * self.model.meta.cardinality))
            return self._query_pinned(q)
        finally:
            if prev_order is not None:
                made.update_order(prev_order)

    def _query_pinned(self, q: Query) -> float:
        sel = self._sel_pinned(q)
        return float(np.ceil(sel * self.model.meta.cardinality))

    def query_weighted(self, q: Query, weight_col: str, weight_values) -> float:
        """NeuroCard-style weighted expectation over the model:

            E[ w(weight_col) * 1{pred} ] * cardinality

        With w = 1/fanout over a 1:N join-trained model this DOWNSCALES
        join-space probabilities back to the one side's base-table
        cardinality (each base row appears fanout times in the join, so
        1/fanout de-duplicates it in expectation) — the identity that lets
        one join-trained model answer base-table questions.

        ``weight_values`` is the per-MODEL-BIN weight vector for
        ``weight_col`` (exact when the column is unbinned — its domain
        fits max_model_domain — which the caller should ensure for
        fanouts). The weight column must be LAST in the model's ordering:
        its expectation is taken conditioned on the full sampled prefix,
        Σ_v P(v | prefix) w(v), and nothing samples after it — putting it
        earlier would require integrating the rest of the chain over v.
        The column must also be unfiltered in ``q``."""
        made = self.model.made
        cols = self.model.columns
        wi = cols.index(weight_col)
        assert made.order[-1] == wi, "weight column must be last in the ordering"
        assert weight_col not in q.cols, "weight column must be unfiltered"
        w_vec = np.asarray(weight_values, dtype=np.float64)

        rng = np.random.RandomState(self.seed)
        S = self.num_samples
        masks = self._masks(q)
        made.begin_sampling(S)
        bits = made.new_input_buffer(S)
        p = np.ones(S, dtype=np.float64)
        use_fast = hasattr(made, "sample_logits_for_col")
        for c in made.order:
            is_weight = c == wi
            if not is_weight and masks[c] is None and made.column_masking:
                made.write_mask_token(bits, c)
                continue
            if use_fast:
                lg = made.sample_logits_for_col(c, bits)
            else:
                h = made.hidden_nograd(bits)
                lg = made.logits_for_col(c, h)
            mx = lg.max(axis=1, keepdims=True)
            probs = np.exp(lg - mx)
            probs /= probs.sum(axis=1, keepdims=True)
            if is_weight:
                # last column: fold in E[w | prefix]; no further sampling
                p *= probs @ w_vec
                break
            mask = masks[c]
            if mask is not None:
                masked = probs * mask[None, :]
                s = masked.sum(axis=1)
                p *= s
                safe = np.where(s > 0, s, 1.0)
                dist = masked / safe[:, None]
                dist[s <= 0] = 0
                dist[s <= 0, 0] = 1.0
            else:
                dist = probs
            cum = dist.cumsum(axis=1)
            u = rng.rand(S, 1)
            choice = np.minimum((u > cum).sum(axis=1), dist.shape[1] - 1)
            made._write_bits(bits, c, choice)
        return float(np.ceil(p.mean() * self.model.meta.cardinality))

    def query_batch(self, queries: list[Query], threads: int | None = None):
        """THREADED batch scoring on one node (the reference evaluates its
        2000-query sweeps in parallel workers, eval_model.py RunNParallel;
        this is the single-process analog): MADE sampling keeps no
        cross-query state beyond per-forward scratch slots
        (``_x_in``/``_caches``, written even in nograd mode), so each
        worker thread scores through a SHALLOW clone of the model —
        weight arrays shared read-only, scratch slots private — and the
        heavy matmuls release the GIL inside BLAS. Results are
        BIT-IDENTICAL to the sequential loop (each query seeds its own
        RandomState exactly as ``query`` does). OPT-IN via ``threads``:
        the default stays the sequential loop so callers that time
        ``query_batch`` as per-query LATENCY (the estimator reports'
        mean_ms split) keep a comparable measurement regime — threading
        would silently turn those into amortized throughput. Also falls
        back to sequential for order-pinned estimators (``update_order``
        mutates the shared masks), stateful samplers (the transformer's
        KV caches — no ``sampling_stateless`` flag), and tiny batches."""
        made = self.model.made
        if (
            threads is None
            or threads <= 1
            or self.order is not None
            or not getattr(made, "sampling_stateless", False)
            or len(queries) < 8
        ):
            return [self.query(q) for q in queries]
        import copy
        import os
        from concurrent.futures import ThreadPoolExecutor

        n = max(1, min(threads, os.cpu_count() or 8, len(queries)))
        results: list = [None] * len(queries)

        def run(k: int) -> None:
            m = copy.copy(self.model)
            m.made = copy.copy(made)
            w = ProgressiveSampling(
                m, num_samples=self.num_samples, seed=self.seed
            )
            for i in range(k, len(queries), n):
                results[i] = w.query(queries[i])

        with ThreadPoolExecutor(max_workers=n) as ex:
            list(ex.map(run, range(n)))
        return results

    def _sel_pinned(self, q: Query) -> float:
        rng = np.random.RandomState(self.seed)
        made = self.model.made
        S = self.num_samples
        masks = self._masks(q)

        made.begin_sampling(S)
        bits = made.new_input_buffer(S)
        p = np.ones(S, dtype=np.float64)
        # incremental decode (transformer KV-cache path) when the model
        # offers it — the reference's EncodeInputInference idea
        # (transformer.py:495-530), extended to per-block K/V caches
        use_fast = hasattr(made, "sample_logits_for_col")
        # resolve the variable ordering from the model (reference
        # estimators.py:370-389) — natural for default models
        for c in made.order:
            if masks[c] is None and made.column_masking:
                # wildcard short-circuit (estimators.py:238-255): the model
                # was trained with masked inputs, so writing the MASK token
                # and skipping this column's forward + sampling is sound —
                # forwards per query = #filtered columns, not #columns.
                made.write_mask_token(bits, c)
                continue
            if use_fast:
                lg = made.sample_logits_for_col(c, bits)
            else:
                h = made.hidden_nograd(bits)
                lg = made.logits_for_col(c, h)
            mx = lg.max(axis=1, keepdims=True)
            probs = np.exp(lg - mx)
            probs /= probs.sum(axis=1, keepdims=True)
            mask = masks[c]
            if mask is not None:
                masked = probs * mask[None, :]
                s = masked.sum(axis=1)
                p *= s
                # guard vanished paths (estimators.py:278-279)
                safe = np.where(s > 0, s, 1.0)
                dist = masked / safe[:, None]
                dist[s <= 0] = 0
                dist[s <= 0, 0] = 1.0
            else:
                dist = probs
            cum = dist.cumsum(axis=1)
            u = rng.rand(S, 1)
            choice = np.minimum((u > cum).sum(axis=1), dist.shape[1] - 1)
            made._write_bits(bits, c, choice)
        return float(p.mean())

    # ------------------------------------------------------- batch scoring
    def estimate_batch(
        self,
        spark,
        queries: list[Query],
        partitions: int | None = None,
        min_distribute: int = 64,
    ):
        """Distribute query scoring: each executor gets the broadcast model
        and scores its partition of queries via mapInPandas.

        Batches under ``min_distribute`` queries run on the driver — the
        broadcast + job-launch overhead (~1s) dwarfs per-query cost (~10ms)
        until the batch is big enough to amortize it; the distributed path
        is for the reference's 2000-query eval sweeps (eval_model.py
        RunNParallel), not interactive handfuls."""
        import pandas as pd

        if len(queries) < min_distribute:
            return [float(self.query(q)) for q in queries]

        model_bc = spark.sparkContext.broadcast(self.model)
        S, seed, order = self.num_samples, self.seed, self.order
        # query values shipped as a broadcast of the original objects keyed
        # by id — stringify + re-parse would be lossy for timestamps/floats
        q_bc = spark.sparkContext.broadcast({i: q for i, q in enumerate(queries)})
        n_part = partitions or min(len(queries), 32)
        idx_df = spark.createDataFrame([(i,) for i in range(len(queries))], "qid int").repartition(
            n_part
        )

        def score(batches):
            model = model_bc.value
            # thread the order pin: an order-pinned estimator (e.g. a
            # MultiOrderEnsemble sub) must score with ITS ordering, not
            # whatever ordering the broadcast model happened to carry
            est = ProgressiveSampling(model, num_samples=S, seed=seed, order=order)
            qmap = q_bc.value
            for pdf in batches:
                out = []
                for qid in pdf["qid"]:
                    out.append({"qid": int(qid), "est_card": est.query(qmap[int(qid)])})
                yield pd.DataFrame(out)

        res = idx_df.mapInPandas(score, schema="qid int, est_card double").collect()
        by_id = {r.qid: r.est_card for r in res}
        return [by_id[i] for i in range(len(queries))]


class MultiOrderEnsemble(CardEst):
    """Multi-ordering ensemble (reference estimators.py:409-418 and the
    multi-order NLL of train_model.py:208-228): average the estimates of K
    models trained with different autoregressive orderings, each given
    num_samples/K progressive samples. Orderings decorrelate the sampling
    error of highly-selective conjunctions."""

    name = "psample_multiorder"

    def __init__(self, models, num_samples: int = 512, seed: int = 0):
        super().__init__()
        total = max(1, num_samples // len(models))
        self.subs = [ProgressiveSampling(m, num_samples=total, seed=seed + i) for i, m in enumerate(models)]
        self.name = f"psample_{len(models)}orders_{num_samples}"

    @classmethod
    def from_single_model(
        cls, model: NaruModel, orders: list[list[int]], num_samples: int = 512, seed: int = 0
    ) -> "MultiOrderEnsemble":
        """Ensemble over ONE order-cycled multi-mask model (reference
        made.py:277-393 + estimators.py:409-418): each sub-estimator pins
        the shared weights to one trained ordering via update_order —
        K orderings at 1x training cost instead of K separate fits."""
        self = cls.__new__(cls)
        CardEst.__init__(self)
        total = max(1, num_samples // len(orders))
        self.subs = [
            ProgressiveSampling(model, num_samples=total, seed=seed + i, order=list(o))
            for i, o in enumerate(orders)
        ]
        self.name = f"psample_multimask_{len(orders)}orders_{num_samples}"
        return self

    def query(self, q: Query) -> float:
        return float(np.mean([s.query(q) for s in self.subs]))


class SampleFromModel(CardEst):
    """Monte-Carlo baseline (reference estimators.py:421-477): draw N full
    tuples from the model, evaluate the predicate on the samples, scale."""

    name = "sample_from_model"

    def __init__(self, model: NaruModel, num_samples: int = 2000, seed: int = 0):
        super().__init__()
        self.model = model
        self.num_samples = num_samples
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self._samples = self.model.made.sample(num_samples, self.rng)

    def query(self, q: Query) -> float:
        from naru_spark.predicates import ie_terms

        # inclusion-exclusion handles DisjunctiveQuery; conjunctive input
        # is its own single term with coefficient 1
        frac = 0.0
        for coef, t in ie_terms(q):
            masks = ProgressiveSampling(self.model)._masks(t)
            keep = np.ones(self.num_samples, dtype=np.float64)
            for i, m in enumerate(masks):
                if m is not None:
                    keep *= m[self._samples[:, i]]
            frac += coef * keep.mean()
        frac = min(max(frac, 0.0), 1.0)
        return float(np.ceil(frac * self.model.meta.cardinality))
