"""Training pipeline: Spark-encoded data -> numpy ResMADE.

MLlib-style Estimator/Model pair (the north star's "MLlib pipeline + custom
estimator"): ``NaruEstimator.fit(df)`` runs the Spark side (dictionary fit,
model-bin encode, optional sample) and then the driver-side training loop
(reference RunEpoch, train_model.py:126-253).

Scale path: the training matrix is collected through ``sample_rows`` — at
100 TB you train on a uniform sample (the estimator's accuracy depends on
rows seen, not on epoch-ing the full table; the reference trains single-node
on the full 11.6M-row DMV, which a 1%% sample of 1B rows matches). The
encode stage itself is fully distributed (DictionaryEncoder.transform).
"""

from __future__ import annotations

import time

import numpy as np
from pyspark.sql import DataFrame, functions as F

from naru_spark.encoding import DictionaryEncoder
from naru_spark.meta import TableMeta
from naru_spark.model.binning import ModelBinning
from naru_spark.model.made import Adam, ResMADE


def lr_schedule(
    global_step: int,
    d_model: int,
    warmups: int | None = None,
    constant_lr: float | None = None,
) -> float:
    """Per-step learning rate (reference train_model.py:153-167):
    ``constant_lr`` wins if set; else Noam warmup
    d_model^-0.5 * min(step^-0.5, step * warmups^-1.5); else the
    reference's 1e-2 fallback. ``global_step`` is 1-based
    (steps_per_epoch * epoch + step + 1 in the reference)."""
    if constant_lr:
        return constant_lr
    if warmups:
        return (d_model**-0.5) * min(global_step**-0.5, global_step * warmups**-1.5)
    return 1e-2


class NaruModel:
    """Fitted model: ResMADE + per-column binnings + meta."""

    def __init__(
        self,
        made: ResMADE,
        binnings: dict[str, ModelBinning],
        meta: TableMeta,
        columns: list[str],
        fit_info: dict | None = None,
    ):
        self.made = made
        self.binnings = binnings
        self.meta = meta
        self.columns = columns
        # arch / epochs / seed / model_bits, recorded by NaruEstimator.fit
        # for the checkpoint name (reference train_model.py:427-447)
        self.fit_info = fit_info or {}

    def size_mb(self) -> float:
        """Param count x 4 bytes (reference train_model.py:256-265)."""
        return self.made.num_params() * 4 / 1024**2

    def save(self, path: str) -> None:
        """Pickle the WHOLE fitted bundle (weights + binnings + dictionaries
        + meta) — one artifact restores estimation with zero Spark work, the
        torch.save analog of reference train_model.py:427-447. Store on any
        shared FS / object store for executor-side loading."""
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self, f)

    @classmethod
    def load(cls, path: str) -> "NaruModel":
        import pickle

        with open(path, "rb") as f:
            m = pickle.load(f)
        if not isinstance(m, cls):
            raise TypeError(f"checkpoint at {path} is {type(m).__name__}")
        return m


class NaruEstimator:
    """Fit an AR density model over a table's columns."""

    def __init__(
        self,
        columns: list[str],
        hidden: int = 64,
        blocks: int = 2,
        max_model_domain: int = 256,
        epochs: int = 10,
        batch_size: int = 1024,
        lr: float = 5e-3,
        sample_rows: int | None = 200_000,
        seed: int = 0,
        verbose: bool = False,
        column_masking: bool = True,
        order: list[int] | None = None,
        arch: str = "made",  # "made" (ResMADE) | "transformer" (reference MakeTransformer analog)
        input_encoding: str = "binary",  # "binary" | "one_hot" | "embed" (reference made.py:595-612)
        embed_size: int = 32,
        warmups: int | None = None,  # Noam warmup steps (reference train_model.py:153-167); None = constant self.lr
        data_bits: float | None = None,  # table entropy, for the verbose entropy-gap log (train_model.py:232-238)
        order_cycle: list[list[int]] | None = None,  # K orderings for ONE multi-mask model (reference made.py:277-393)
        direct_io: bool = False,  # input->output skip connections (reference made.py:208-247; recommended DMV config)
        output_encoding: str = "one_hot",  # "one_hot" | "embed" (tied decode, made.py:645-674; needs input_encoding="embed")
        input_no_emb_if_leq: bool = False,  # skip the embedding for domain <= embed_size columns (reference made.py:96,180)
        num_masks: int = 1,  # connectivity-mask cycling (reference made.py:83,129,194); 1 = fixed ResMade masks
    ):
        self.columns = columns
        self.hidden = hidden
        self.blocks = blocks
        self.max_model_domain = max_model_domain
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.sample_rows = sample_rows
        self.seed = seed
        self.verbose = verbose
        self.column_masking = column_masking
        self.order = order
        assert arch in ("made", "transformer")
        self.arch = arch
        self.input_encoding = input_encoding
        self.embed_size = embed_size
        self.warmups = warmups
        self.data_bits = data_bits
        self.order_cycle = [list(o) for o in order_cycle] if order_cycle else None
        if self.order_cycle:
            assert arch == "made", "order cycling: ResMADE only"
        self.num_masks = int(num_masks)
        if self.num_masks > 1:
            assert arch == "made", "mask cycling: ResMADE only"
        self.direct_io = direct_io
        self.output_encoding = output_encoding
        self.input_no_emb_if_leq = input_no_emb_if_leq

    def fit(
        self,
        df: DataFrame,
        meta: TableMeta | None = None,
        encoder: DictionaryEncoder | None = None,
        warm_start: "NaruModel | None" = None,
    ) -> NaruModel:
        """``warm_start``: continue training from an existing model's
        weights instead of a fresh init — the production refresh path
        (nightly re-fit starts near yesterday's solution and converges in
        a fraction of the epochs; measured in model_refresh_report).
        Requires the same architecture and the SAME binnings/encoder
        (domain-stable refresh — shapes are asserted); the optimizer
        state starts fresh, matching the common warm-restart practice."""
        t0 = time.time()
        if encoder is None:
            encoder = DictionaryEncoder(self.columns).fit(df)
        if meta is None:
            meta = encoder.table_meta(df, "table")
        binnings = {
            c: ModelBinning(encoder.dictionaries[c], self.max_model_domain) for c in self.columns
        }

        # Spark side: encode to raw bins, optionally uniform-sample, collect
        # the [N, D] int32 training matrix (reference TableDataset,
        # common.py:237-251 — there the full table; here sample-bounded).
        src = df.select(*self.columns)
        if self.sample_rows is not None and meta.cardinality > self.sample_rows:
            # sample BEFORE encoding: the dictionary join/searchsorted then
            # touches sample_rows rows, not the full table
            frac = min(1.0, self.sample_rows / meta.cardinality * 1.1)
            src = src.sample(fraction=frac, seed=self.seed)
        encoded = encoder.transform(src)
        bin_cols = [f"{c}__bin" for c in self.columns]
        pdf = encoded.select(*bin_cols).toPandas()
        raw = pdf.to_numpy(dtype=np.int64)
        data = np.stack(
            [binnings[c].encode(raw[:, i]) for i, c in enumerate(self.columns)], axis=1
        )

        sizes = [binnings[c].model_size for c in self.columns]
        if self.arch == "transformer":
            from naru_spark.model.transformer import AdamT, ARTransformer

            made = ARTransformer(
                sizes,
                d_model=self.hidden,
                d_ff=self.hidden * 4,
                n_heads=4,
                blocks=self.blocks,
                seed=self.seed,
                dtype=np.float32,
                column_masking=self.column_masking,
                order=self.order,
            )
            opt = AdamT(made, lr=self.lr)
            if warm_start is not None:
                src = warm_start.made
                assert self.arch == warm_start.fit_info.get("arch", "made")
                for p_dst, p_src in zip(made.params(), src.params()):
                    assert p_dst.v.shape == p_src.v.shape, "warm_start shape mismatch"
                    p_dst.v = p_src.v.copy()
        else:
            made = ResMADE(
                sizes,
                hidden=self.hidden,
                blocks=self.blocks,
                seed=self.seed,
                dtype=np.float32,  # sgemm: ~2x the float64 training throughput
                column_masking=self.column_masking,
                order=self.order,
                input_encoding=self.input_encoding,
                embed_size=self.embed_size,
                direct_io=self.direct_io,
                output_encoding=self.output_encoding,
                input_no_emb_if_leq=self.input_no_emb_if_leq,
            )
            opt = Adam(made, lr=self.lr)
            if warm_start is not None:
                src = warm_start.made
                assert warm_start.fit_info.get("arch", "made") == "made"
                for l_dst, l_src in zip(made.layers(), src.layers()):
                    assert l_dst.W.shape == l_src.W.shape, "warm_start shape mismatch"
                    l_dst.W, l_dst.b = l_src.W.copy(), l_src.b.copy()
        rng = np.random.RandomState(self.seed)
        N = len(data)
        D = len(self.columns)
        loss = float("nan")
        tot, nb = 0.0, 0
        # encode the whole training matrix ONCE (N x n_bits float32); the
        # per-batch work is then a row gather + vectorized mask apply
        pre_bits = None
        if self.arch == "made":
            pre_bits = made.encode_bits(data)
        global_step = 0
        for epoch in range(self.epochs):
            perm = rng.permutation(N)
            tot, nb = 0.0, 0
            for lo in range(0, N, self.batch_size):
                global_step += 1
                if self.warmups:
                    # d_model analog: the reference uses model.embed_size
                    opt.lr = lr_schedule(global_step, self.hidden, self.warmups)
                if self.num_masks > 1:
                    # one weight set, K CONNECTIVITY patterns: resample the
                    # hidden degrees per step from a cycling seed (reference
                    # num_masks, made.py:83,129,194) — composes with order
                    # cycling below (orderings rebuild in/out masks on top
                    # of whatever hidden degrees are active)
                    made.resample_masks(self.seed + (global_step % self.num_masks))
                if self.order_cycle:
                    # one weight set, K orderings: rebuild the two
                    # order-dependent masks per step (made.update_order) —
                    # the reference's multi-mask training (made.py:277-393)
                    made.update_order(self.order_cycle[global_step % len(self.order_cycle)])
                idx = perm[lo : lo + self.batch_size]
                b = data[idx]
                observed = None
                if self.column_masking:
                    # wildcard dropout (reference made.py:186-191): per batch
                    # draw a masking rate, then Bernoulli per (row, column)
                    p_mask = rng.randint(0, D + 1) / D
                    observed = rng.rand(len(b), D) >= p_mask
                if pre_bits is not None:
                    bits_b = pre_bits[idx]
                    if observed is not None:
                        bits_b = made.apply_observed(bits_b, observed)
                    logits = made.forward_encoded(bits_b)
                else:
                    logits = made.forward(b, observed=observed)
                loss, dl = made.nll(logits, b)
                made.zero_grad()
                made.backward(dl)
                opt.step()
                tot += loss
                nb += 1
            if self.verbose:
                bits = tot / nb / np.log(2)
                gap = "" if self.data_bits is None else f" entropy gap {bits - self.data_bits:.4f} bits"
                print(
                    f"epoch {epoch}: nll {tot/nb:.4f} nats ({bits:.3f} bits/tuple){gap}"
                    f" lr {opt.lr:.5f} [{time.time()-t0:.0f}s]"
                )
        model_bits = float(tot / nb / np.log(2)) if nb else float("nan")
        fit_info = {
            "arch": self.arch,
            "epochs": self.epochs,
            "seed": self.seed,
            "model_bits": model_bits,
            "input_encoding": self.input_encoding,
        }
        return NaruModel(made, binnings, meta, list(self.columns), fit_info=fit_info)

    def fit_distributed(
        self,
        df: DataFrame,
        meta: TableMeta | None = None,
        encoder: DictionaryEncoder | None = None,
        rounds: int = 2,
        local_epochs: int | None = None,
    ) -> NaruModel:
        """Data-parallel fit: partition-local SGD + row-weighted parameter
        averaging per round (local-SGD / FedAvg-style — the standard
        synchronous data-parallel scheme when per-batch gradient all-reduce
        isn't available, which from Python-on-Spark it is not).

        Contrast with ``fit`` (collect a bounded sample to the driver, train
        there): here NO row leaves its executor — each partition trains
        ``local_epochs`` on its own shard from the same broadcast weights,
        ships back one weight vector (model-sized, ~MBs), and the driver
        averages weighted by shard row count. At 100 TB that is the only
        shape that works on the FULL table: network cost per round is
        O(partitions x model size), not O(rows).

        Rounds trade communication for staleness: more rounds -> closer to
        single-node SGD on the shuffled union. Deterministic given a fixed
        input partitioning (per-partition RNG seeded by partition id).
        """
        import pickle
        import warnings

        if self.arch not in ("made", "transformer"):
            raise NotImplementedError(f"distributed fit: unknown arch {self.arch}")
        if self.warmups or self.order_cycle:
            # shard-local SGD runs constant-lr, single-ordering; a model
            # configured with these would silently train differently here
            # than through fit()
            warnings.warn(
                "fit_distributed ignores warmups/order_cycle: shards train "
                "with constant lr and the model's single fixed ordering",
                stacklevel=2,
            )
        if encoder is None:
            encoder = DictionaryEncoder(self.columns).fit(df)
        if meta is None:
            meta = encoder.table_meta(df, "table")
        binnings = {
            c: ModelBinning(encoder.dictionaries[c], self.max_model_domain) for c in self.columns
        }
        sizes = [binnings[c].model_size for c in self.columns]
        bin_cols = [f"{c}__bin" for c in self.columns]
        encoded = encoder.transform(df.select(*self.columns)).select(*bin_cols)

        arch = self.arch
        columns = list(self.columns)
        hidden, blocks, seed = self.hidden, self.blocks, self.seed
        column_masking, order = self.column_masking, self.order
        input_encoding, embed_size = self.input_encoding, self.embed_size
        direct_io, output_encoding = self.direct_io, self.output_encoding
        input_no_emb_if_leq = self.input_no_emb_if_leq
        num_masks = self.num_masks
        epochs = local_epochs if local_epochs is not None else self.epochs
        batch_size, lr = self.batch_size, self.lr
        sc = df.sparkSession.sparkContext

        # Arch-agnostic worker protocol, closed over LOCALS only (no self):
        # identical construction on driver and every shard (same seed, so
        # parameter shapes always line up — only VALUES travel), plus flat
        # get/install of the trainable arrays. ResMADE exchanges (W, b) per
        # layer; the transformer exchanges its flat Param list.
        def construct():
            if arch == "transformer":
                from naru_spark.model.transformer import ARTransformer

                return ARTransformer(
                    sizes, d_model=hidden, d_ff=hidden * 4, n_heads=4,
                    blocks=blocks, seed=seed, dtype=np.float32,
                    column_masking=column_masking, order=order,
                )
            return ResMADE(
                sizes, hidden=hidden, blocks=blocks, seed=seed,
                dtype=np.float32, column_masking=column_masking, order=order,
                input_encoding=input_encoding, embed_size=embed_size,
                direct_io=direct_io, output_encoding=output_encoding,
                input_no_emb_if_leq=input_no_emb_if_leq,
            )

        def get_weights(m):
            if arch == "transformer":
                return [p.v.copy() for p in m.params()]
            return [(l.W.copy(), l.b.copy()) for l in m.layers()]

        def install_weights(m, ws, cast32: bool = False):
            if arch == "transformer":
                for p, w in zip(m.params(), ws):
                    p.v = w.astype(np.float32) if cast32 else w.copy()
            else:
                for l, (W, b) in zip(m.layers(), ws):
                    if cast32:
                        l.W, l.b = W.astype(np.float32), b.astype(np.float32)
                    else:
                        l.W, l.b = W.copy(), b.copy()

        made = construct()

        # Ship ONLY the per-column raw->model lookup arrays (all encode()
        # needs), broadcast once for all rounds — closure-capturing the
        # binnings dict would serialize every ColumnDictionary into every
        # task of every round (O(distinct values) per high-card column).
        enc_bc = sc.broadcast({c: binnings[c].raw_to_model for c in columns})

        weights = get_weights(made)
        for rnd in range(rounds):
            w_bc = sc.broadcast(pickle.dumps(weights))

            def train_shard(batches):
                import pandas as pd
                from pyspark import TaskContext

                pdfs = [p for p in batches if len(p)]
                if not pdfs:
                    return
                raw = pd.concat(pdfs).to_numpy(dtype="int64")
                lookup = enc_bc.value
                data = np.stack(
                    [lookup[c][raw[:, i]] for i, c in enumerate(columns)], axis=1
                )
                local = construct()
                install_weights(local, pickle.loads(w_bc.value))
                if num_masks > 1:
                    # connectivity-mask cycling on the distributed path: one
                    # mask per ROUND, identical across shards (seeded by the
                    # round index, not the step counter) — shards must train
                    # under the SAME connectivity or the row-weighted weight
                    # average mixes incompatible masked subnetworks.
                    local.resample_masks(seed + (rnd % num_masks))
                if arch == "transformer":
                    from naru_spark.model.transformer import AdamT

                    opt = AdamT(local, lr=lr)
                else:
                    opt = Adam(local, lr=lr)
                pid = TaskContext.get().partitionId() if TaskContext.get() else 0
                rng = np.random.RandomState(seed + 1009 * rnd + pid)
                N, D = len(data), len(columns)
                # MADE pre-encodes the whole shard to input bits once; the
                # transformer embeds per batch inside forward()
                pre_bits = local.encode_bits(data) if arch == "made" else None
                for _ in range(epochs):
                    perm = rng.permutation(N)
                    for lo in range(0, N, batch_size):
                        idx = perm[lo : lo + batch_size]
                        b = data[idx]
                        observed = None
                        if column_masking:
                            p_mask = rng.randint(0, D + 1) / D
                            observed = rng.rand(len(b), D) >= p_mask
                        if pre_bits is not None:
                            bits_b = pre_bits[idx]
                            if observed is not None:
                                bits_b = local.apply_observed(bits_b, observed)
                            logits = local.forward_encoded(bits_b)
                        else:
                            logits = local.forward(b, observed=observed)
                        _, dl = local.nll(logits, b)
                        local.zero_grad()
                        local.backward(dl)
                        opt.step()
                yield pd.DataFrame({"n": [N], "w": [pickle.dumps(get_weights(local))]})

            rows = encoded.mapInPandas(train_shard, schema="n long, w binary").collect()
            if not rows:
                raise ValueError(
                    "fit_distributed: input DataFrame is empty (no partition yielded rows)"
                )
            total = sum(r.n for r in rows)
            acc = None
            for r in rows:
                shard = pickle.loads(bytes(r.w))
                frac = r.n / total
                if arch == "transformer":  # flat Param arrays
                    if acc is None:
                        acc = [w * frac for w in shard]
                    else:
                        acc = [a + w * frac for a, w in zip(acc, shard)]
                elif acc is None:
                    acc = [(W * frac, b * frac) for W, b in shard]
                else:
                    acc = [
                        (aW + W * frac, ab + b * frac)
                        for (aW, ab), (W, b) in zip(acc, shard)
                    ]
            weights = acc
            w_bc.unpersist()
        enc_bc.unpersist()

        if num_masks > 1:
            # The averaged weights were trained under the per-round cycled
            # connectivity masks, never under the construction-time
            # deterministic masks — leave the driver model on the LAST
            # round's mask (the single-node fit() likewise ends on its last
            # trained mask), or inference would run averaged weights under
            # an untrained connectivity pattern.
            made.resample_masks(seed + ((rounds - 1) % num_masks))
        install_weights(made, weights, cast32=True)
        fit_info = {
            "arch": arch,
            "epochs": epochs * rounds,
            "seed": seed,
            "model_bits": float("nan"),
            "distributed_rounds": rounds,
            "input_encoding": self.input_encoding,
        }
        return NaruModel(made, binnings, meta, list(self.columns), fit_info=fit_info)


def model_nll_rows(model, data: np.ndarray, chunk_rows: int = 4096) -> np.ndarray:
    """Per-row NLL (nats) of ``data`` under ``model``, evaluated in chunks.

    Chunking is a measured 3x win over a one-shot 20k-row forward for the
    transformer arch: each layer of a one-shot forward allocates fresh
    100MB+ activation arrays (page-fault bound in a JVM-heavy process),
    while 4k-row chunks stay inside the allocator's warm pool. Per-row
    results are independent, so chunking is exact (float-noise only).
    """
    made = getattr(model, "made", model)
    outs = []
    for i in range(0, len(data), chunk_rows):
        c = data[i : i + chunk_rows]
        outs.append(made.nll_rows(made.forward(c, grad=False), c))
    return np.concatenate(outs) if outs else np.zeros(0)


def multi_order_nll(
    models: list,
    data: np.ndarray,
    orders: list[list[int]] | None = None,
    per_row_nll: list[np.ndarray] | None = None,
) -> float:
    """Test-time multi-order ensemble NLL (reference train_model.py:208-228):

        p(x) = 1/K sum_i p_i(x)
        -log p(x) = -( logsumexp_i( -nll_i(x) ) + log(1/K) )

    ``models``: fitted per-ordering models (NaruModel bundles or bare
    ResMADEs over the same columns/binnings); ``data``: [N, D] model-bin
    matrix (the eval split). With ``orders``, a SINGLE multi-mask model
    is forwarded once per ordering (update_order in-place — the
    reference's num_orderings loop over one model) instead of one model
    per ordering. With ``per_row_nll`` (one [N] nats array per model, e.g.
    from ``model_nll_rows``), the forwards are skipped entirely — callers
    that already report per-member NLLs shouldn't pay for them twice.
    Returns the mean over rows, in nats — report next to
    MultiOrderEnsemble's estimates."""
    if per_row_nll is not None:
        logps = [-nll for nll in per_row_nll]
        K = len(per_row_nll)
    elif orders is not None:
        assert len(models) == 1, "orders: pass exactly one multi-mask model"
        made = getattr(models[0], "made", models[0])
        prev_order = list(made.order)
        logps = []
        try:
            for o in orders:
                made.update_order(list(o))
                logps.append(-model_nll_rows(made, data))
        finally:
            # leave the shared model as we found it — other estimators may
            # hold it
            made.update_order(prev_order)
        K = len(orders)
    else:
        K = len(models)
        logps = [-model_nll_rows(m, data) for m in models]
    lp = np.stack(logps, axis=1)  # [N, K]
    mx = lp.max(axis=1, keepdims=True)
    lse = mx[:, 0] + np.log(np.exp(lp - mx).sum(axis=1))
    return float(np.mean(-(lse + np.log(1.0 / K))))


def multi_mask_nll(
    model, data: np.ndarray, mask_seeds: list[int | None]
) -> float:
    """Connectivity-mask ensemble NLL — the ``num_masks`` analog of
    ``multi_order_nll``'s ``orders`` mode (reference made.py:83,129,194):
    ONE weight set is evaluated under each connectivity pattern in
    ``mask_seeds`` (``None`` = the deterministic ResMade pattern) and the
    per-row likelihoods mix by logsumexp. The model's masks are restored
    to their entry state afterwards — other estimators may hold it."""
    made = getattr(model, "made", model)
    prev = None if getattr(made, "hid_deg", None) is None else made.hid_deg.copy()
    prev_is_default = prev is None or np.array_equal(
        prev, (np.arange(made.hidden) % max(made.D - 1, 1)) + 1
    )
    logps = []
    try:
        for seed in mask_seeds:
            made.resample_masks(seed)
            logps.append(-model_nll_rows(made, data))
    finally:
        if prev_is_default:
            made.resample_masks(None)
        else:
            # rebuild every hidden-degree mask from the saved vector
            made.hid_deg = prev
            dt = made.lin_in.M.dtype
            for l1, l2 in made.blocks:
                M = (prev[None, :] >= prev[:, None]).astype(dt)
                l1.M = M
                l2.M = M.copy()
            made._rebuild_order_masks()
    K = len(mask_seeds)
    lp = np.stack(logps, axis=1)
    mx = lp.max(axis=1, keepdims=True)
    lse = mx[:, 0] + np.log(np.exp(lp - mx).sum(axis=1))
    return float(np.mean(-(lse + np.log(1.0 / K))))


def table_bits(df: DataFrame, columns: list[str]) -> float:
    """Empirical joint entropy in bits (reference Entropy,
    train_model.py:112-123, 340-343) — one groupBy job."""
    counts = df.groupBy(*columns).agg(F.count("*").alias("cnt"))
    total = df.count()
    row = counts.agg(
        (-F.sum((F.col("cnt") / total) * F.log2(F.col("cnt") / total))).alias("H")
    ).collect()[0]
    return float(row["H"])


# --------------------------------------------------------- checkpoint naming
# Reference naming (train_model.py:427-447):
#   <dataset>-<MB>MB-model<bits>-data<bits>-<arch>-<epochs>epochs-seed<seed>
#   [-order<o0>_<o1>_...].pt
# The -order suffix is appended for non-natural orderings (train_model.py:
# 440-443) and parsed back at eval time (eval_model.py:497-507) — without
# it, two differently-ordered checkpoints of the same architecture collide
# to the same filename. Same scheme here, .ckpt suffix.
_CKPT_RE = __import__("re").compile(
    r"^(?P<dataset>.+)-(?P<mb>[\d.]+)MB-model(?P<model_bits>[\d.]+|nan)"
    r"-data(?P<data_bits>[\d.]+|nan)-(?P<arch>[a-z]+)"
    r"-(?P<epochs>\d+)epochs-seed(?P<seed>\d+)(?:-order(?P<order>\d+(?:_\d+)*))?\.ckpt$"
)


def checkpoint_name(model: NaruModel, dataset: str, data_bits: float = float("nan")) -> str:
    """Self-describing checkpoint file name from the fitted model's
    metadata; ``data_bits`` is the table entropy (table_bits)."""
    fi = model.fit_info
    order = list(getattr(model.made, "order", []))
    suffix = ""
    if order and order != list(range(len(order))):
        suffix = "-order" + "_".join(map(str, order))
    return (
        f"{dataset}-{model.size_mb():.1f}MB-model{fi.get('model_bits', float('nan')):.1f}"
        f"-data{data_bits:.1f}-{fi.get('arch', 'made')}"
        f"-{fi.get('epochs', 0)}epochs-seed{fi.get('seed', 0)}{suffix}.ckpt"
    )


def parse_checkpoint_name(name: str) -> dict:
    """Inverse of checkpoint_name (reference eval_model.py:480-543):
    file name -> {dataset, mb, model_bits, data_bits, arch, epochs, seed,
    order (list[int] | None — None = natural)}."""
    m = _CKPT_RE.match(name)
    if not m:
        raise ValueError(f"not a checkpoint name: {name!r}")
    d = m.groupdict()
    return {
        "dataset": d["dataset"],
        "mb": float(d["mb"]),
        "model_bits": float(d["model_bits"]),
        "data_bits": float(d["data_bits"]),
        "arch": d["arch"],
        "epochs": int(d["epochs"]),
        "seed": int(d["seed"]),
        "order": [int(x) for x in d["order"].split("_")] if d["order"] else None,
    }
