"""Focused tests for the r16 kernel-buffer optimizations: persistent GEMM
output buffers (transformer.Linear / made.MaskedLinear), the in-place
attention softmax, BayesNet.shared_fit, and the Heuristic single-predicate
dedup. All pure-driver (no Spark session needed)."""

from __future__ import annotations

import pickle
import threading

import numpy as np

from naru_spark.encoding import ColumnDictionary
from naru_spark.meta import ColumnMeta, TableMeta


def _meta(cols, doms, n):
    dicts = {
        c: ColumnDictionary(c, np.arange(d, dtype=np.int64), False)
        for c, d in zip(cols, doms)
    }
    return TableMeta(
        "t",
        [ColumnMeta(c, "bigint", d, False) for c, d in zip(cols, doms)],
        cardinality=n,
        dictionaries=dicts,
    )


def test_masked_linear_buffer_reuse_and_threads():
    """Consecutive forwards overwrite the shared buffer with CORRECT
    values, and concurrent threads (the sampling_stateless clone contract)
    each see their own buffer."""
    from naru_spark.model.made import MaskedLinear

    rng = np.random.RandomState(0)
    lin = MaskedLinear(8, 6, np.ones((8, 6)), rng)
    x1 = rng.rand(40, 8)
    x2 = rng.rand(40, 8)
    y1 = lin.forward_nograd(x1).copy()
    y2 = lin.forward_nograd(x2)
    assert np.array_equal(y1, x1 @ (lin.W * lin.M) + lin.b)
    assert np.array_equal(y2, x2 @ (lin.W * lin.M) + lin.b)
    # same-shape forwards reuse one buffer per thread
    assert lin.forward_nograd(x1) is lin.forward_nograd(x2)

    results = {}

    def worker(key, x):
        buf = lin.forward_nograd(x)
        results[key] = (buf, np.array(buf))

    ts = [
        threading.Thread(target=worker, args=(i, rng.rand(40, 8)))
        for i in range(4)
    ]
    [t.start() for t in ts]
    [t.join() for t in ts]
    bufs = {id(b) for b, _ in results.values()}
    assert len(bufs) == 4, "threads must not share an output buffer"

    # scratch never pickles
    lin2 = pickle.loads(pickle.dumps(lin))
    assert lin2._out_tl is None
    assert np.array_equal(lin2.forward_nograd(x1), y1)


def test_transformer_linear_buffer_and_attention_inplace():
    from naru_spark.model.transformer import ARTransformer

    domains = [12, 8, 5, 9]
    m = ARTransformer(domains, d_model=16, d_ff=32, n_heads=2, blocks=2, seed=0)
    rng = np.random.RandomState(1)
    data = np.stack([rng.randint(0, d, 200) for d in domains], axis=1)
    lg1 = np.array(m.forward(data, grad=False))
    lg2 = np.array(m.forward(data[::-1], grad=False))
    # re-forward the first batch: identical logits (buffers fully refreshed)
    assert np.array_equal(np.array(m.forward(data, grad=False)), lg1)
    assert not np.array_equal(lg1, lg2)
    # softmax rows of the in-place attention normalize exactly
    p = m.blocks[0].attn._p
    s = p.sum(axis=-1)
    assert np.allclose(s, 1.0, atol=1e-6)
    # pickles drop scratch and round-trip to identical outputs
    m2 = pickle.loads(pickle.dumps(m))
    assert np.array_equal(np.array(m2.forward(data, grad=False)), lg1)
    # weights dominate the pickle (per-object overhead is large on a tiny
    # test model; what must NOT appear is the [B,...] activation scratch,
    # which alone would exceed this bound many times over)
    assert len(pickle.dumps(m2)) < 4 * sum(p_.v.nbytes for p_ in m.params())


def test_bayesnet_shared_fit_bit_identical():
    from naru_spark.estimators.bayes import BayesNet
    from naru_spark.predicates import Query

    cols = ["a", "b", "c", "d"]
    doms = [20, 6, 3, 15]
    meta = _meta(cols, doms, 5000)
    rng = np.random.RandomState(2)
    data = np.stack([rng.randint(0, d, 5000) for d in doms], axis=1)
    wl = [
        Query("t", ["a", "c"], ["<=", "="], [np.int64(10), np.int64(1)]),
        Query("t", ["b", "d"], ["=", ">="], [np.int64(2), np.int64(5)]),
    ]
    for structure, mp in (("chow_liu", 1), ("greedy", 2)):
        fresh_s = BayesNet(data, meta, cols, max_model_domain=16,
                           num_samples=128, seed=7, structure=structure,
                           max_parents=mp)
        fresh_e = BayesNet(data, meta, cols, max_model_domain=16,
                           inference="exact", structure=structure,
                           max_parents=mp)
        shared_e = BayesNet.shared_fit(fresh_s, inference="exact")
        shared_s = BayesNet.shared_fit(fresh_e, num_samples=128, seed=7)
        assert shared_e.name == fresh_e.name
        assert shared_s.name == fresh_s.name
        for q in wl:
            assert fresh_e.query(q) == shared_e.query(q)
            assert fresh_s.query(q) == shared_s.query(q)
        # telemetry lists are NOT shared with the source estimator
        assert shared_e.query_starts is not fresh_s.query_starts
