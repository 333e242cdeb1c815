"""Expert placement strategies (generate_gpu_experts_masks analog) and
frequency-balanced remapping end-to-end through moe_forward."""

import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.ops.gate import GateConfig, route
from ktransformers_tpu.ops.moe import MoEConfig, MoEWeights, moe_forward
from ktransformers_tpu.quant.formats import quantize
from ktransformers_tpu.utils.expert_placement import (
    ExpertStatsCollector,
    balanced_logical_to_physical,
    hot_expert_masks,
    reorder_expert_weights,
)


def test_stats_collector():
    c = ExpertStatsCollector(2, 8)
    c.record(0, np.array([[0, 1], [0, 2]]))
    c.record(1, np.array([[7, 7]]))
    assert c.counts[0, 0] == 2 and c.counts[1, 7] == 2
    assert np.isclose(c.frequencies[0, 0], 0.5)


def test_hot_masks_strategies():
    freqs = np.array([[0.4, 0.1, 0.3, 0.2], [0.1, 0.1, 0.1, 0.7]])
    m = hot_expert_masks(freqs, 2, "frequency")
    assert m[0].tolist() == [True, False, True, False]
    assert m[1, 3]
    for strat in ("uniform", "front-loading", "random"):
        m = hot_expert_masks(freqs, 2, strat)
        assert m.sum(axis=1).tolist() == [2, 2]


def test_balanced_l2p_spreads_load():
    freqs = np.array([0.5, 0.3, 0.1, 0.05, 0.02, 0.02, 0.005, 0.005])
    l2p = balanced_logical_to_physical(freqs, ep_size=2)
    shard_of = l2p // 4
    # the two heaviest experts must land on different shards
    assert shard_of[0] != shard_of[1]
    # each shard has exactly 4 experts
    assert (shard_of == 0).sum() == 4


def test_reorder_weights_is_noop_through_forward(rng):
    e, d, f, k, t = 8, 32, 48, 2, 5
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.1)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.1)
    w = MoEWeights(gate_up=quantize(gu, "int8"), down=quantize(dn, "int8"))
    x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    idx, wts = route(logits, GateConfig(num_experts=e, top_k=k))
    ref = moe_forward(x, w, idx, wts, MoEConfig())

    freqs = np.asarray(np.bincount(np.asarray(idx).reshape(-1), minlength=e))
    l2p = balanced_logical_to_physical(freqs / freqs.sum(), ep_size=2)
    w2 = reorder_expert_weights(w, l2p)
    out = moe_forward(x, w2, idx, wts, MoEConfig())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
