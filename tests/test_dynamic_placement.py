"""Dynamic expert re-placement during serving (VERDICT r1 item 10):
routing stats collected in the engine loop drive a logical->physical
rebuild; outputs stay exact and the per-shard load (the EP latency
determinant) balances under skewed routing. Reference:
--kt-enable-dynamic-expert-update, experts-sched-Tutorial.md:172-192."""

import numpy as np
import pytest

import jax.numpy as jnp

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.serving.engine import ServeEngine
from ktransformers_tpu.serving.scheduler import SchedulerConfig
from ktransformers_tpu.utils.expert_placement import (
    ExpertStatsCollector,
    balanced_logical_to_physical,
    reorder_expert_weights,
)

from tests.test_generate import TINY_DS


def _engine(params, spec, **kw):
    return ServeEngine(
        params, spec,
        SchedulerConfig(max_batch_size=4, prefill_chunk=8, page_size=8,
                        max_pages_per_query=8),
        num_pages=64, cache_dtype=jnp.float32, compute_dtype=jnp.float32,
        **kw,
    )


def test_serving_collects_stats_and_rebalances_exactly():
    """Stats accumulate during decoding; a mid-stream rebalance leaves
    subsequent outputs identical to an untouched engine."""
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    prompts = [list(range(4, 12)), list(range(30, 38))]

    ref = _engine(params, spec)
    expected = [ref.generate_sync(p, max_new_tokens=6) for p in prompts]

    eng = _engine(params, spec, collect_routing=True)
    out1 = eng.generate_sync(prompts[0], max_new_tokens=6)
    assert out1 == expected[0]
    assert eng.stats is not None and eng.stats.counts.sum() > 0

    eng.apply_expert_rebalance(ep_size=2)
    # weights are now permuted with an attached map; results must not move
    out2 = eng.generate_sync(prompts[1], max_new_tokens=6)
    assert out2 == expected[1]

    # a second rebalance (composition with the existing map) stays exact
    eng.apply_expert_rebalance(ep_size=2)
    out3 = eng.generate_sync(prompts[0], max_new_tokens=6)
    assert out3 == expected[0]


def test_balanced_l2p_reduces_shard_skew():
    """Under skewed routing the greedy re-placement packs hot experts onto
    different shards: max per-shard routed load drops vs the naive
    contiguous placement."""
    rng = np.random.default_rng(0)
    e, ep, k, t = 16, 4, 2, 4096
    # skew: experts 0..3 (all on shard 0 under contiguous placement)
    # receive 80% of the traffic
    hot = rng.integers(0, 4, (t, k))
    cold = rng.integers(4, e, (t, k))
    pick = rng.random((t, k)) < 0.8
    topk = np.where(pick, hot, cold)

    freqs = np.bincount(topk.reshape(-1), minlength=e) / topk.size
    l2p = balanced_logical_to_physical(freqs, ep)
    assert sorted(l2p.tolist()) == list(range(e))  # a permutation

    per = e // ep

    def shard_loads(mapping):
        shards = mapping[topk.reshape(-1)] // per
        return np.bincount(shards, minlength=ep)

    naive = shard_loads(np.arange(e))
    bal = shard_loads(l2p)
    assert bal.max() < naive.max()
    # balanced: no shard above 1.5x the mean
    assert bal.max() <= 1.5 * bal.mean()


def test_reorder_composes(rng):
    """reorder(reorder(w, a), b) == logical weights permuted by b alone."""
    from ktransformers_tpu.ops.moe import MoEWeights
    from ktransformers_tpu.quant.formats import dequantize, quantize

    e, kdim, n = 8, 32, 16
    w = quantize(
        jnp.asarray(rng.standard_normal((e, kdim, 2 * n)), jnp.float32),
        "int4_g", group_size=16,
    )
    dn = quantize(
        jnp.asarray(rng.standard_normal((e, n, kdim)), jnp.float32),
        "int4_g", group_size=16,
    )
    base = MoEWeights(gate_up=w, down=dn)
    a = np.asarray(rng.permutation(e), np.int32)
    b = np.asarray(rng.permutation(e), np.int32)
    once = reorder_expert_weights(base, a)
    twice = reorder_expert_weights(once, b)
    direct = reorder_expert_weights(base, b)
    np.testing.assert_array_equal(
        np.asarray(twice.logical_to_physical), b
    )
    np.testing.assert_array_equal(
        np.asarray(dequantize(twice.gate_up)),
        np.asarray(dequantize(direct.gate_up)),
    )
