"""MoE grouped-forward accuracy, expert masking, and remapping.

Mirrors the reference's kernel accuracy strategy
(kt-kernel/test/per_commit/test_moe_amx_accuracy_*.py: backend forward vs a
dense torch MoE) with the sorted-ragged implementation vs the dense check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ktransformers_tpu.ops.activations import ActivationConfig
from ktransformers_tpu.ops.gate import GateConfig, route
from ktransformers_tpu.ops.moe import (
    MoEConfig,
    MoEWeights,
    moe_forward,
    moe_forward_dense_reference,
)
from ktransformers_tpu.quant.formats import quantize

E, D, F, K = 16, 64, 96, 4


def _weights(rng, kind="bf16", **kw):
    gu = rng.standard_normal((E, D, 2 * F)).astype(np.float32) * 0.05
    dn = rng.standard_normal((E, F, D)).astype(np.float32) * 0.05
    return MoEWeights(
        gate_up=quantize(jnp.asarray(gu), kind, group_size=32),
        down=quantize(jnp.asarray(dn), kind, group_size=32),
        **kw,
    )


def _routing(rng, t=32):
    logits = jnp.asarray(rng.standard_normal((t, E)).astype(np.float32))
    return route(logits, GateConfig(num_experts=E, top_k=K, norm_topk_prob=True))


@pytest.mark.parametrize("kind", ["bf16", "int8", "int4_g"])
def test_sorted_matches_dense(rng, kind):
    w = _weights(rng, kind)
    idx, wts = _routing(rng)
    x = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))
    y = moe_forward(x, w, idx, wts)
    y_ref = moe_forward_dense_reference(x, w, idx, wts)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3)


def test_expert_mask_partial_sum(rng):
    """Two complementary shards must sum to the unmasked result — the
    invariant behind the reference's CPU+GPU expert split
    (operators/common.hpp should_skip_expert)."""
    idx, wts = _routing(rng)
    x = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))
    w_full = _weights(rng, "bf16")

    mask_a = jnp.asarray(np.arange(E) < E // 2)
    w_a = MoEWeights(w_full.gate_up, w_full.down, expert_mask=mask_a)
    w_b = MoEWeights(w_full.gate_up, w_full.down, expert_mask=~mask_a)

    y_full = moe_forward(x, w_full, idx, wts)
    y_sum = moe_forward(x, w_a, idx, wts) + moe_forward(x, w_b, idx, wts)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_sum), atol=1e-4)


def test_logical_to_physical_remap(rng):
    """Permuting expert storage + inverse remap must be a no-op
    (physical_to_logical_map, operators/common.hpp)."""
    idx, wts = _routing(rng)
    x = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))
    w = _weights(rng, "bf16")

    perm = np.random.default_rng(7).permutation(E)
    gu_p = quantize(w.gate_up.data[jnp.asarray(perm)].astype(jnp.float32), "bf16")
    dn_p = quantize(w.down.data[jnp.asarray(perm)].astype(jnp.float32), "bf16")
    inv = np.empty(E, np.int32)
    inv[perm] = np.arange(E)
    w_p = MoEWeights(gu_p, dn_p, logical_to_physical=jnp.asarray(inv))

    y = moe_forward(x, w, idx, wts)
    y_p = moe_forward(x, w_p, idx, wts)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_p), atol=1e-4)


def test_activation_variants(rng):
    idx, wts = _routing(rng)
    x = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))
    w = _weights(rng, "bf16")
    for act in [
        ActivationConfig("silu"),
        ActivationConfig("silu", swiglu_limit=7.0),
        ActivationConfig("swigluoai", swiglu_alpha=1.702),
    ]:
        cfg = MoEConfig(activation=act)
        y = moe_forward(x, w, idx, wts, cfg)
        y_ref = moe_forward_dense_reference(x, w, idx, wts, cfg)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3)


def test_jit_and_grad(rng):
    """moe_forward must be jittable and differentiable (SFT path needs vjp)."""
    w = _weights(rng, "bf16")
    idx, wts = _routing(rng)
    x = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))

    f = jax.jit(lambda x, w: moe_forward(x, w, idx, wts))
    y = f(x, w)
    assert y.shape == (32, D)

    g = jax.grad(lambda x: jnp.sum(moe_forward(x, w, idx, wts) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
