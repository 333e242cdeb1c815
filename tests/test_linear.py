"""qmatmul scale-hoisting paths vs dense dequant reference, and the MoE
gather decode path vs the sorted (ragged) path."""

import jax.numpy as jnp
import numpy as np
import pytest

from ktransformers_tpu.ops.linear import qmatmul
from ktransformers_tpu.ops.moe import (
    MoEConfig,
    MoEWeights,
    moe_forward,
)
from ktransformers_tpu.ops.gate import GateConfig, route
from ktransformers_tpu.quant.formats import dequantize, quantize


@pytest.mark.parametrize("kind", ["bf16", "int8", "int4", "fp8", "int4_g", "int4_gz"])
def test_qmatmul_matches_dequant(rng, kind):
    w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    qt = quantize(w, kind, group_size=32)
    ref = np.asarray(x @ dequantize(qt, jnp.float32))
    out = np.asarray(qmatmul(x, qt))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("kind", ["bf16", "int8", "int4", "int4_g", "int4_gz"])
def test_gather_path_matches_ragged(rng, kind):
    e, d, f, k, t = 8, 64, 96, 2, 4  # t <= DECODE_GATHER_MAX_TOKENS
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.05)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.05)
    w = MoEWeights(
        gate_up=quantize(gu, kind, group_size=32),
        down=quantize(dn, kind, group_size=32),
    )
    x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    idx, wts = route(logits, GateConfig(num_experts=e, top_k=k, norm_topk_prob=True))

    y_gather = moe_forward(x, w, idx, wts, MoEConfig(impl="gather"))
    y_ragged = moe_forward(x, w, idx, wts, MoEConfig(impl="ragged"))
    np.testing.assert_allclose(
        np.asarray(y_gather), np.asarray(y_ragged), rtol=1e-3, atol=1e-3
    )


def test_gather_respects_expert_mask(rng):
    e, d, f, k, t = 8, 32, 48, 2, 3
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.05)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.05)
    mask_a = jnp.asarray(np.arange(e) < e // 2)
    full = MoEWeights(quantize(gu, "bf16"), quantize(dn, "bf16"))
    wa = MoEWeights(full.gate_up, full.down, expert_mask=mask_a)
    wb = MoEWeights(full.gate_up, full.down, expert_mask=~mask_a)
    x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    idx, wts = route(logits, GateConfig(num_experts=e, top_k=k))
    cfg = MoEConfig(impl="gather")
    y_full = moe_forward(x, full, idx, wts, cfg)
    y_sum = moe_forward(x, wa, idx, wts, cfg) + moe_forward(x, wb, idx, wts, cfg)
    np.testing.assert_allclose(
        np.asarray(y_full), np.asarray(y_sum), rtol=1e-4, atol=1e-4
    )
