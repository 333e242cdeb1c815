"""Fused shared experts (ops/fuse_shared.py): shared experts appended to
the routed gather must change nothing numerically (same codes/scales,
weight-1 combine) while eliminating the separate dense shared matmuls —
the decode kernel-count optimization of round 2."""

import numpy as np

import jax.numpy as jnp

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.ops.fuse_shared import fuse_shared_experts

from tests.test_generate import TINY_DS


def test_fused_shared_experts_exact():
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(
        spec, seed=0, quant="int4_g", moe_quant="int4_g", group_size=32
    )
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 96, (2, 10)), jnp.int32)

    cache = KVCache.create(spec, 2, 16, dtype=jnp.float32)
    ref, _ = forward(params, spec, tokens, cache, compute_dtype=jnp.float32)

    fused = fuse_shared_experts(params, spec)
    assert any(
        lp.get("moe", {}).get("experts") is not None
        and lp["moe"]["experts"].n_shared_fused
        for lp in fused["layers"]
    )
    cache = KVCache.create(spec, 2, 16, dtype=jnp.float32)
    got, _ = forward(fused, spec, tokens, cache, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_fuse_falls_back_on_kind_mismatch():
    from ktransformers_tpu.quant.formats import dequantize, quantize

    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16", moe_quant="int4_g",
                         group_size=32)
    # shared experts follow moe_quant since r2 — force a mismatch by
    # re-kinding the shared tensors to bf16
    for lp in params["layers"]:
        if "moe" in lp and lp["moe"].get("shared") is not None:
            sh = lp["moe"]["shared"]
            for k in ("gate_up", "down"):
                sh[k] = quantize(dequantize(sh[k], jnp.float32), "bf16")
    fused = fuse_shared_experts(params, spec)  # shared bf16 vs routed int4
    assert not any(
        "moe" in lp and lp["moe"]["experts"].n_shared_fused
        for lp in fused["layers"]
    )
    # explicit requantize opt-in stacks anyway
    fused2 = fuse_shared_experts(params, spec, requantize=True)
    assert any(
        "moe" in lp and lp["moe"]["experts"].n_shared_fused
        for lp in fused2["layers"]
    )
