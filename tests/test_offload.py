"""Host-offloaded experts: streamed compute == on-device compute, through
the op, the full model, and generation (jit boundaries + pure_callback)."""

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.offload import offload_moe_weights
from ktransformers_tpu.ops.gate import GateConfig, route
from ktransformers_tpu.ops.moe import MoEConfig, MoEWeights, moe_forward
from ktransformers_tpu.quant.formats import quantize

from tests.test_generate import TINY_DS


def test_offloaded_matches_device(rng):
    e, d, f, k, t = 8, 64, 96, 2, 4
    gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.05)
    dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.05)
    for kind in ("int8", "int4_g"):
        w = MoEWeights(
            gate_up=quantize(gu, kind, group_size=32),
            down=quantize(dn, kind, group_size=32),
        )
        x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
        logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
        idx, wts = route(logits, GateConfig(num_experts=e, top_k=k))
        ref = moe_forward(x, w, idx, wts, MoEConfig())
        w_off = offload_moe_weights(w)
        out = moe_forward(x, w_off, idx, wts, MoEConfig())
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )
        # and under jit
        f_jit = jax.jit(
            lambda x, idx, wts: moe_forward(x, w_off, idx, wts, MoEConfig())
        )
        out_j = f_jit(x, idx, wts)
        np.testing.assert_allclose(
            np.asarray(out_j), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_generation_with_offloaded_experts():
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="int8")
    prompt = list(range(10))
    cfg = GenerateConfig(max_new_tokens=8)

    gen = Generator(params, spec, max_len=64, batch=1,
                    cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    ref = gen.generate([prompt], cfg)

    # offload every MoE layer's experts to host
    params_off = dict(params)
    params_off["layers"] = [
        (
            {**lp, "moe": {**lp["moe"],
                           "experts": offload_moe_weights(lp["moe"]["experts"])}}
            if "moe" in lp
            else lp
        )
        for lp in params["layers"]
    ]
    gen_off = Generator(params_off, spec, max_len=64, batch=1,
                        cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    out = gen_off.generate([prompt], cfg)
    assert out == ref
