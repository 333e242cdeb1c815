"""Kernel lab 14 (r5): prefill-step decomposition at S=512 — where do
the ~82 ms go? (bench prefill 6.2k tok/s vs a ~20 ms roofline: weights
~7.8 GB/step at 819 GB/s ~= 9.5 ms + grouped int8-MXU compute at
M=64-tiles ~= 9.4 ms.)

Marginal in-program chained reps (kernel_lab8 methodology, scalar
readback) of one REAL MoE layer's prefill slices at M=512:

  layer   : full decoder_layer at S=512 (fresh cache)
  attn    : norm + MLA attention (absorbed blockwise) + residual
  moe     : norm + routed grouped MoE + shared dense + residual
  routed  : router + sorted grouped W4A8 (the 294 MB/layer pass)
  shared  : dense FFN (2 shared experts)
  qkvo    : projection matmuls only

Also one full forward (27 layers) wall for cross-checking the bench.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = {}


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.model import (
        KVCache,
        _dense_mlp,
        _mla_attention,
        _moe_mlp,
        decoder_layer,
    )
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.ops.norm import rms_norm
    from ktransformers_tpu.ops.rope import precompute_rope_tables
    from scripts.profile_decode2 import BASE

    S = int(os.environ.get("LAB14_S", "512"))
    spec = spec_from_hf_config(
        dict(BASE, max_position_embeddings=2048, num_hidden_layers=2)
    )
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    from ktransformers_tpu.ops import pallas as pallas_ops
    from ktransformers_tpu.utils.device_prep import prepare_params

    params = prepare_params(params, pallas_ops.maybe_enable(), spec)
    lp = params["layers"][1]
    print("params ready", flush=True)

    B, D = 1, spec.hidden_size
    pos = jnp.zeros((B,), jnp.int32)
    r, dr = spec.attention.kv_lora_rank, spec.attention.qk_rope_head_dim
    buf_a = jnp.zeros((B, S, r), jnp.bfloat16)
    buf_b = jnp.zeros((B, S, dr), jnp.bfloat16)
    cos_t, sin_t = precompute_rope_tables(spec.rope)
    pidx = pos[:, None] + jnp.arange(S)[None, :]
    rope_cs = (cos_t[pidx], sin_t[pidx])

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.standard_normal((B, S, D)).astype(np.float32) * 0.02
    ).astype(jnp.bfloat16)

    R_HI, R_LO = 24, 4

    def timed(fn, reps, iters=5):
        @jax.jit
        def f(x, lp, ba, bb):
            for i in range(reps):
                if i:
                    ysc = x.reshape(-1)[0]
                    gate = jnp.where(jnp.isfinite(ysc), 1.0, 0.0)
                    x = x * gate.astype(x.dtype)
                x, ba, bb = fn(x, lp, ba, bb)
            return x.reshape(-1)[0]

        float(f(x0, lp, buf_a, buf_b))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(x0, lp, buf_a, buf_b))
            best = min(best, time.perf_counter() - t0)
        return best

    def marginal(name, fn):
        hi = timed(fn, R_HI)
        lo = timed(fn, R_LO)
        dt = (hi - lo) / (R_HI - R_LO) * 1e3
        print(f"  {name:8s}: {dt:8.3f} ms/rep (T{R_HI}={hi*1e3:.0f} "
              f"T{R_LO}={lo*1e3:.0f})", flush=True)
        RESULTS[name] = round(dt, 3)

    def v_layer(x, lp, ba, bb):
        y, ba, bb = decoder_layer(
            lp, spec, x, (ba, bb), pos, rope_cs, "full", True, 0
        )
        return y, ba, bb

    def v_attn(x, lp, ba, bb):
        xn = rms_norm(x, lp["input_norm"], spec.rms_norm_eps)
        out, (ba, bb) = _mla_attention(
            lp["attn"], spec, xn, (ba, bb), pos, rope_cs, None
        )
        return x + out, ba, bb

    def v_moe(x, lp, ba, bb):
        xn = rms_norm(x, lp["post_attn_norm"], spec.rms_norm_eps)
        return x + _moe_mlp(lp["moe"], spec, xn), ba, bb

    def v_routed(x, lp, ba, bb):
        from ktransformers_tpu.ops.gate import route
        from ktransformers_tpu.ops.moe import MoEConfig, moe_forward

        p = lp["moe"]
        flat = x.reshape(B * S, D)
        logits = flat.astype(jnp.float32) @ p["router_w"].astype(
            jnp.float32).T
        idx, w = route(logits, spec.moe.gate, p.get("router_bias_corr"))
        y = moe_forward(flat, p["experts"], idx, w,
                        MoEConfig(activation=spec.activation))
        return x + y.reshape(B, S, D), ba, bb

    def v_shared(x, lp, ba, bb):
        y = _dense_mlp(lp["moe"]["shared"], spec, x.reshape(B * S, D))
        return x + y.reshape(B, S, D), ba, bb

    def v_qkvo(x, lp, ba, bb):
        from ktransformers_tpu.models.model import mla_qkv_proj, plinear

        q, ckv = mla_qkv_proj(lp["attn"], spec, x)
        h = spec.attention.num_heads
        v = spec.attention.v_head_dim
        o = plinear(
            lp["attn"], "o_proj",
            jnp.broadcast_to(
                q.reshape(B, S, -1)[..., :1], (B, S, h * v)
            ).astype(x.dtype),
            lp["attn"].get("o_bias"),
        )
        return x + o + ckv[..., :1] * 0, ba, bb

    marginal("layer", v_layer)
    marginal("attn", v_attn)
    marginal("moe", v_moe)
    marginal("routed", v_routed)
    marginal("shared", v_shared)
    marginal("qkvo", v_qkvo)
    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
