"""Kernel lab 11 (r5): in-program decomposition of ONE real MoE decoder
layer at decode M=1 — where do the ~130 us/layer go?

The r4 ablation said the full step is content-bound at ~330 GB/s
effective while isolated kernels stream at 630+; this lab chains R reps
of layer SLICES (real int4_g params, real cache shapes, one jit, scalar
readback) to find which slice carries the exposed time:

  full    : decoder_layer (norm+attn+norm+moe, residuals)    ~42 MB
  attn    : norm + _mla_attention + residual                 ~5.8 MB
  moe     : norm + _moe_mlp + residual (gate+shared+routed)  ~34 MB
  shared  : _dense_mlp on the shared experts                 ~8.6 MB
  routed  : router + gathered MoE forward                    ~26 MB
  qkvo    : qkv proj + o proj matmuls only                   ~5.3 MB

Methodology: marginal per-rep cost (T(R_HI)-T(R_LO))/dR, weights as jit
args, reps chained through a data gate (kernel_lab8/10). Expected floor
per slice = bytes/630 GB/s; the slice whose marginal most exceeds its
floor is the structural-fusion target.
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

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.model import (
        _dense_mlp,
        _mla_attention,
        _moe_mlp,
        decoder_layer,
    )
    from ktransformers_tpu.ops.rope import precompute_rope_tables
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.ops.norm import rms_norm
    from ktransformers_tpu.ops.rope import rope_rotation_matrix
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(
        dict(BASE, max_position_embeddings=2048, num_hidden_layers=2)
    )
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    # register the Pallas kernel hooks + repack to the W4A8 layouts — the
    # Generator does this on init; without it every slice below times the
    # XLA-fallback paths (first lab11 run: routed 352 us/rep was the
    # unfused gather fallback, not the bench kernel)
    from ktransformers_tpu.ops import pallas as pallas_ops
    from ktransformers_tpu.utils.device_prep import prepare_params
    params = prepare_params(params, pallas_ops.maybe_enable(), spec)
    lp = params["layers"][1]  # the MoE layer
    print("layer params ready", flush=True)

    B, D = 1, spec.hidden_size
    max_len = 1024
    pos = jnp.full((B,), 512, jnp.int32)
    r, dr = spec.attention.kv_lora_rank, spec.attention.qk_rope_head_dim
    buf_a = jnp.zeros((B, max_len, r), jnp.bfloat16)
    buf_b = jnp.zeros((B, max_len, dr), jnp.bfloat16)
    cos_t, sin_t = precompute_rope_tables(spec.rope)
    pidx = pos[:, None]
    rope_cs = (cos_t[pidx], sin_t[pidx])
    rope_rot = rope_rotation_matrix(
        rope_cs[0][:, 0], rope_cs[1][:, 0], spec.rope.interleaved
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.standard_normal((B, 1, D)).astype(np.float32) * 0.02
    ).astype(jnp.bfloat16)

    R_HI, R_LO = 192, 24

    def timed(fn, reps, args, iters=6):
        @jax.jit
        def f(x, lp, buf_a, buf_b):
            for i in range(reps):
                if i:
                    ysc = x.reshape(-1)[0]
                    gate = jnp.where(jnp.isfinite(ysc), 1.0, 0.0)
                    x = x * gate.astype(x.dtype)
                x, buf_a, buf_b = fn(x, lp, buf_a, buf_b)
            return x.reshape(-1)[0]

        float(f(*args))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    def marginal(name, fn, mb):
        hi = timed(fn, R_HI, (x0, lp, buf_a, buf_b))
        lo = timed(fn, R_LO, (x0, lp, buf_a, buf_b))
        dt = (hi - lo) / (R_HI - R_LO) * 1e3
        floor = mb / 630e3 * 1e3  # ms at 630 GB/s
        print(f"  {name:8s}: {dt * 1e3:8.1f} us/rep  (floor@630 "
              f"{floor * 1e3:6.1f} us, {mb:5.1f} MB, T{R_HI}={hi * 1e3:.0f} "
              f"T{R_LO}={lo * 1e3:.0f})", flush=True)
        RESULTS[name] = round(dt * 1e3, 1)
        return dt

    def v_full(x, lp, ba, bb):
        y, ba, bb = decoder_layer(
            lp, spec, x, (ba, bb), pos, rope_cs, "full", True, 0,
            rope_rot=rope_rot,
        )
        return y, ba, bb

    def v_attn(x, lp, ba, bb):
        xn = rms_norm(x, lp["input_norm"], spec.rms_norm_eps)
        out, (ba, bb) = _mla_attention(
            lp["attn"], spec, xn, (ba, bb), pos, rope_cs, rope_rot
        )
        return x + out, ba, bb

    def v_moe(x, lp, ba, bb):
        xn = rms_norm(x, lp["post_attn_norm"], spec.rms_norm_eps)
        return x + _moe_mlp(lp["moe"], spec, xn), ba, bb

    def v_shared(x, lp, ba, bb):
        y = _dense_mlp(lp["moe"]["shared"], spec, x.reshape(1, D))
        return x + y.reshape(B, 1, D), ba, bb

    def v_routed(x, lp, ba, bb):
        from ktransformers_tpu.ops.gate import route
        from ktransformers_tpu.ops.moe import MoEConfig, moe_forward

        p = lp["moe"]
        flat = x.reshape(B, D)
        logits = flat.astype(jnp.float32) @ p["router_w"].astype(
            jnp.float32).T
        idx, w = route(logits, spec.moe.gate, p.get("router_bias_corr"))
        y = moe_forward(flat, p["experts"], idx, w,
                        MoEConfig(activation=spec.activation))
        return x + y.reshape(B, 1, D), ba, bb

    def v_qkvo(x, lp, ba, bb):
        from ktransformers_tpu.models.model import mla_qkv_proj, plinear

        q, ckv = mla_qkv_proj(lp["attn"], spec, x)
        h = spec.attention.num_heads
        v = spec.attention.v_head_dim
        o = plinear(
            lp["attn"], "o_proj",
            jnp.broadcast_to(
                q.reshape(B, 1, -1)[..., :1], (B, 1, h * v)
            ).astype(x.dtype),
            lp["attn"].get("o_bias"),
        )
        return x + o + ckv.reshape(B, 1, -1)[..., :1] * 0, ba, bb

    ssum = lambda t: sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(t)
    ) / 1e6
    mb_full = ssum(lp)
    mb_attn = ssum(lp["attn"])
    mb_moe = ssum(lp["moe"])
    mb_shared = ssum(lp["moe"]["shared"])
    mb_routed = ssum(lp["moe"]["experts"])
    print(f"layer {mb_full:.1f} MB = attn {mb_attn:.1f} + moe {mb_moe:.1f} "
          f"(shared {mb_shared:.1f} + routed-all {mb_routed:.1f}; "
          f"routed-active {mb_routed / spec.moe.num_experts * spec.moe.top_k:.1f})",
          flush=True)

    marginal("full", v_full, mb_attn + mb_shared
             + mb_routed / spec.moe.num_experts
             * spec.moe.top_k)
    marginal("attn", v_attn, mb_attn)
    marginal("moe", v_moe, mb_shared + mb_routed
             / spec.moe.num_experts * spec.moe.top_k)
    marginal("shared", v_shared, mb_shared)
    marginal("routed", v_routed, mb_routed
             / spec.moe.num_experts * spec.moe.top_k)
    marginal("qkvo", v_qkvo, mb_attn)
    print(RESULTS)


if __name__ == "__main__":
    main()
