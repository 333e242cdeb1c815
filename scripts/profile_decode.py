"""Per-component decode-step timing on the bench model (real chip).

Times each hot component of the single-user decode step in isolation with
long data-dependency chains (micro-timings over the tunnel are meaningless
otherwise; see CLAUDE.md), then the full step, to find where the gap to
the HBM speed-of-light ceiling lives. Analog of the reference's
FORWARD_TIME_PROFILE stage breakdown (operators/amx/moe_base.hpp:186-211).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timed(fn, init, iters=64, name=""):
    import jax

    out = fn(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1e3:8.3f} ms")
    return dt


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.engine.sampler import SamplingConfig
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.ops import pallas as pallas_ops
    from ktransformers_tpu.ops.linear import linear
    from ktransformers_tpu.ops.moe import MoEConfig, moe_forward
    from ktransformers_tpu.ops.gate import route

    pallas_ops.maybe_enable()

    cfg = dict(
        model_type="deepseek_v2", vocab_size=102400, hidden_size=2048,
        intermediate_size=10944, moe_intermediate_size=1408,
        num_hidden_layers=27, num_attention_heads=16, num_key_value_heads=16,
        n_shared_experts=2, n_routed_experts=64, num_experts_per_tok=6,
        first_k_dense_replace=1, moe_layer_freq=1, topk_method="greedy",
        norm_topk_prob=False, routed_scaling_factor=1.0,
        scoring_func="softmax", kv_lora_rank=512, q_lora_rank=None,
        qk_rope_head_dim=64, qk_nope_head_dim=128, v_head_dim=128,
        max_position_embeddings=2048, rms_norm_eps=1e-6, rope_theta=10000.0,
    )
    spec = spec_from_hf_config(cfg)
    params = init_params_synthetic(spec, quant="int8", moe_quant="int4_g")
    jax.block_until_ready(params)

    d = cfg["hidden_size"]
    lp = params["layers"][2]  # a MoE layer

    # --- lm_head ---
    lm = params.get("lm_head")
    emb = params["embed"]

    @jax.jit
    def lm_step(x):
        y = linear(x, lm) if lm is not None else x @ emb.astype(x.dtype).T
        # fold back to [1, d] to chain
        return jnp.tanh(y[:, :d]) + x

    timed(lm_step, jnp.ones((1, d), jnp.bfloat16), name="lm_head")

    # --- one MoE layer (routed experts, decode gather path) ---
    moe_p = lp["moe"]

    @jax.jit
    def moe_step(mp, x):
        from ktransformers_tpu.models.model import _moe_mlp

        return _moe_mlp(mp, spec, x[:, None, :])[:, 0, :] * 0.001 + x

    timed(lambda x: moe_step(moe_p, x), jnp.ones((1, d), jnp.bfloat16),
          name="moe_layer (x26)")

    # --- routed experts only (no shared/router) ---
    w = moe_p["experts"]

    @jax.jit
    def routed_step(w, x):
        idx = (
            jnp.arange(6, dtype=jnp.int32)[None]
            + (x[0, 0] > 1e9).astype(jnp.int32)
        )
        tw = jnp.full((1, 6), 1 / 6, jnp.float32)
        y = moe_forward(x, w, idx, tw, MoEConfig(activation=spec.activation))
        return y * 0.001 + x

    timed(lambda x: routed_step(w, x), jnp.ones((1, d), jnp.bfloat16),
          name="routed experts only (x26)")

    # --- shared experts only ---
    from ktransformers_tpu.models.model import _dense_mlp as dense_mlp

    shared_p = moe_p.get("shared")
    if shared_p is not None:

        @jax.jit
        def shared_step(sp, x):
            return dense_mlp(sp, spec, x) * 0.001 + x

        timed(lambda x: shared_step(shared_p, x),
              jnp.ones((1, d), jnp.bfloat16),
              name="shared experts only (x26)")

    # --- attention block only (contiguous cache at ctx 512) ---
    attn_p = lp["attn"]
    from ktransformers_tpu.models.model import _mla_attention
    from ktransformers_tpu.ops.rope import precompute_rope_tables

    cos_t, sin_t = precompute_rope_tables(spec.rope)
    a = spec.attention
    buf_a0 = jnp.zeros((1, 1024, a.kv_lora_rank), jnp.bfloat16)
    buf_b0 = jnp.zeros((1, 1024, a.qk_rope_head_dim), jnp.bfloat16)

    @jax.jit
    def attn_step(ap, ba, bb, x):
        pos = jnp.full((1, 1), 512, jnp.int32)
        rope_cs = (cos_t[pos], sin_t[pos])
        out, (ba, bb) = _mla_attention(
            ap, spec, x[:, None, :], (ba, bb),
            jnp.full((1,), 512, jnp.int32), rope_cs,
        )
        return out[:, 0] * 0.001 + x, ba, bb

    def attn_chain(state):
        x, ba, bb = state
        x, ba, bb = attn_step(attn_p, ba, bb, x)
        return (x, ba, bb)

    timed(attn_chain, (jnp.ones((1, d), jnp.bfloat16), buf_a0, buf_b0),
          name="attention block (x27)")

    # --- dense layer-0 mlp ---
    lp0 = params["layers"][0]
    if "mlp" in lp0:

        @jax.jit
        def dense_step(dp, x):
            return dense_mlp(dp, spec, x) * 0.001 + x

        timed(lambda x: dense_step(lp0["mlp"], x),
              jnp.ones((1, d), jnp.bfloat16), name="dense mlp layer0 (x1)")

    from ktransformers_tpu.models.model import KVCache, forward

    # --- full decode step (the bench path) ---
    gen = Generator(params, spec, max_len=1024, batch=1)
    import dataclasses as dc

    cache = gen.new_cache()
    cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
    decode = gen._decode_step(SamplingConfig())
    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1,), jnp.int32)
    state = (tok, cache, key)

    def full(state):
        tok, cache, key = state
        tok, cache, key = decode(tok[:, None], cache, key)
        return (tok, cache, key)

    timed(full, state, iters=128, name="FULL decode step")

    # --- full forward without sampling (isolate sampling cost) ---
    @jax.jit
    def fwd_only(tok, cache):
        logits, cache = forward(
            params, spec, tok, cache, rope_tables=gen.rope_tables,
            compute_dtype=jnp.bfloat16,
        )
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    cache2 = gen.new_cache()
    cache2 = dc.replace(cache2, lengths=jnp.full_like(cache2.lengths, 512))

    def fwd_state(state):
        tok, cache = state
        tok, cache = fwd_only(tok[:, None], cache)
        return (tok, cache)

    timed(fwd_state, (tok, cache2), iters=128, name="forward+argmax only")


if __name__ == "__main__":
    main()
