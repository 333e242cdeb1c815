"""Decode-step ablation by model variant (one jitted step per variant, so
per-call dispatch overhead cancels in the differences).

Variants of the bench model (DeepSeek-V2-Lite class, int8 dense +
int4_g experts):
  full        : the bench decode step
  no_lm       : vocab cut to 1k         -> Δ = lm_head cost
  half_layers : 14 layers               -> slope = per-layer cost
  no_moe      : experts+shared dropped via first_k_dense_replace=999
                (all-dense layers of the same hidden size)
  short_ctx   : max_len 128 vs 1024     -> Δ = attention KV scaling
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

BASE = dict(
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


def run_variant(name, cfg, max_len=1024, ctx=512, iters=96):
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.engine.sampler import SamplingConfig
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config

    spec = spec_from_hf_config(dict(cfg))
    params = init_params_synthetic(spec, quant="int8", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=max_len, batch=1)
    cache = gen.new_cache()
    cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, ctx))
    decode = gen._decode_step(SamplingConfig())
    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1,), jnp.int32)
    tok, cache, key = decode(tok[:, None], cache, key)
    jax.block_until_ready(tok)
    t0 = time.perf_counter()
    for _ in range(iters):
        tok, cache, key = decode(tok[:, None], cache, key)
    jax.block_until_ready(tok)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:16s} {dt*1e3:7.3f} ms", flush=True)
    del params, cache, gen
    return dt


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    full = run_variant("full", BASE)
    no_lm = run_variant("no_lm(v=1024)", {**BASE, "vocab_size": 1024})
    half = run_variant("half(14L)", {**BASE, "num_hidden_layers": 14})
    no_moe = run_variant(
        "no_moe(dense)", {**BASE, "first_k_dense_replace": 999}
    )
    short = run_variant("ctx128", BASE, max_len=256, ctx=128)

    print("---- derived ----")
    print(f"lm_head:          {(full-no_lm)*1e3:7.3f} ms")
    print(f"per-layer (13L):  {(full-half)/13*1e3:7.3f} ms")
    print(f"moe-vs-dense:     {(full-no_moe)*1e3:7.3f} ms (26 moe layers)")
    print(f"kv 512->128:      {(full-short)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
