"""A/B decode tok/s for env-flag configurations (chained 128-step loop,
the bench.py pattern). Usage: python scripts/ab_decode.py [n_steps]"""
import dataclasses as dc
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.engine.sampler import SamplingConfig
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spec = spec_from_hf_config(dict(BASE))
    params = init_params_synthetic(
        spec,
        quant=os.environ.get("KT_BENCH_QUANT", "int4_g"),
        moe_quant=os.environ.get("KT_BENCH_MOE_QUANT", "int4_g"),
    )
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    cache = gen.new_cache()
    cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
    decode = gen._decode_step(SamplingConfig())
    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1,), jnp.int32)
    t0 = time.perf_counter()
    tok, cache, key = decode(tok[:, None], cache, key)
    jax.block_until_ready(tok)
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            tok, cache, key = decode(tok[:, None], cache, key)
        jax.block_until_ready(tok)
        dt = time.perf_counter() - t0
        print(f"rep{rep}: {n/dt:.2f} tok/s ({dt/n*1e3:.3f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
