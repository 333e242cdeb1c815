"""Decode-step device-time decomposition by layer-count scaling (r4):
paced-readback decode at n_layers in {1, 9, 27} gives per-layer cost and
fixed cost (sampling + lm_head + embed + dispatch); KT_MLA_FUSED=0 and
KT_BENCH_QUANT variants isolate attention-kernel and dense-kind effects.
(The r3 per-op ablations used block_until_ready, which does not block on
this backend — these numbers supersede them.)"""
import collections
import dataclasses as dc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.engine.sampler import SamplingConfig
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    for n_layers in (27, 9, 1):
        spec = spec_from_hf_config(
            dict(BASE, max_position_embeddings=2048,
                 num_hidden_layers=n_layers)
        )
        params = init_params_synthetic(
            spec, quant="int4_g", moe_quant="int4_g"
        )
        jax.block_until_ready(params)
        gen = Generator(params, spec, max_len=1024, batch=1)
        cache = gen.new_cache()
        cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
        decode = gen._decode_step(SamplingConfig())
        key = jax.random.PRNGKey(0)
        tok = jnp.zeros((1,), jnp.int32)
        tok, cache, key = decode(tok[:, None], cache, key)
        _ = int(np.asarray(tok)[0])
        n_steps, depth = 128, 8
        pending = collections.deque()
        t0 = time.perf_counter()
        for _ in range(n_steps):
            tok, cache, key = decode(tok[:, None], cache, key)
            try:
                tok.copy_to_host_async()
            except Exception:
                pass
            pending.append(tok)
            if len(pending) > depth:
                _ = int(np.asarray(pending.popleft())[0])
        while pending:
            _ = int(np.asarray(pending.popleft())[0])
        dt = (time.perf_counter() - t0) / n_steps * 1e3
        print(f"L={n_layers:2d}: {dt:6.3f} ms/step", flush=True)
        del params, gen, cache


if __name__ == "__main__":
    main()
