"""Bisect the r4 prefill catastrophe (e2e 77 s per 512-token prefill vs
~55 ms sum-of-pieces): time ONE full prefill step per kernel-config
variant with hard readbacks.

Variants (monkeypatched module constants, re-jitted per variant):
  A. default r4      : dense w4a8<=64 / bf16dq>64, grouped w4a8
  B. grouped bf16    : dense as A, grouped bf16-dequant (r3 grouped path)
  C. dense all-w4a8  : dense w4a8 all M, grouped w4a8
  D. r3-style        : dense all-w4a8 + grouped bf16
Also times the layer pieces inside the REAL forward by layer-count
truncation (4-layer vs 27-layer model) if VARIANTS finish fast.
"""

import dataclasses
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
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.ops.pallas import quant_matmul as qm
    from scripts.profile_decode2 import BASE

    n_layers = int(os.environ.get("BISECT_LAYERS", "27"))
    spec = spec_from_hf_config(
        dict(BASE, max_position_embeddings=2048,
             num_hidden_layers=n_layers)
    )
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    gen._prefill_chunk = 512
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, spec.vocab_size, (1, 512)), jnp.int32
    )

    def run(tag):
        gen._steps.clear()
        caches = [gen.new_cache() for _ in range(4)]
        jax.block_until_ready(caches)
        t0 = time.perf_counter()
        logits, _ = gen.prefill(caches[0], tokens)
        _ = float(logits[0, 0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(1, 4):
            logits, _ = gen.prefill(caches[i], tokens)
            _ = float(logits[0, 0])
        dt = (time.perf_counter() - t0) / 3
        print(f"{tag}: {dt*1e3:.1f} ms/prefill ({512/dt:.0f} tok/s), "
              f"compile+first {compile_s:.1f}s", flush=True)

    qm._GROUPED_IMPL = "w4a8"
    run("A. dense-M-routed + grouped w4a8")
    qm._GROUPED_IMPL = "bf16"
    run("B. dense-M-routed + grouped bf16")
    qm._GROUPED_IMPL = "w4a8"
    saved = qm.W4A8_DENSE_MAX_M
    qm.W4A8_DENSE_MAX_M = 10**9
    run("C. dense all-w4a8 + grouped w4a8")
    qm._GROUPED_IMPL = "bf16"
    run("D. dense all-w4a8 + grouped bf16 (r3)")
    qm.W4A8_DENSE_MAX_M = saved
    qm._GROUPED_IMPL = "w4a8"


if __name__ == "__main__":
    main()
