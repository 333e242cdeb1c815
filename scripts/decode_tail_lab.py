"""Decode-step tail bisect (r4): layer scaling says the 27 layers cost
~0.6 ms total while a step is ~3.5 ms — and k-step programs scale ~k.
The remainder must be the per-step TAIL (embed/final-norm/lm_head/
sampling) or per-token cache plumbing. Variants, all 27-layer, paced:

  A. hidden-only forward (no final norm / lm_head / sampling)
  B. A + final norm + lm_head (logits[:, -1])
  C. B + sample()  (the production decode step)
"""
import collections
import dataclasses as dc
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.engine.sampler import SamplingConfig, sample
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.model import forward
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.ops.norm import rms_norm
    from ktransformers_tpu.ops.linear import linear
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(dict(BASE, max_position_embeddings=2048))
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    params = gen.params
    rope, cdt = gen.rope_tables, gen.compute_dtype
    sc = SamplingConfig()

    def run(name, step):
        cache = gen.new_cache()
        cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
        key = jax.random.PRNGKey(0)
        tok = jnp.zeros((1,), jnp.int32)
        tok, cache, key = step(params, tok, cache, key)
        _ = int(np.asarray(tok).reshape(-1)[0])
        pending = collections.deque()
        n = 96
        t0 = time.perf_counter()
        for _ in range(n):
            tok, cache, key = step(params, tok, cache, key)
            try:
                tok.copy_to_host_async()
            except Exception:
                pass
            pending.append(tok)
            if len(pending) > 8:
                _ = np.asarray(pending.popleft())
        while pending:
            _ = np.asarray(pending.popleft())
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{name}: {ms:.3f} ms/step", flush=True)

    @partial(jax.jit, donate_argnums=(2,))
    def step_hidden(params, tok, cache, key):
        logits, cache, hidden = forward(
            params, spec, tok[:, None], cache, rope_tables=rope,
            compute_dtype=cdt, return_hidden=True, logits_last_only=True,
        )
        # consume hidden only; derive a fake token from it (tiny)
        nxt = (jnp.sum(hidden[:, -1], -1) * 0).astype(jnp.int32) + 1  # [B]
        return nxt, cache, key

    @partial(jax.jit, donate_argnums=(2,))
    def step_logits(params, tok, cache, key):
        logits, cache = forward(
            params, spec, tok[:, None], cache, rope_tables=rope,
            compute_dtype=cdt, logits_last_only=True,
        )
        nxt = (jnp.sum(logits[:, -1], -1) * 0).astype(jnp.int32) + 1
        return nxt, cache, key

    @partial(jax.jit, donate_argnums=(2,))
    def step_full(params, tok, cache, key):
        logits, cache = forward(
            params, spec, tok[:, None], cache, rope_tables=rope,
            compute_dtype=cdt, logits_last_only=True,
        )
        key, sub = jax.random.split(key)
        nxt = sample(logits[:, -1], sub, sc)
        return nxt, cache, key

    run("C. full (logits+sample)", step_full)
    run("B. logits only", step_logits)
    run("A. hidden only (no lm_head)", step_hidden)


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def extra():
    import collections
    import dataclasses as dc
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.model import (
        KVCache, decoder_layer, rms_norm,
    )
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(dict(BASE, max_position_embeddings=2048))
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    params = gen.params
    rope, cdt = gen.rope_tables, gen.compute_dtype

    # D. layers WITHOUT embed (constant x) and WITHOUT the tail
    @partial(jax.jit, donate_argnums=(2,))
    def step_noembed(params, tok, cache, key):
        x = (jnp.zeros((1, 1, spec.hidden_size), cdt)
             + tok[0].astype(cdt) * 0 + 1)
        cos_t, sin_t = rope
        pos = cache.lengths[:, None]
        rope_cs = (cos_t[pos], sin_t[pos])
        new_a, new_b = [], []
        for li, lp in enumerate(params["layers"]):
            x, ba, bb = decoder_layer(
                lp, spec, x, (cache.bufs_a[li], cache.bufs_b[li]),
                cache.lengths, rope_cs,
            )
            new_a.append(ba)
            new_b.append(bb)
        cache = KVCache(lengths=cache.lengths + 1, bufs_a=new_a,
                        bufs_b=new_b)
        nxt = (jnp.sum(x[:, -1], -1) * 0).astype(jnp.int32) + 1
        return nxt, cache, key

    # E. embed gather ONLY (no layers, no tail)
    @partial(jax.jit, donate_argnums=(2,))
    def step_embed_only(params, tok, cache, key):
        x = params["embed"][tok[:, None]].astype(cdt)
        cache = dc.replace(cache, lengths=cache.lengths + 1)
        nxt = (jnp.sum(x[:, -1], -1) * 0).astype(jnp.int32) + 1
        return nxt, cache, key

    import numpy as np

    def run(name, step):
        cache = gen.new_cache()
        cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
        key = jax.random.PRNGKey(0)
        tok = jnp.zeros((1,), jnp.int32)
        tok, cache, key = step(params, tok, cache, key)
        _ = int(np.asarray(tok).reshape(-1)[0])
        pending = collections.deque()
        n = 96
        t0 = time.perf_counter()
        for _ in range(n):
            tok, cache, key = step(params, tok, cache, key)
            try:
                tok.copy_to_host_async()
            except Exception:
                pass
            pending.append(tok)
            if len(pending) > 8:
                _ = np.asarray(pending.popleft())
        while pending:
            _ = np.asarray(pending.popleft())
        print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms/step",
              flush=True)

    run("D. layers only (no embed/tail)", step_noembed)
    run("E. embed gather only", step_embed_only)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "extra":
    extra()
