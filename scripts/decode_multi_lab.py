"""Multi-step decode programs (r4): the layer-count bisect shows a decode
step is ~23 us/layer of model + ~3.0 ms of per-execution overhead on this
runtime, so k decode steps fused into ONE program (lax.scan unroll=k,
Generator._decode_steps) should amortize the overhead k-fold. The r3
'k-step scan = 387 ms/dispatch' negative was measured with the broken
block_until_ready barrier + closure-constant era — re-measured here with
paced np.asarray readbacks."""
import collections
import dataclasses as dc
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

    spec = spec_from_hf_config(dict(BASE, max_position_embeddings=2048))
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    sc = SamplingConfig()

    def paced(fn, tok0, cache, key, n_disp, toks_per_disp, depth=8):
        tok = tok0
        out = fn(tok, cache, key)
        tok, cache, key = out[0][:, -1] if out[0].ndim == 2 else out[0], \
            out[1], out[2]
        _ = int(np.asarray(tok)[0]) if tok.ndim == 1 else None
        pending = collections.deque()
        t0 = time.perf_counter()
        for _i in range(n_disp):
            out = fn(tok, cache, key)
            toks, cache, key = out
            tok = toks[:, -1] if toks.ndim == 2 else toks
            try:
                toks.copy_to_host_async()
            except Exception:
                pass
            pending.append(toks)
            if len(pending) > depth:
                _ = np.asarray(pending.popleft())
        while pending:
            _ = np.asarray(pending.popleft())
        dt = time.perf_counter() - t0
        return dt / (n_disp * toks_per_disp) * 1e3

    # single-step baseline
    cache = gen.new_cache()
    cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
    d1 = gen._decode_step(sc)
    ms = paced(lambda t, c, k: d1(t[:, None], c, k), jnp.zeros((1,), jnp.int32),
               cache, jax.random.PRNGKey(0), 96, 1)
    print(f"k=1: {ms:.3f} ms/tok ({1e3/ms:.1f} tok/s)", flush=True)

    for k in (2, 4, 8):
        cache = gen.new_cache()
        cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
        dk = gen._decode_steps(sc, k)
        t0 = time.perf_counter()
        ms = paced(dk, jnp.zeros((1,), jnp.int32), cache,
                   jax.random.PRNGKey(0), max(12, 96 // k), k)
        print(f"k={k}: {ms:.3f} ms/tok ({1e3/ms:.1f} tok/s) "
              f"[first incl compile {time.perf_counter()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
