"""Re-measure fuse_shared_experts with honest barriers (r4): r2 recorded
-4% under the broken block_until_ready barrier; the r4 decode
decomposition says inter-kernel boundaries are the exposed cost, and the
fusion removes 2 kernel launches per MoE layer (the shared-expert FFN
rides the gathered kernel as 2 always-selected rows)."""
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
    from ktransformers_tpu.ops.fuse_shared import fuse_shared_experts
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(dict(BASE, max_position_embeddings=2048))

    def measure(tag, params):
        gen = Generator(params, spec, max_len=1024, batch=1)
        cache = gen.new_cache()
        cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
        decode = gen._decode_step(SamplingConfig())
        key = jax.random.PRNGKey(0)
        tok = jnp.zeros((1,), jnp.int32)
        tok, cache, key = decode(tok[:, None], cache, key)
        _ = int(np.asarray(tok)[0])
        pending = collections.deque()
        n = 128
        t0 = time.perf_counter()
        for _ in range(n):
            tok, cache, key = decode(tok[:, None], cache, key)
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
        print(f"{tag}: {ms:.3f} ms/tok ({1e3/ms:.1f} tok/s)", flush=True)
        del gen, cache

    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    measure("baseline (dense shared FFN)", params)

    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    fused = fuse_shared_experts(params, spec)
    jax.block_until_ready(fused)
    assert any(
        getattr(lp.get("moe", {}).get("experts"), "n_shared_fused", 0)
        for lp in fused["layers"] if "moe" in lp
    ), "fusion did not apply"
    measure("fused shared experts", fused)


if __name__ == "__main__":
    main()
