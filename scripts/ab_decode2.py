"""Decode delivery A/B with the HONEST r4 readback pattern (depth-paced
np.asarray of landed async copies — ab_decode.py predates the barrier fix
and measures dispatch rate only; do not use it for delivery claims).

Sweeps KT_MLA_FUSED {0,1} x pipeline depth {4, 8, 16, 32} in
subprocesses (the fused flag is import-time). r5 motivation: lab12 says
in-program content is ~2.9 ms/step UNFUSED vs ~4.0 FUSED, while the
dispatch-rate A/B says the opposite — the delivery loop decides.

Usage: python scripts/ab_decode2.py            (driver)
       python scripts/ab_decode2.py <depth>    (one config, in-process)
"""
import collections
import dataclasses as dc
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def run_one(depth: int):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.engine.sampler import SamplingConfig
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(dict(BASE))
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    cache = gen.new_cache()
    cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
    decode = gen._decode_step(SamplingConfig())
    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1,), jnp.int32)
    tok, cache, key = decode(tok[:, None], cache, key)
    _ = int(np.asarray(tok)[0])

    n = 192
    best = 0.0
    for rep in range(3):
        pending = collections.deque()
        t0 = time.perf_counter()
        for _ in range(n):
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
        dt = time.perf_counter() - t0
        tps = n / dt
        best = max(best, tps)
        print(
            f"  depth={depth} rep{rep}: {tps:.1f} tok/s "
            f"({dt / n * 1e3:.3f} ms/step)", flush=True,
        )
    print(f"BEST depth={depth} fused={os.environ.get('KT_MLA_FUSED','1')} "
          f"{best:.1f} tok/s", flush=True)


def main():
    if len(sys.argv) > 1:
        run_one(int(sys.argv[1]))
        return
    for fused in ("1", "0"):
        for depth in (8, 16, 32):
            env = dict(os.environ, KT_MLA_FUSED=fused)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(depth)],
                env=env, capture_output=True, text=True, timeout=1800,
            )
            for line in p.stdout.splitlines():
                if line.startswith("BEST"):
                    print(line, flush=True)
            if p.returncode:
                print(f"fused={fused} depth={depth} FAILED:\n"
                      f"{p.stderr[-1500:]}", flush=True)


if __name__ == "__main__":
    main()
