"""Kernel lab 13 (r5): why is an IN-PROGRAM chained decode step ~1 ms
more expensive than the same step as separate programs? (lab12: k-chain
marginal 4.0 ms/step fused vs 2.86 ms/step honest paced delivery; k-step
programs are the cure for the ~1.3 ms/program tunnel overhead, but only
if chaining stops costing more than it saves.)

Variants (monkeypatched per subprocess, k=6 chained steps, marginal
(T(k6)-T(k2))/4 with scalar readback):
  full      : as-is
  nowrite   : _write_cache returns the buffer unchanged (no KV update)
  noargmax  : next token = cheap sum instead of argmax over [1, 102400]
  neither   : both off
Usage: python scripts/kernel_lab13.py            (driver)
       python scripts/kernel_lab13.py VARIANT
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

VARIANTS = ("full", "nowrite", "noargmax", "neither")
K_HI, K_LO = 6, 2


def run_variant(name: str):
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import ktransformers_tpu.models.model as M
    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    if name in ("nowrite", "neither"):
        M._write_cache = lambda buf, new, pos: buf
    noargmax = name in ("noargmax", "neither")

    spec = spec_from_hf_config(dict(BASE))
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    import dataclasses as dc

    rope, cdt = gen.rope_tables, gen.compute_dtype

    def steps_fn(k):
        @jax.jit
        def f(params, tok, cache):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                logits, cache = M.forward(
                    params, spec, tok[:, None], cache, rope_tables=rope,
                    compute_dtype=cdt, logits_last_only=True,
                )
                if noargmax:
                    tok = (
                        jnp.sum(logits[:, -1, :64], -1) * 0
                    ).astype(jnp.int32)
                else:
                    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                acc = acc + tok[0].astype(jnp.float32)
            return acc

        return f

    def timed(k, iters=6):
        cache0 = gen.new_cache()
        cache0 = dc.replace(
            cache0, lengths=jnp.full_like(cache0.lengths, 512)
        )
        f = steps_fn(k)
        tok = jnp.zeros((1,), jnp.int32)
        float(f(gen.params, tok, cache0))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(gen.params, tok, cache0))
            best = min(best, time.perf_counter() - t0)
        return best

    hi, lo = timed(K_HI), timed(K_LO)
    per = (hi - lo) / (K_HI - K_LO) * 1e3
    print("RESULT " + json.dumps(
        {"variant": name, "per_step_ms": round(per, 3),
         f"T{K_HI}": round(hi * 1e3, 1), f"T{K_LO}": round(lo * 1e3, 1)}
    ), flush=True)


def main():
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    for name in VARIANTS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=1800,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(lines[-1] if lines else f"{name} FAILED: {p.stderr[-800:]}",
              flush=True)


if __name__ == "__main__":
    main()
