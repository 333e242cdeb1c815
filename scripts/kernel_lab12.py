"""Kernel lab 12 (r5): REAL-MODEL decode-step device content, measured
in-program — chain k decode steps (embed -> 27 layers -> lm_head ->
argmax) inside ONE jit, scalar readback, marginal (T(k_hi)-T(k_lo))/dk.

lab11 (fixed to use the registered Pallas kernels) says a hot MoE layer
chained against itself costs ~71 us — 26 of those + dense + tail
predicts ~2.1 ms/step, yet the bench step is 3.4 ms. This lab measures
the real 27-layer program and bisects with env toggles (each variant in
a SUBPROCESS because the toggles are import-time):

  base     : the bench configuration
  notail   : skip lm_head+argmax, chain on summed hidden (tail cost)
  nofused  : KT_MLA_FUSED=0 (unfused attention)
  grouped  : KT_DECODE_GATHER_MAX_TOKENS=0 (decode MoE via sorted
             grouped-matmul path instead of the gathered FFN kernel)
  l9       : 9-layer model (per-layer slope vs base)

Run: python scripts/kernel_lab12.py            (driver, all variants)
     python scripts/kernel_lab12.py VARIANT    (one variant, in-process)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    "notail": {},
    "nofused": {"KT_MLA_FUSED": "0"},
    "grouped": {"KT_DECODE_GATHER_MAX_TOKENS": "0"},
    "l9": {},
}

K_HI, K_LO = 8, 2


def run_variant(name: str):
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.model import forward
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    n_layers = 9 if name == "l9" else 27
    spec = spec_from_hf_config(
        dict(BASE, max_position_embeddings=2048, num_hidden_layers=n_layers)
    )
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    import dataclasses as dc

    spec_, rope_, cdt_ = gen.spec, gen.rope_tables, gen.compute_dtype
    notail = name == "notail"

    def steps_fn(k):
        @jax.jit
        def f(params, tok, cache):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                if notail:
                    logits, cache, hidden = forward(
                        params, spec_, tok[:, None], cache,
                        rope_tables=rope_, compute_dtype=cdt_,
                        logits_last_only=True, return_hidden=True,
                    )
                    # chain on the hidden state, skip lm_head cost by
                    # making the logits unused... forward still computes
                    # them; instead derive next tok from hidden only
                    tok = (
                        jnp.sum(hidden[:, -1, :64], -1) * 0
                    ).astype(jnp.int32)
                    acc = acc + jnp.sum(hidden[:, -1, :8])
                else:
                    logits, cache = forward(
                        params, spec_, tok[:, None], cache,
                        rope_tables=rope_, compute_dtype=cdt_,
                        logits_last_only=True,
                    )
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
        float(f(gen.params, tok, cache0))  # compile+warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(gen.params, tok, cache0))
            best = min(best, time.perf_counter() - t0)
        return best

    hi = timed(K_HI)
    lo = timed(K_LO)
    per_step = (hi - lo) / (K_HI - K_LO) * 1e3
    out = {
        "variant": name,
        "n_layers": n_layers,
        "per_step_ms": round(per_step, 3),
        f"T{K_HI}_ms": round(hi * 1e3, 1),
        f"T{K_LO}_ms": round(lo * 1e3, 1),
    }
    print("RESULT " + json.dumps(out), flush=True)


def main():
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    # notail needs lm_head skipped — forward computes logits anyway, so
    # the notail variant above measures tail-minus-argmax only; still
    # informative for sampler/argmax cost. Run each variant isolated.
    results = {}
    for name, env in VARIANTS.items():
        e = dict(os.environ, **env)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            env=e, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if line:
            results[name] = json.loads(line[-1][7:])
            print(line[-1], flush=True)
        else:
            print(f"{name} FAILED:\n{p.stderr[-2000:]}", flush=True)
    if "base" in results and "l9" in results:
        slope = (
            results["base"]["per_step_ms"] - results["l9"]["per_step_ms"]
        ) / 18
        print(f"per-LAYER in-program (base vs l9 slope): "
              f"{slope * 1e3:.1f} us")


if __name__ == "__main__":
    main()
