"""Kernel lab 8: dense matmul variants at PREFILL M — which kernel should
the prefill dense path use?

Methodology (hard-won, r4): time a program with R chained reps and one
with r reps, both ending in a SCALAR readback (np float conversion — on
axon, block_until_ready returns before execution completes, so only a real
device->host read is a barrier), and report (T(R) - T(r)) / (R - r): the
marginal per-rep cost, free of dispatch overhead and tunnel RTT. Weights
ride as jit arguments (closures re-upload constants per dispatch).

Variants per shape:
  w4a8    : dense_w4a8_matmul (per-group int8 MXU dots) — decode default
  bf16dq  : quant_matmul int4_g WITHOUT act_quant (bf16 VPU dequant)
  int8    : quant_matmul int8 (single whole-K dot + per-channel scale)
  bf16    : plain jnp.dot against pre-dequantized bf16 weights (XLA)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from ktransformers_tpu.ops.pallas.quant_matmul import quant_matmul
    from ktransformers_tpu.ops.pallas.w4a8_matmul import dense_w4a8_matmul
    from ktransformers_tpu.quant.formats import dequantize, quantize
    from ktransformers_tpu.quant.w4a8 import repack_offset_lo

    rng = np.random.default_rng(0)
    M = int(os.environ.get("LAB_M", "512"))
    R_HI, R_LO = 48, 8

    def timed(fn, x0, *rest, reps, iters=4):
        @jax.jit
        def f(x, *rest):
            y = fn(x, *rest)
            for _ in range(reps - 1):
                ysc = y.reshape(-1)[0]
                gate = jnp.where(jnp.isfinite(ysc), 1.0, 0.0)
                y = fn(x * gate.astype(x.dtype), *rest)
            return y.reshape(-1)[0]

        float(f(x0, *rest))  # warm (compile + first run)
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(x0, *rest))
        return (time.perf_counter() - t0) / iters

    def marginal(name, fn, x0, *rest):
        hi = timed(fn, x0, *rest, reps=R_HI)
        lo = timed(fn, x0, *rest, reps=R_LO)
        dt = (hi - lo) / (R_HI - R_LO) * 1e3
        print(f"  {name:10s}: {dt:8.3f} ms/op  (T12={hi*1e3:.1f} "
              f"T4={lo*1e3:.1f})", flush=True)
        return dt

    for k, n in [(2048, 3648), (2048, 21888), (2048, 102400)]:
        print(f"shape K={k} N={n} M={M}", flush=True)
        w = jnp.asarray(
            rng.standard_normal((k, n)).astype(np.float32) * 0.02
        )
        qt4 = quantize(w, "int4_g", group_size=128)
        qt4a = repack_offset_lo(qt4)
        qt8 = quantize(w, "int8")
        wbf = dequantize(qt4, jnp.bfloat16)
        x = jnp.asarray(
            rng.standard_normal((M, k)).astype(np.float32)
        ).astype(jnp.bfloat16)
        marginal("w4a8", dense_w4a8_matmul, x, qt4a)
        marginal("bf16dq", quant_matmul, x, qt4)
        marginal("int8", quant_matmul, x, qt8)
        marginal("bf16", jnp.dot, x, wbf)


if __name__ == "__main__":
    main()
