"""Kernel lab 9: grouped (prefill-MoE) matmul variants at the bench
model's real shape — 512 tokens x k=6 -> 3072 sorted rows, 64 experts,
gate_up [2048 -> 2816] + down [1408 -> 2048].

Variants:
  w4a8    : grouped_w4a8_matmul (int8 MXU dots + per-group f32 epilogue)
  bf16dq  : grouped_quant_matmul on non-act_quant int4_g (bf16 VPU dequant
            per m-tile)
Methodology: marginal per-rep cost, scalar readback (see kernel_lab8).
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
    from ktransformers_tpu.ops.moe import moe_dispatch
    from ktransformers_tpu.ops.pallas.quant_matmul import grouped_quant_matmul
    from ktransformers_tpu.ops.pallas.w4a8_matmul import grouped_w4a8_matmul
    from ktransformers_tpu.quant.formats import quantize
    from ktransformers_tpu.quant.w4a8 import repack_offset_lo

    rng = np.random.default_rng(0)
    S, K, E = 512, 6, 64
    R_HI, R_LO = 24, 4

    def timed(fn, x0, *rest, reps, iters=4):
        @jax.jit
        def f(x, *rest):
            y = fn(x, *rest)
            for _ in range(reps - 1):
                ysc = y.reshape(-1)[0]
                gate = jnp.where(jnp.isfinite(ysc), 1.0, 0.0)
                y = fn(x * gate.astype(x.dtype), *rest)
            return y.reshape(-1)[0]

        float(f(x0, *rest))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(f(x0, *rest))
        return (time.perf_counter() - t0) / iters

    def marginal(name, fn, x0, *rest):
        hi = timed(fn, x0, *rest, reps=R_HI)
        lo = timed(fn, x0, *rest, reps=R_LO)
        dt = (hi - lo) / (R_HI - R_LO) * 1e3
        print(f"  {name:10s}: {dt:8.3f} ms/op  (T{R_HI}={hi*1e3:.1f} "
              f"T{R_LO}={lo*1e3:.1f})", flush=True)
        return dt

    ids = jnp.asarray(rng.integers(0, E, (S, K)), jnp.int32)
    order, token_of_row, sizes, _ = moe_dispatch(ids, E)

    for k, n in [(2048, 2816), (1408, 2048)]:
        print(f"grouped shape E={E} K={k} N={n} rows={S*K}", flush=True)
        w = jnp.asarray(
            rng.standard_normal((E, k, n)).astype(np.float32) * 0.02
        )
        qt4 = quantize(w, "int4_g", group_size=128)
        qt4a = repack_offset_lo(qt4)
        x = jnp.asarray(
            rng.standard_normal((S * K, k)).astype(np.float32)
        ).astype(jnp.bfloat16)
        marginal("w4a8", grouped_w4a8_matmul, x, qt4a, sizes)
        marginal("bf16dq", grouped_quant_matmul, x, qt4, sizes)
        # bf16-dequant with the FAST offset-lo decode (int8 shift, r4)
        from ktransformers_tpu.ops.pallas import quant_matmul as qm_mod

        qm_mod._GROUPED_IMPL = "bf16"
        marginal("bf16fast", grouped_quant_matmul, x, qt4a, sizes)
        qm_mod._GROUPED_IMPL = "w4a8"


if __name__ == "__main__":
    main()
