"""Kernel lab 10: what does one extra kernel LAUNCH cost in-program at
decode M=1?  (round-5 item 2: decode is content-bound at ~330 GB/s
effective vs 630 isolated — is the gap per-launch overhead, and how much
is one launch?)

Design: stream the SAME total weight bytes per rep, varying only how many
pallas_call launches carry them:
  one    : 1x dense_w4a8_matmul [2048 -> N]
  split2 : 2x [2048 -> N/2] (concatenate)
  split4 : 4x [2048 -> N/4]
  split8 : 8x [2048 -> N/8]
slope of (ms/rep vs launches) = exposed per-launch cost. Then:
  xla1   : one + rms_norm on the output between reps (XLA fusion launch
           sandwiched between pallas kernels — the decode step's real
           inter-kernel pattern)
  xla3   : one + 3 chained small XLA ops (norm, residual add, scale)

Methodology: marginal per-rep cost — chain R reps through a data gate
inside ONE jit, end in a scalar readback; report (T(R_HI)-T(R_LO))/dR.
Weights ride as jit arguments (kernel_lab8).
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
    from ktransformers_tpu.ops.norm import rms_norm
    from ktransformers_tpu.ops.pallas.w4a8_matmul import dense_w4a8_matmul
    from ktransformers_tpu.quant.formats import quantize
    from ktransformers_tpu.quant.w4a8 import repack_offset_lo

    rng = np.random.default_rng(0)
    K, N = 2048, 11264  # ~11.5 MB packed int4 -> ~14 us at 819 GB/s
    M = 1
    R_HI, R_LO = 256, 32

    def timed(fn, x0, *rest, reps, iters=6):
        @jax.jit
        def f(x, *rest):
            y = fn(x, *rest)
            for _ in range(reps - 1):
                ysc = y.reshape(-1)[0]
                gate = jnp.where(jnp.isfinite(ysc), 1.0, 0.0)
                y = fn(x * gate.astype(x.dtype), *rest)
            return y.reshape(-1)[0]

        float(f(x0, *rest))  # warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(x0, *rest))
            best = min(best, time.perf_counter() - t0)
        return best

    def marginal(name, fn, x0, *rest):
        hi = timed(fn, x0, *rest, reps=R_HI)
        lo = timed(fn, x0, *rest, reps=R_LO)
        dt = (hi - lo) / (R_HI - R_LO) * 1e3
        print(f"  {name:8s}: {dt:8.4f} ms/rep  (T{R_HI}={hi*1e3:.1f} "
              f"T{R_LO}={lo*1e3:.1f})", flush=True)
        return dt

    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    x = jnp.asarray(
        rng.standard_normal((M, K)).astype(np.float32)
    ).astype(jnp.bfloat16)
    g = jnp.ones((K,), jnp.bfloat16)

    results = {}
    for nsplit in (1, 2, 4):
        qts = tuple(
            repack_offset_lo(quantize(
                jnp.asarray(w[:, i * (N // nsplit):(i + 1) * (N // nsplit)]),
                "int4_g", group_size=128,
            ))
            for i in range(nsplit)
        )

        def fn(xx, *qq):
            outs = [dense_w4a8_matmul(xx, q) for q in qq]
            y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)
            # route back to [M, K] so reps chain: cheap slice
            return y[:, :K]

        results[nsplit] = marginal(f"split{nsplit}", fn, x, *qts)

    lo, hi = results[1], results[4]
    print(f"  per-launch exposed cost ~ {(hi - lo) / 3 * 1e3:.1f} us "
          f"(slope split1->split4)")

    qt = repack_offset_lo(quantize(jnp.asarray(w), "int4_g", group_size=128))

    def fn_xla1(xx, q, gg):
        y = dense_w4a8_matmul(xx, q)
        return rms_norm(y[:, :K], gg, 1e-6)

    def fn_xla3(xx, q, gg):
        y = dense_w4a8_matmul(xx, q)
        h = rms_norm(y[:, :K], gg, 1e-6)
        h = h + xx.astype(h.dtype)
        return h * 0.5

    marginal("xla1", fn_xla1, x, qt, g)
    marginal("xla3", fn_xla3, x, qt, g)


if __name__ == "__main__":
    main()
