"""On-chip probe for grouped_w4a8_ffn (r5 prefill fix): Mosaic-compiles
the fused prefill expert-FFN kernel at bench-model shapes, checks it
against the unfused grouped path, and measures the marginal rep cost of
both (kernel_lab8 methodology) — expected ~1.7 ms unfused (lab15:
gmm_gu 1.08 + gmm_dn 0.60) vs ~0.8-1.0 ms fused.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.ops.activations import ActivationConfig
    from ktransformers_tpu.ops.moe import moe_dispatch
    from ktransformers_tpu.ops.pallas.w4a8_matmul import (
        grouped_ffn_fits,
        grouped_w4a8_ffn,
        grouped_w4a8_matmul,
    )
    from ktransformers_tpu.quant.formats import quantize
    from ktransformers_tpu.quant.w4a8 import repack_offset_lo

    e, k, inter = 64, 2048, 1408
    t, topk = 512, 6
    rng = np.random.default_rng(0)
    gu = jnp.asarray(
        rng.standard_normal((e, k, 2 * inter)).astype(np.float32) * 0.05
    )
    dn = jnp.asarray(
        rng.standard_normal((e, inter, k)).astype(np.float32) * 0.05
    )
    qgu = repack_offset_lo(quantize(gu, "int4_g", group_size=128))
    qdn = repack_offset_lo(quantize(dn, "int4_g", group_size=128))
    del gu, dn
    assert grouped_ffn_fits(qgu, qdn, "silu", None, bm=64)
    ids = jnp.asarray(rng.integers(0, e, (t, topk)), jnp.int32)
    x = jnp.asarray(
        rng.standard_normal((t, k)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    order, token_of_row, sizes, _ = moe_dispatch(ids, e)
    xs = x[token_of_row]
    jax.block_until_ready((xs, sizes, qgu.data, qdn.data))
    print("inputs ready", flush=True)

    @jax.jit
    def fused(xs, qgu, qdn, sizes):
        return grouped_w4a8_ffn(xs, qgu, qdn, sizes, act="silu")

    @jax.jit
    def unfused(xs, qgu, qdn, sizes):
        h = grouped_w4a8_matmul(xs, qgu, sizes)
        g, u = h[:, :inter], h[:, inter:]
        a = (g * jax.nn.sigmoid(g) * u).astype(xs.dtype)
        return grouped_w4a8_matmul(a, qdn, sizes).astype(xs.dtype)

    t0 = time.perf_counter()
    yf = np.asarray(fused(xs, qgu, qdn, sizes), np.float32)
    print(f"fused compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    yu = np.asarray(unfused(xs, qgu, qdn, sizes), np.float32)
    print(f"unfused compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    scale = max(np.abs(yu).max(), 1e-6)
    err = np.abs(yf - yu).max() / scale
    print(f"max rel err fused vs unfused: {err:.4f}", flush=True)

    R_HI, R_LO = 24, 4

    def timed(fn, reps, iters=5):
        @jax.jit
        def f(x, qgu, qdn, sizes):
            for i in range(reps):
                if i:
                    ysc = x.reshape(-1)[0]
                    gate = jnp.where(jnp.isfinite(ysc), 1.0, 0.0)
                    x = x * gate.astype(x.dtype)
                y = fn(x, qgu, qdn, sizes)
                x = x + y * jnp.bfloat16(0.001)
            return x.reshape(-1)[0]

        float(f(xs, qgu, qdn, sizes))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(xs, qgu, qdn, sizes))
            best = min(best, time.perf_counter() - t0)
        return best

    for name, fn in (("fused", fused), ("unfused", unfused)):
        hi = timed(fn, R_HI)
        lo = timed(fn, R_LO)
        dt = (hi - lo) / (R_HI - R_LO) * 1e3
        print(f"  {name:8s}: {dt:8.3f} ms/rep (T{R_HI}={hi*1e3:.0f} "
              f"T{R_LO}={lo*1e3:.0f})", flush=True)


if __name__ == "__main__":
    main()
