"""On-chip probe: dense_w4a8_ffn at prefill M (shared-expert shape
[512, 2048] x inter 2816) vs the two dense W4A8 launches it would fuse.
The registration gate currently rejects rows > 128 (r3: bm=512 busted
scoped VMEM at 19.6 MB) — but dense_w4a8_ffn now self-fits bm by halving
(lands at bm=64 for this shape), so the gate may be stale. lab14 put
`shared` at 0.622 ms/layer; the fused path should cut the h/a f32 round
trips (~40 of ~75 MB).
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
    from ktransformers_tpu.ops.pallas.w4a8_matmul import (
        dense_ffn_plan,
        dense_w4a8_ffn,
        dense_w4a8_matmul,
    )
    from ktransformers_tpu.quant.formats import quantize
    from ktransformers_tpu.quant.w4a8 import repack_offset_lo

    k, inter, m = 2048, 2816, 512
    rng = np.random.default_rng(0)
    gu = jnp.asarray(
        rng.standard_normal((k, 2 * inter)).astype(np.float32) * 0.05
    )
    dn = jnp.asarray(
        rng.standard_normal((inter, k)).astype(np.float32) * 0.05
    )
    qgu = repack_offset_lo(quantize(gu, "int4_g", group_size=128))
    qdn = repack_offset_lo(quantize(dn, "int4_g", group_size=128))
    del gu, dn
    bc = dense_ffn_plan(qgu, qdn, "silu", None)
    print(f"plan bc={bc}", flush=True)
    x = jnp.asarray(
        rng.standard_normal((m, k)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    jax.block_until_ready((x, qgu.data, qdn.data))

    @jax.jit
    def fused(x, qgu, qdn):
        return dense_w4a8_ffn(x, qgu, qdn, act="silu", bc=bc)

    @jax.jit
    def unfused(x, qgu, qdn):
        h = dense_w4a8_matmul(x, qgu)
        g, u = h[:, :inter], h[:, inter:]
        a = (g * jax.nn.sigmoid(g) * u).astype(x.dtype)
        return dense_w4a8_matmul(a, qdn).astype(x.dtype)

    t0 = time.perf_counter()
    yf = np.asarray(fused(x, qgu, qdn), np.float32)
    print(f"fused compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    yu = np.asarray(unfused(x, qgu, qdn), np.float32)
    print(f"unfused compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    scale = max(np.abs(yu).max(), 1e-6)
    print(f"max rel err: {np.abs(yf - yu).max() / scale:.4f}", flush=True)

    R_HI, R_LO = 24, 4

    def timed(fn, reps, iters=5):
        @jax.jit
        def f(x, qgu, qdn):
            for i in range(reps):
                if i:
                    ysc = x.reshape(-1)[0]
                    gate = jnp.where(jnp.isfinite(ysc), 1.0, 0.0)
                    x = x * gate.astype(x.dtype)
                y = fn(x, qgu, qdn)
                x = x + y * jnp.bfloat16(0.001)
            return x.reshape(-1)[0]

        float(f(x, qgu, qdn))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(x, qgu, qdn))
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
