"""Round-3 lab: device-time of the decode-M=1 projection kernels.

The loop lives INSIDE one jit (lax.fori_loop with a data dependency), so a
single host dispatch covers `iters` kernel invocations and the wall time
measures device time, not tunnel dispatch (~2 ms/call on axon).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

ITERS = 300


def main():
    import functools

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.ops.pallas.quant_matmul import quant_matmul
    from ktransformers_tpu.quant.formats import QTensor, quantize

    key = jax.random.PRNGKey(0)
    D = 2048

    def mk(k, n, kind="int8"):
        w = jax.random.normal(key, (k, n), jnp.float32) * 0.02
        return quantize(w, kind)

    def bench_loop(fn_one, x0, *ws):
        """fn_one(x, *ws) -> y; chains ITERS calls inside one jit."""

        @jax.jit
        def run(x0, *ws):
            def body(i, x):
                y = fn_one(x, *ws)
                # non-foldable data dependency (0.0*y would be constant-
                # folded, letting XLA hoist the matmul out of the loop)
                eps = (y[..., :1] * 1e-12).astype(x0.dtype)
                return x0 * (1.0 + eps)

            return jax.lax.fori_loop(0, ITERS, body, x0)

        r = run(x0, *ws)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = run(x0, *ws)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / ITERS * 1e6

    shapes = {
        "q_proj   2048x3072": mk(D, 3072),
        "kv_a     2048x576": mk(D, 576),
        "o_proj   2048x2048": mk(D, 2048),
        "sh_gu    2048x5632": mk(D, 5632),
        "sh_down  2816x2048": mk(2816, 2048),
        "fused qkv 2048x3648": mk(D, 3648),
        "fused qkv+gu 2048x9280": mk(D, 3072 + 576 + 5632),
    }

    for name, w in shapes.items():
        k = w.data.shape[0]
        x = jnp.ones((1, k), jnp.bfloat16)

        def one(x, data, scales, w=w):
            import dataclasses

            qt = dataclasses.replace(w, data=data, scales=scales)
            return quant_matmul(x, qt)

        us = bench_loop(one, x, w.data, w.scales)
        bytes_ = w.data.size + w.scales.size * 4
        sol = bytes_ / 819e9 * 1e6
        print(f"{name}: {us:7.1f} us  (bytes {bytes_/1e6:5.1f} MB, SOL {sol:5.1f} us, ovh {us-sol:5.1f})")

    # XLA dequant-dot for q_proj
    w = shapes["q_proj   2048x3072"]
    x = jnp.ones((1, D), jnp.bfloat16)

    def xla_one(x, data, scales):
        wf = data.astype(jnp.bfloat16) * scales.astype(jnp.bfloat16)
        return x @ wf

    print(f"XLA dequant-dot q_proj: {bench_loop(xla_one, x, w.data, w.scales):7.1f} us")

    wf = jax.random.normal(key, (D, 3072), jnp.bfloat16)
    print(f"XLA bf16 dot q_proj:    {bench_loop(lambda x, wf: x @ wf, x, wf):7.1f} us (SOL {wf.size*2/819e9*1e6:.1f})")

    # tiny pallas launch floor
    from jax.experimental import pallas as pl

    def _tiny(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def tiny_one(x):
        return pl.pallas_call(
            _tiny, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16)
        )(x)

    v = jnp.ones((8, 128), jnp.bfloat16)
    print(f"tiny pallas launch:     {bench_loop(tiny_one, v):7.1f} us")

    # rms_norm glue op for scale
    from ktransformers_tpu.ops.norm import rms_norm

    g = jnp.ones((D,), jnp.float32)
    print(f"XLA rms_norm 1x2048:    {bench_loop(lambda x, g: rms_norm(x, g, 1e-6), x, g):7.1f} us")


if __name__ == "__main__":
    main()
