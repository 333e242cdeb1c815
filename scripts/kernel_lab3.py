"""Kernel lab 3: does pre-tiling the packed weights to [E, nb, k2, bn]
(making each fetched block contiguous in HBM) fix the ~115GB/s gather?"""
import functools, os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from ktransformers_tpu.quant.formats import quantize, split_x_for_int4, dequantize

def make_gather(n_groups, gs2):
    def kernel(ids_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref):
        i = pl.program_id(1)
        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        k2, bn = w_ref.shape[2], w_ref.shape[3]
        bi = w_ref[0, 0].astype(jnp.int32)
        lo = (((bi & 0xF) ^ 8) - 8).astype(jnp.float32)
        hi = (((bi >> 4) ^ 8) - 8).astype(jnp.float32)
        s = s_ref[0, 0].astype(jnp.float32)
        s_exp = jnp.broadcast_to(s[:, None, :], (n_groups, gs2, bn)).reshape(k2, bn)
        wl = (lo * s_exp).astype(xl_ref.dtype)
        wh = (hi * s_exp).astype(xh_ref.dtype)
        acc = jnp.dot(xl_ref[:], wl, preferred_element_type=jnp.float32) + jnp.dot(
            xh_ref[:], wh, preferred_element_type=jnp.float32)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
        o_ref[:] += jnp.where(row_ids == i, acc, 0.0)
    return kernel

@functools.partial(jax.jit, static_argnames=("bn", "n"))
def gathered_tiled(x_rows, wt, st, ids, n, bn):
    r, kdim = x_rows.shape
    k2 = kdim // 2
    e, nb, _, _ = wt.shape
    n_groups = st.shape[2]
    gs2 = k2 // n_groups
    r8 = max(8, ((r + 7) // 8) * 8)
    gs = kdim // n_groups
    xl, xh = split_x_for_int4(x_rows, kdim, gs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, r),
        in_specs=[
            pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
            pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
            pl.BlockSpec((1, 1, k2, bn), lambda j, i, ids: (ids[i], j, 0, 0)),
            pl.BlockSpec((1, 1, n_groups, bn), lambda j, i, ids: (ids[i], j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((r8, bn), lambda j, i, ids: (0, j)),
    )
    return pl.pallas_call(
        make_gather(n_groups, gs2), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r8, n), jnp.float32),
    )(ids, xl, xh, wt, st)

def bench_production(x, qt, ids, nbytes, INNER):
    from ktransformers_tpu.ops.pallas.quant_matmul import gathered_quant_matmul
    @jax.jit
    def chain(x, ids):
        def body(i, x):
            y = gathered_quant_matmul(x, qt, ids)
            return (y[:, :x.shape[1]] * 1e-6).astype(x.dtype) + x
        return jax.lax.fori_loop(0, INNER, body, x)
    y = chain(x, ids); jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(5): y = chain(y, ids)
    jax.block_until_ready(y)
    dt = (time.perf_counter()-t0)/(5*INNER)
    print(f"production bn<=512     : {dt*1e6:8.1f} us {nbytes/dt/1e9:7.1f} GB/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    E, K, N, R = 64, 2048, 2816, 8
    w = jnp.asarray(rng.standard_normal((E, K, N)).astype(np.float32) * 0.05)
    ids = jnp.asarray(np.arange(R) % E, jnp.int32)
    INNER = 40
    qt = quantize(w, "int4_g", group_size=128)
    nbytes = R * qt.data[0].size
    x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
    wd = dequantize(qt, jnp.float32)[np.asarray(ids)]
    ref = jnp.einsum("rk,rkn->rn", x.astype(jnp.float32), wd)
    bench_production(x, qt, ids, nbytes, INNER)
    k2 = K // 2
    ng = qt.scales.shape[1]
    for bn in (256, 1408, 2816):
        nb = N // bn
        # pre-tile: [E, k2, N] -> [E, nb, k2, bn]
        wt = jnp.asarray(
            qt.data.reshape(E, k2, nb, bn).transpose(0, 2, 1, 3))
        st = jnp.asarray(
            qt.scales.reshape(E, ng, nb, bn).transpose(0, 2, 1, 3))
        y = gathered_tiled(x, wt, st, ids, N, bn)
        err = float(jnp.abs(y.astype(jnp.float32)-ref).max()/jnp.abs(ref).max())
        @jax.jit
        def chain(x, wt, st, ids, bn=bn):
            def body(i, x):
                y = gathered_tiled(x, wt, st, ids, N, bn)
                return (y[:, :K] * 1e-6).astype(x.dtype) + x
            return jax.lax.fori_loop(0, INNER, body, x)
        y = chain(x, wt, st, ids); jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(5): y = chain(y, wt, st, ids)
        jax.block_until_ready(y)
        dt = (time.perf_counter()-t0)/(5*INNER)
        print(f"tiled bn={bn:5d} grid={nb*R:3d}: {dt*1e6:8.1f} us {nbytes/dt/1e9:7.1f} GB/s  rel_err {err:.1e}", flush=True)

if __name__ == "__main__":
    main()
