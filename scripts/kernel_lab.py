"""Kernel lab: A/B variants of the gathered int4 dequant-matmul math on the
real chip. Not part of the package — findings get folded back into
ops/pallas/quant_matmul.py."""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from ktransformers_tpu.quant.formats import quantize, split_x_for_int4


def math_v1(xl, xh, w_blk, s, n_groups, gs2):
    """r1: expand scales to [k2, bn], scale codes, two full-K dots."""
    k2, bn = w_blk.shape
    bi = w_blk.astype(jnp.int32)
    lo = (((bi & 0xF) ^ 8) - 8).astype(jnp.float32)
    hi = (((bi >> 4) ^ 8) - 8).astype(jnp.float32)
    s_exp = jnp.broadcast_to(
        s[:, None, :], (n_groups, gs2, bn)
    ).reshape(k2, bn)
    wl = (lo * s_exp).astype(xl.dtype)
    wh = (hi * s_exp).astype(xh.dtype)
    return jnp.dot(xl, wl, preferred_element_type=jnp.float32) + jnp.dot(
        xh, wh, preferred_element_type=jnp.float32
    )


def math_v2(xl, xh, w_blk, s, n_groups, gs2):
    """unrolled per-group dots with post-scale."""
    k2, bn = w_blk.shape
    m = xl.shape[0]
    b = w_blk.astype(jnp.int32)
    lo8 = ((b & 0xF) ^ 8).astype(xl.dtype)
    hi8 = ((b >> 4) ^ 8).astype(xh.dtype)
    sf = s.astype(jnp.float32)
    y = jnp.zeros((m, bn), jnp.float32)
    for g in range(n_groups):
        wl_g = lo8[g * gs2 : (g + 1) * gs2]
        wh_g = hi8[g * gs2 : (g + 1) * gs2]
        xl_g = xl[:, g * gs2 : (g + 1) * gs2]
        xh_g = xh[:, g * gs2 : (g + 1) * gs2]
        p = jnp.dot(xl_g, wl_g, preferred_element_type=jnp.float32) + jnp.dot(
            xh_g, wh_g, preferred_element_type=jnp.float32
        )
        rs = jnp.sum(
            xl_g.astype(jnp.float32) + xh_g.astype(jnp.float32),
            axis=1, keepdims=True,
        )
        y = y + p * sf[g] - rs * (8.0 * sf[g])
    return y


def math_v3(xl, xh, w_blk, s, n_groups, gs2):
    """full-K dots on biased codes; per-group scale folded via a masked
    second pass: y = sum_g s_g*(P_g) where P computed per group is avoided:
    instead scale codes in BF16 (cheaper than f32 of v1)."""
    k2, bn = w_blk.shape
    bi = w_blk.astype(jnp.int32)
    lo = (((bi & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
    hi = (((bi >> 4)) ^ 8).astype(jnp.bfloat16) - 8.0
    s_exp = jnp.broadcast_to(
        s.astype(jnp.bfloat16)[:, None, :], (n_groups, gs2, bn)
    ).reshape(k2, bn)
    wl = lo * s_exp
    wh = hi * s_exp
    return jnp.dot(xl, wl, preferred_element_type=jnp.float32) + jnp.dot(
        xh, wh, preferred_element_type=jnp.float32
    )


def math_v4(xl, xh, w_blk, s, n_groups, gs2):
    """biased codes + full-K dots + scale via x-side group rowsums from a
    ones-indicator matmul; per-group scaling folded into the WEIGHT side by
    scaling only the OUTPUT: valid only when scales shared across groups —
    here: approximate check disabled; perf probe only."""
    k2, bn = w_blk.shape
    b = w_blk.astype(jnp.int32)
    lo8 = ((b & 0xF) ^ 8).astype(xl.dtype)
    hi8 = ((b >> 4) ^ 8).astype(xh.dtype)
    p = jnp.dot(xl, lo8, preferred_element_type=jnp.float32) + jnp.dot(
        xh, hi8, preferred_element_type=jnp.float32
    )
    return p * s[0]


def make_gather(mathfn, n_groups, gs2):
    def kernel(ids_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        acc = mathfn(xl_ref[:], xh_ref[:], w_ref[0], s_ref[0], n_groups, gs2)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
        o_ref[:] += jnp.where(row_ids == r, acc, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("mathname",))
def gathered(x_rows, qt, ids, mathname):
    mathfn = globals()[f"math_{mathname}"]
    r, kdim = x_rows.shape
    e = qt.data.shape[0]
    n = qt.out_features
    gs = qt.group_size or kdim
    gs2 = gs // 2
    k2 = kdim // 2
    n_groups = kdim // gs
    bn = min(n, 512)
    r8 = max(8, ((r + 7) // 8) * 8)
    xl, xh = split_x_for_int4(x_rows, kdim, qt.group_size)
    scales = qt.scales.reshape(e, n_groups, n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(n, bn), r),
        in_specs=[
            pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
            pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
            pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
            pl.BlockSpec((1, n_groups, bn), lambda j, i, ids: (ids[i], 0, j)),
        ],
        out_specs=pl.BlockSpec((r8, bn), lambda j, i, ids: (0, j)),
    )
    return pl.pallas_call(
        make_gather(mathfn, n_groups, gs2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r8, n), jnp.float32),
    )(ids, xl, xh, qt.data, scales)


def main():
    rng = np.random.default_rng(0)
    E, K, N, R = 64, 2048, 2816, 8
    w = jnp.asarray(rng.standard_normal((E, K, N)).astype(np.float32) * 0.05)
    ids = jnp.asarray(np.arange(R) % E, jnp.int32)
    INNER = 40
    from ktransformers_tpu.quant.formats import dequantize

    for kind, gsz in (("int4_g", 128), ("int4", 0)):
        qt = quantize(w, kind, group_size=gsz or 128)
        nbytes = R * qt.data[0].size
        x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
        wd = dequantize(qt, jnp.float32)[np.asarray(ids)]
        ref = jnp.einsum("rk,rkn->rn", x.astype(jnp.float32), wd)
        for name in sys.argv[1:] or ("v1", "v2", "v3", "v4"):
            try:
                y = gathered(x, qt, ids, name)
                err = float(
                    jnp.abs(y.astype(jnp.float32) - ref).max()
                    / jnp.abs(ref).max()
                )

                @jax.jit
                def chain(x, qt, ids, name=name):
                    def body(i, x):
                        y = gathered(x, qt, ids, name)
                        return (y[:, :K] * 1e-6).astype(x.dtype) + x

                    return jax.lax.fori_loop(0, INNER, body, x)

                y = chain(x, qt, ids)
                jax.block_until_ready(y)
                t0 = time.perf_counter()
                for _ in range(5):
                    y = chain(y, qt, ids)
                jax.block_until_ready(y)
                dt = (time.perf_counter() - t0) / (5 * INNER)
                print(
                    f"{kind:8s} {name}: {dt*1e6:8.1f} us "
                    f"{nbytes/dt/1e9:7.1f} GB/s  rel_err {err:.1e}",
                    flush=True,
                )
            except Exception as ex:
                print(f"{kind:8s} {name}: FAILED {type(ex).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
