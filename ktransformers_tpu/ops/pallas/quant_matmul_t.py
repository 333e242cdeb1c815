"""Transposed fused dequant-matmuls: dx = dy @ W^T with W still packed.

The backward-pass companions of ops/pallas/quant_matmul.py for LoRA SFT
(the quantized base weights are FROZEN, so only input gradients are
needed): contraction runs over the N axis of the packed [K, N] weight via
NT dots, dequantizing blocks in VMEM exactly like the forward kernels.
This is the TPU analog of the reference's hand-written fused MoE backward
(kt-kernel/operators/amx/sft_moe.hpp:355 backward_down_proj /
moe-sft-tp.hpp:144) — there it exists because autodiff cannot see AMX
kernels; here because pallas_call has no autodiff rule.

int4 kinds: the group-split packing means packed row r of group g holds
the LOW nibble for activation column (g*gs + r') and the HIGH nibble for
(g*gs + gs/2 + r'); the kernels produce the two half-gradients [M, K/2]
and ops/pallas/vjp.py merges them back to activation order (the inverse
of quant/formats.split_x_for_int4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ktransformers_tpu.ops.pallas.quant_matmul import (
    INT4_KINDS,
    _e2m1_vals,
    _pick_bn,
    _unpack_nibbles,
)
from ktransformers_tpu.quant.formats import QTensor


def _pad_n(n: int, bn: int, *arrays):
    """Zero-pad each array's LAST axis from n to the next multiple of bn.

    In the transposed kernels N is the CONTRACTION axis, so a partial
    last n-block would read out-of-bounds garbage that contaminates every
    output element (r5: the fused-QKV N=3648 has no 128-multiple divisor;
    uninitialized tail floats carried NaNs and the whole SFT backward
    NaN'd — the forward kernels only leak garbage into discarded output
    columns, which is why this went unnoticed). Explicit zeros are exact:
    0-valued dy/scales annihilate whatever the padded codes decode to."""
    npad = -(-n // bn) * bn
    if npad == n:
        return arrays
    return tuple(
        jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, npad - n)])
        for a in arrays
    )


def _mx_scale_exp(s_u8, n_groups, rows_per_group, k_rows, bn):
    """ue8m0 exponents [>=ng, bn] -> f32 scales expanded to [k_rows, bn]."""
    s = jnp.exp2(
        s_u8[:n_groups].astype(jnp.int32).astype(jnp.float32) - 127.0
    )
    return jnp.broadcast_to(
        s[:, None, :], (n_groups, rows_per_group, bn)
    ).reshape(k_rows, bn)


def _int8_t_kernel(dy_ref, w_ref, s_ref, o_ref, *, n_s):
    """dx_blk [bm, k] += (dy_blk [bm, bn] * s[bn]) @ w_blk[k, bn]^T."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    dy = dy_ref[:].astype(jnp.float32) * s_ref[:].astype(jnp.float32)
    o_ref[:] += jax.lax.dot_general(
        dy.astype(jnp.bfloat16),
        w_ref[:].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _int4_t_kernel(dy_ref, w_ref, s_ref, *rest, n_groups, gs2, has_zeros,
                   offset_lo, n_s):
    """Half-gradients: (dxl, dxh) [bm, k2] += dy_deq-dots against the
    unpacked lo/hi planes of the packed block [k2, bn]."""
    z_ref = rest[0] if has_zeros else None
    ol_ref, oh_ref = rest[-2], rest[-1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ol_ref[:] = jnp.zeros_like(ol_ref)
        oh_ref[:] = jnp.zeros_like(oh_ref)

    k2, bn = w_ref.shape
    lo, hi = _unpack_nibbles(w_ref[:], offset_lo)
    s = s_ref[:n_groups].astype(jnp.float32)  # [ng, bn]
    s_exp = jnp.broadcast_to(
        s[:, None, :], (n_groups, gs2, bn)
    ).reshape(k2, bn)
    lo = lo.astype(jnp.float32)
    hi = hi.astype(jnp.float32)
    if has_zeros:
        z = z_ref[:n_groups].astype(jnp.float32)
        z_exp = jnp.broadcast_to(
            z[:, None, :], (n_groups, gs2, bn)
        ).reshape(k2, bn)
        lo = lo - z_exp
        hi = hi - z_exp
    wl = (lo * s_exp).astype(jnp.bfloat16)
    wh = (hi * s_exp).astype(jnp.bfloat16)
    dy = dy_ref[:].astype(jnp.bfloat16)
    ol_ref[:] += jax.lax.dot_general(
        dy, wl, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    oh_ref[:] += jax.lax.dot_general(
        dy, wh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mx4_t_kernel(dy_ref, w_ref, s_ref, ol_ref, oh_ref, *, n_groups, gs2,
                  n_s):
    """Transposed mxfp4: e2m1 nibbles + ue8m0 group scales decoded in the
    block, NT dots produce the two half-gradients (reference role:
    kt-kernel/operators/amx/fp4-moe.hpp backward; closes vjp.py's MX
    XLA-dequant fallback — VERDICT r3 item 8)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ol_ref[:] = jnp.zeros_like(ol_ref)
        oh_ref[:] = jnp.zeros_like(oh_ref)

    k2, bn = w_ref.shape[-2:]
    b = (w_ref[:] if w_ref.ndim == 2 else w_ref[0]).astype(jnp.int32)
    lo = _e2m1_vals(b & 0xF)
    hi = _e2m1_vals((b >> 4) & 0xF)
    s = s_ref[:] if s_ref.ndim == 2 else s_ref[0]
    s_exp = _mx_scale_exp(s, n_groups, gs2, k2, bn)
    wl = (lo * s_exp).astype(jnp.bfloat16)
    wh = (hi * s_exp).astype(jnp.bfloat16)
    dy = dy_ref[:].astype(jnp.bfloat16)
    ol_ref[:] += jax.lax.dot_general(
        dy, wl, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    oh_ref[:] += jax.lax.dot_general(
        dy, wh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mx8_t_kernel(dy_ref, w_ref, s_ref, o_ref, *, n_groups, gs, n_s):
    """Transposed mxfp8 (e4m3 bytes + ue8m0 group scales)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    k, bn = w_ref.shape[-2:]
    wb = w_ref[:] if w_ref.ndim == 2 else w_ref[0]
    s = s_ref[:] if s_ref.ndim == 2 else s_ref[0]
    s_exp = _mx_scale_exp(s, n_groups, gs, k, bn)
    wd = (wb.astype(jnp.float32) * s_exp).astype(jnp.bfloat16)
    dy = dy_ref[:].astype(jnp.bfloat16)
    o_ref[:] += jax.lax.dot_general(
        dy, wd, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_matmul_t(dy: jnp.ndarray, w: QTensor, interpret: bool = False):
    """dx = dy [..., N] @ W^T for a packed [K, N] QTensor; returns
    [..., K] f32 (int4 kinds: the two [., K/2] halves are merged by the
    caller — see merge_int4_halves)."""
    *lead, n = dy.shape
    m = 1
    for d in lead:
        m *= d
    dy2 = dy.reshape(m, n)

    kdim_full = w.in_features
    # m tile bounded by the f32 dx accumulator block (bm x K) in VMEM
    bm = min(max(8, ((m + 7) // 8) * 8), 512)
    while bm > 8 and bm * kdim_full * 4 > 6 * 1024 * 1024:
        bm //= 2
    m8 = ((m + bm - 1) // bm) * bm
    if m8 != m:
        dy2 = jnp.pad(dy2, ((0, m8 - m), (0, 0)))
    m_tiles = m8 // bm

    if w.kind in ("int8", "fp8"):
        kdim = w.data.shape[-2]
        bn = _pick_bn(n, kdim)
        dy2p, wd, ws = _pad_n(n, bn, dy2, w.data, w.scales)
        np_ = dy2p.shape[-1]
        grid = (m_tiles, np_ // bn)
        dx = pl.pallas_call(
            functools.partial(_int8_t_kernel, n_s=grid[1]),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
                pl.BlockSpec((kdim, bn), lambda i, j: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, kdim), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m8, kdim), jnp.float32),
            interpret=interpret,
        )(dy2p, wd, ws)
        return dx[:m].reshape(*lead, kdim)

    if w.kind in INT4_KINDS:
        k2 = w.data.shape[-2]
        kdim = 2 * k2
        gs = w.group_size or kdim
        gs2 = gs // 2
        ng = kdim // gs
        bn = _pick_bn(n, k2)
        scales = w.scales.reshape(-1, n)
        ngp = scales.shape[0]
        has_zeros = w.zeros is not None
        ins = [dy2, w.data, scales]
        in_specs = [
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            pl.BlockSpec((k2, bn), lambda i, j: (0, j)),
            pl.BlockSpec((ngp, bn), lambda i, j: (0, j)),
        ]
        if has_zeros:
            ins.append(w.zeros.reshape(-1, n))
            in_specs.append(pl.BlockSpec((ngp, bn), lambda i, j: (0, j)))
        ins = list(_pad_n(n, bn, *ins))  # dy2, data, scales(, zeros)
        grid = (m_tiles, ins[0].shape[-1] // bn)
        dxl, dxh = pl.pallas_call(
            functools.partial(
                _int4_t_kernel, n_groups=ng, gs2=gs2, has_zeros=has_zeros,
                offset_lo=w.act_quant, n_s=grid[1],
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bm, k2), lambda i, j: (i, 0)),
                pl.BlockSpec((bm, k2), lambda i, j: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((m8, k2), jnp.float32),
                jax.ShapeDtypeStruct((m8, k2), jnp.float32),
            ],
            interpret=interpret,
        )(*ins)
        dx = merge_int4_halves(dxl[:m], dxh[:m], kdim, w.group_size)
        return dx.reshape(*lead, kdim)

    if w.kind == "mxfp4":
        k2 = w.data.shape[-2]
        kdim = 2 * k2
        gs = w.group_size
        ng = kdim // gs
        bn = _pick_bn(n, k2 * 13)
        scales = w.scales.reshape(-1, n)
        dy2, wdat, scales = _pad_n(n, bn, dy2, w.data, scales)
        grid = (m_tiles, dy2.shape[-1] // bn)
        dxl, dxh = pl.pallas_call(
            functools.partial(
                _mx4_t_kernel, n_groups=ng, gs2=gs // 2, n_s=grid[1]
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
                pl.BlockSpec((k2, bn), lambda i, j: (0, j)),
                pl.BlockSpec((scales.shape[0], bn), lambda i, j: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((bm, k2), lambda i, j: (i, 0)),
                pl.BlockSpec((bm, k2), lambda i, j: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((m8, k2), jnp.float32),
                jax.ShapeDtypeStruct((m8, k2), jnp.float32),
            ],
            interpret=interpret,
        )(dy2, wdat, scales)
        dx = merge_int4_halves(dxl[:m], dxh[:m], kdim, gs)
        return dx.reshape(*lead, kdim)

    if w.kind == "mxfp8":
        kdim = w.data.shape[-2]
        gs = w.group_size
        ng = kdim // gs
        bn = _pick_bn(n, kdim * 9)
        scales = w.scales.reshape(-1, n)
        dy2, wdat, scales = _pad_n(n, bn, dy2, w.data, scales)
        grid = (m_tiles, dy2.shape[-1] // bn)
        dx = pl.pallas_call(
            functools.partial(
                _mx8_t_kernel, n_groups=ng, gs=gs, n_s=grid[1]
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
                pl.BlockSpec((kdim, bn), lambda i, j: (0, j)),
                pl.BlockSpec((scales.shape[0], bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, kdim), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m8, kdim), jnp.float32),
            interpret=interpret,
        )(dy2, wdat, scales)
        return dx[:m].reshape(*lead, kdim)

    raise ValueError(f"quant_matmul_t: unsupported kind {w.kind}")


def merge_int4_halves(dxl, dxh, k: int, group_size: int):
    """Inverse of quant/formats.split_x_for_int4 for gradients: interleave
    the low/high half-gradients back to activation column order."""
    *lead, k2 = dxl.shape
    gs = group_size or k
    gs2 = gs // 2
    ng = k // gs
    dl = dxl.reshape(*lead, ng, gs2)
    dh = dxh.reshape(*lead, ng, gs2)
    return jnp.concatenate([dl, dh], axis=-1).reshape(*lead, k)


def _grouped_t_kernel(tg_ref, dy_ref, w_ref, s_ref, *rest, n_groups, gs2,
                      has_zeros, offset_lo, n_s):
    z_ref = rest[0] if has_zeros else None
    ol_ref, oh_ref = rest[-2], rest[-1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ol_ref[:] = jnp.zeros_like(ol_ref)
        oh_ref[:] = jnp.zeros_like(oh_ref)

    k2, bn = w_ref.shape[-2:]
    lo, hi = _unpack_nibbles(w_ref[0], offset_lo)
    s = s_ref[0][:n_groups].astype(jnp.float32)
    s_exp = jnp.broadcast_to(
        s[:, None, :], (n_groups, gs2, bn)
    ).reshape(k2, bn)
    lo = lo.astype(jnp.float32)
    hi = hi.astype(jnp.float32)
    if has_zeros:
        z = z_ref[0][:n_groups].astype(jnp.float32)
        z_exp = jnp.broadcast_to(
            z[:, None, :], (n_groups, gs2, bn)
        ).reshape(k2, bn)
        lo = lo - z_exp
        hi = hi - z_exp
    wl = (lo * s_exp).astype(jnp.bfloat16)
    wh = (hi * s_exp).astype(jnp.bfloat16)
    dy = dy_ref[:].astype(jnp.bfloat16)
    ol_ref[:] += jax.lax.dot_general(
        dy, wl, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    oh_ref[:] += jax.lax.dot_general(
        dy, wh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _grouped_mx4_t_kernel(tg_ref, dy_ref, w_ref, s_ref, ol_ref, oh_ref,
                          **kw):
    _mx4_t_kernel(dy_ref, w_ref, s_ref, ol_ref, oh_ref, **kw)


def _grouped_mx8_t_kernel(tg_ref, dy_ref, w_ref, s_ref, o_ref, **kw):
    _mx8_t_kernel(dy_ref, w_ref, s_ref, o_ref, **kw)


def _grouped_int8_t_kernel(tg_ref, dy_ref, w_ref, s_ref, o_ref, *, n_s):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    dy = dy_ref[:].astype(jnp.float32) * s_ref[0].astype(jnp.float32)
    o_ref[:] += jax.lax.dot_general(
        dy.astype(jnp.bfloat16),
        w_ref[0].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def grouped_quant_matmul_t(
    dy_tiles: jnp.ndarray,     # [Mpad, N] tile-sorted upstream grads
    w: QTensor,                # [E, K(packed), N]
    tile_group: jnp.ndarray,   # [Mpad / bm] int32 expert per tile
    bm: int = 64,
    interpret: bool = False,
):
    """Grouped transposed matmul for the MoE backward: tile t's rows get
    dy @ w[tile_group[t]]^T. The caller supplies the SAME tile layout the
    forward grouped_quant_matmul used. Returns [Mpad, K] f32."""
    mpad, n = dy_tiles.shape
    e = w.data.shape[0]
    mtiles = mpad // bm

    if w.kind in ("int8", "fp8"):
        kdim = w.data.shape[-2]
        bn = _pick_bn(n, kdim)
        dyp, wd, ws = _pad_n(n, bn, dy_tiles, w.data, w.scales)
        nb = dyp.shape[-1] // bn
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mtiles, nb),
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j, tg: (i, j)),
                pl.BlockSpec((1, kdim, bn), lambda i, j, tg: (tg[i], 0, j)),
                pl.BlockSpec((1, 1, bn), lambda i, j, tg: (tg[i], 0, j)),
            ],
            out_specs=pl.BlockSpec((bm, kdim), lambda i, j, tg: (i, 0)),
        )
        dx = pl.pallas_call(
            functools.partial(_grouped_int8_t_kernel, n_s=nb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mpad, kdim), jnp.float32),
            interpret=interpret,
        )(tile_group, dyp, wd, ws)
        return dx

    if w.kind in INT4_KINDS:
        k2 = w.data.shape[-2]
        kdim = 2 * k2
        gs = w.group_size or kdim
        gs2 = gs // 2
        ng = kdim // gs
        bn = _pick_bn(n, k2)
        scales = w.scales.reshape(e, -1, n)
        ngp = scales.shape[1]
        has_zeros = w.zeros is not None
        ins = [tile_group, dy_tiles, w.data, scales]
        in_specs = [
            pl.BlockSpec((bm, bn), lambda i, j, tg: (i, j)),
            pl.BlockSpec((1, k2, bn), lambda i, j, tg: (tg[i], 0, j)),
            pl.BlockSpec((1, ngp, bn), lambda i, j, tg: (tg[i], 0, j)),
        ]
        if has_zeros:
            ins.append(w.zeros.reshape(e, -1, n))
            in_specs.append(
                pl.BlockSpec((1, ngp, bn), lambda i, j, tg: (tg[i], 0, j))
            )
        ins = [ins[0]] + list(_pad_n(n, bn, *ins[1:]))
        nb = ins[1].shape[-1] // bn
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mtiles, nb),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bm, k2), lambda i, j, tg: (i, 0)),
                pl.BlockSpec((bm, k2), lambda i, j, tg: (i, 0)),
            ],
        )
        dxl, dxh = pl.pallas_call(
            functools.partial(
                _grouped_t_kernel, n_groups=ng, gs2=gs2,
                has_zeros=has_zeros, offset_lo=w.act_quant,
                n_s=nb,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((mpad, k2), jnp.float32),
                jax.ShapeDtypeStruct((mpad, k2), jnp.float32),
            ],
            interpret=interpret,
        )(*ins)
        return merge_int4_halves(dxl, dxh, kdim, w.group_size)

    if w.kind == "mxfp4":
        k2 = w.data.shape[-2]
        kdim = 2 * k2
        gs = w.group_size
        ng = kdim // gs
        bn = _pick_bn(n, k2 * 13)
        scales = w.scales.reshape(e, -1, n)
        dy_t, wdat, scales = _pad_n(n, bn, dy_tiles, w.data, scales)
        nb = dy_t.shape[-1] // bn
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mtiles, nb),
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j, tg: (i, j)),
                pl.BlockSpec((1, k2, bn), lambda i, j, tg: (tg[i], 0, j)),
                pl.BlockSpec(
                    (1, scales.shape[1], bn), lambda i, j, tg: (tg[i], 0, j)
                ),
            ],
            out_specs=[
                pl.BlockSpec((bm, k2), lambda i, j, tg: (i, 0)),
                pl.BlockSpec((bm, k2), lambda i, j, tg: (i, 0)),
            ],
        )
        dxl, dxh = pl.pallas_call(
            functools.partial(
                _grouped_mx4_t_kernel, n_groups=ng, gs2=gs // 2,
                n_s=nb,
            ),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((mpad, k2), jnp.float32),
                jax.ShapeDtypeStruct((mpad, k2), jnp.float32),
            ],
            interpret=interpret,
        )(tile_group, dy_t, wdat, scales)
        return merge_int4_halves(dxl, dxh, kdim, gs)

    if w.kind == "mxfp8":
        kdim = w.data.shape[-2]
        gs = w.group_size
        ng = kdim // gs
        bn = _pick_bn(n, kdim * 9)
        scales = w.scales.reshape(e, -1, n)
        dy_t, wdat, scales = _pad_n(n, bn, dy_tiles, w.data, scales)
        nb = dy_t.shape[-1] // bn
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mtiles, nb),
            in_specs=[
                pl.BlockSpec((bm, bn), lambda i, j, tg: (i, j)),
                pl.BlockSpec((1, kdim, bn), lambda i, j, tg: (tg[i], 0, j)),
                pl.BlockSpec(
                    (1, scales.shape[1], bn), lambda i, j, tg: (tg[i], 0, j)
                ),
            ],
            out_specs=pl.BlockSpec((bm, kdim), lambda i, j, tg: (i, 0)),
        )
        dx = pl.pallas_call(
            functools.partial(
                _grouped_mx8_t_kernel, n_groups=ng, gs=gs,
                n_s=nb,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mpad, kdim), jnp.float32),
            interpret=interpret,
        )(tile_group, dy_t, wdat, scales)
        return dx

    raise ValueError(f"grouped_quant_matmul_t: unsupported kind {w.kind}")
