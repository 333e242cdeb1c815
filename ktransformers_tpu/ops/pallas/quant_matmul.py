"""Pallas fused dequant-matmul kernels: weights stay quantized in HBM and are
expanded only inside VMEM tiles feeding the MXU.

These are the TPU re-design of the reference's AMX dequant+GEMM kernels
(kt-kernel/operators/amx/la/amx_kernels.hpp: BufferA/B tile layouts with
fused `apply_scale` at C-store) and of the CUDA Marlin W4A16 GEMM
(kt-kernel/cuda/gptq_marlin). The XLA fallback paths in ops/linear.py
materialize dequantized operands in HBM; these kernels do not — HBM traffic
is exactly the packed bytes + activations, which is what makes quantized
decode bandwidth-optimal.

int4 weights use the group-split nibble packing (quant/formats.py
pack_int4): a K-block covering whole scale groups unpacks into the low-half
rows (low nibbles) and high-half rows (high nibbles) of each group, so the
kernel computes y += s_g * (x_lo_g @ q_lo_g + x_hi_g @ q_hi_g) with no
shuffles — two MXU dots per group.

Tiling: K is NOT tiled — at LLM sizes a full-K x tile-N weight block is
0.3-2 MB of VMEM (hidden 2048-7168 → packed K/2 rows x 512 lanes), well
under the ~16 MB budget, and a single K block avoids both accumulation
grids and boundary-padding hazards. The grid tiles (M, N) only.

Kernels:
- quant_matmul(x, w):     dense linear (int8 / fp8 / int4 / int4_g / int4_gz)
- gathered_quant_matmul:  decode MoE — expert index per row via scalar
                          prefetch; only routed experts' bytes are read
                          (analog of moe_base.hpp forward_decode)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ktransformers_tpu.quant.formats import QTensor, split_x_for_int4

INT4_KINDS = ("int4", "int4_g", "int4_gz")

MAX_W_BLOCK_BYTES = 4 * 1024 * 1024

# dense act_quant int4: W4A8 kernel below this M, bf16-dequant above.
# DEFAULT: all M through W4A8. Isolated-kernel timings said bf16-dequant
# wins at M>=128 (kernel_lab8: 0.11 vs 1.79 ms at 2048x21888), but the
# e2e 512-token prefill measured the OPPOSITE (scripts/prefill_bisect.py:
# all-w4a8 95.9 ms vs M-routed 159.3 ms) — in-program the w4a8 kernels
# overlap with neighbors better. Trust the e2e number.
W4A8_DENSE_MAX_M = int(
    __import__("os").environ.get("KT_W4A8_DENSE_MAX_M", str(1 << 30))
)

# grouped (prefill-MoE) act_quant kernel: "w4a8" (int8 MXU dots) or
# "bf16" (bf16-dequant with the fast offset-lo decode)
_GROUPED_IMPL = __import__("os").environ.get("KT_GROUPED_IMPL", "w4a8")


def _unpack_nibbles(b, offset_lo=False):
    """uint8 [R, N] -> (lo, hi) sign-extended int32 in [-8, 7].

    offset_lo: data is in the w4a8 offset-lo encoding (quant/w4a8.py,
    byte ^ 0x08), where the low nibble stores lo_signed + 8."""
    bi = b.astype(jnp.int32)
    if offset_lo:
        lo = (bi & 0xF) - 8
    else:
        lo = ((bi & 0xF) ^ 8) - 8
    hi = (((bi >> 4) & 0xF) ^ 8) - 8
    return lo, hi


def _pick_bn(n, k_bytes_per_lane):
    bn = 512
    while bn > 128 and bn * k_bytes_per_lane > MAX_W_BLOCK_BYTES:
        bn //= 2
    return min(n, bn)


# v5e scoped-vmem stack limit is 16 MB; stay safely under it including
# double buffering (big-model shapes like K=8192 busted the old fixed
# bm=512: 512*8192*bf16 x-blocks alone are 8.4 MB each).
_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_bm(m, kdim, bn, w_bytes_per_k):
    bm = min(m, 512)
    while bm > 64:
        need = (
            2 * bm * kdim * 2        # x block(s), double-buffered, bf16
            + 2 * bn * w_bytes_per_k * kdim  # w block, double-buffered
            + bm * bn * 4            # f32 out block
        )
        if need <= _VMEM_BUDGET:
            break
        bm = max(8, (bm // 2 // 8) * 8)  # sublane-aligned halving
    return bm


def _expand_group_rows(v, n_groups, gs2, k2, bn):
    """[n_groups, bn] -> [k2, bn], each row repeated gs2 times (sublane-merge
    reshape — a free view on the (8,128)-tiled layout)."""
    return jnp.broadcast_to(v[:, None, :], (n_groups, gs2, bn)).reshape(k2, bn)


def _int4_matblock(xl, xh, w_blk, s_ref, z_ref, n_groups, gs2, has_zeros, s_idx,
                   offset_lo=False):
    """Shared math: full-K packed block [K/2, bn] x activations [M, K/2].

    Unpacks the whole block once and folds scales (and zero-points) into the
    dequantized weights, so the MXU sees two full-K-contraction dots instead
    of n_groups narrow ones."""
    k2, bn = w_blk.shape
    # NEGATIVE RESULT (r4, do not redo): an int8-lane "fast decode"
    # (hi = braw >> 4 arithmetic, lo = (braw & 15) - 8, skipping the i32
    # widening) fails Mosaic lowering on the real chip — 'arith.shrsi' on
    # vector<...xi8> has no TPU legalization (interpret mode does NOT
    # catch it). Keep the i32 path.
    lo, hi = _unpack_nibbles(w_blk[:], offset_lo)
    lo = lo.astype(jnp.float32)
    hi = hi.astype(jnp.float32)
    s = s_ref[s_idx] if s_idx else s_ref[:]
    s = s[:n_groups]  # scale blocks may be sublane-padded past the true ng
    s_exp = _expand_group_rows(s, n_groups, gs2, k2, bn)
    if has_zeros:
        z = z_ref[s_idx] if s_idx else z_ref[:]
        z = z[:n_groups]
        z_exp = _expand_group_rows(z, n_groups, gs2, k2, bn)
        lo = lo - z_exp
        hi = hi - z_exp
    wl = (lo * s_exp).astype(xl.dtype)
    wh = (hi * s_exp).astype(xh.dtype)
    return jnp.dot(xl, wl, preferred_element_type=jnp.float32) + jnp.dot(
        xh, wh, preferred_element_type=jnp.float32
    )


# --- OCP MX formats (mxfp4 e2m1 nibbles / mxfp8 e4m3) with ue8m0 group-32
# power-of-two scales, decoded INSIDE the matmul block (reference:
# kt-kernel/operators/amx/fp4-moe.hpp, mxfp8-moe.hpp — DeepSeek-V4-Flash
# routed experts are MXFP4). The XLA fallback dequantizes to bf16 in HBM
# first, paying ~4.5x the weight bytes; these keep HBM traffic = packed
# bytes + tiny exponent planes.


def _e2m1_vals(c):
    """Arithmetic e2m1 decode of int32 codes [0, 15] -> f32 values (no
    table gathers and no transcendentals — pure VPU selects): code =
    [s e1 e0 m], mag = e == 0 ? 0.5 m : 2^(e-1) (1 + 0.5 m)."""
    m = (c & 1).astype(jnp.float32)
    e = (c >> 1) & 3
    sign = 1.0 - 2.0 * (c >> 3).astype(jnp.float32)
    base = jnp.where(e == 1, 1.0, jnp.where(e == 2, 2.0, 4.0))
    mag = jnp.where(e == 0, 0.5 * m, base * (1.0 + 0.5 * m))
    return sign * mag


def _mx_scale_rows(s_u8, n_groups, gs_rows, k_rows, bn):
    """ue8m0 exponents [>=ng, bn] -> f32 scales expanded to [k_rows, bn].
    uint8 -> int32 -> f32 (Mosaic has no direct uint8 -> f32 cast)."""
    s = jnp.exp2(
        s_u8[:n_groups].astype(jnp.int32).astype(jnp.float32) - 127.0
    )
    return _expand_group_rows(s, n_groups, gs_rows, k_rows, bn)


def _mx4_matblock(xl, xh, w_blk, s_ref, n_groups, gs2, s_idx):
    k2, bn = w_blk.shape
    b = w_blk[:].astype(jnp.int32)
    lo = _e2m1_vals(b & 0xF)
    hi = _e2m1_vals((b >> 4) & 0xF)
    s = s_ref[s_idx] if s_idx else s_ref[:]
    s_exp = _mx_scale_rows(s, n_groups, gs2, k2, bn)
    wl = (lo * s_exp).astype(xl.dtype)
    wh = (hi * s_exp).astype(xh.dtype)
    return jnp.dot(xl, wl, preferred_element_type=jnp.float32) + jnp.dot(
        xh, wh, preferred_element_type=jnp.float32
    )


def _mx4_kernel(xl_ref, xh_ref, w_ref, s_ref, o_ref, *, n_groups, gs2):
    o_ref[:] = _mx4_matblock(
        xl_ref[:], xh_ref[:], w_ref, s_ref, n_groups, gs2, s_idx=()
    )


def _mx8_matblock(x, w_blk, s_ref, n_groups, gs, s_idx):
    k, bn = w_blk.shape
    s = s_ref[s_idx] if s_idx else s_ref[:]
    s_exp = _mx_scale_rows(s, n_groups, gs, k, bn)
    wd = (w_blk[:].astype(jnp.float32) * s_exp).astype(x.dtype)
    return jnp.dot(x, wd, preferred_element_type=jnp.float32)


def _mx8_kernel(x_ref, w_ref, s_ref, o_ref, *, n_groups, gs):
    o_ref[:] = _mx8_matblock(x_ref[:], w_ref, s_ref, n_groups, gs, s_idx=())


# ---------------------------------------------------------------------------
# dense: x [M, K] @ w [K, N]
# ---------------------------------------------------------------------------


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    y = jnp.dot(
        x_ref[:],
        w_ref[:].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = y * s_ref[:]


def _int4_kernel(xl_ref, xh_ref, w_ref, s_ref, *rest, n_groups, gs2,
                 has_zeros, offset_lo=False):
    z_ref = rest[0] if has_zeros else None
    o_ref = rest[-1]
    o_ref[:] = _int4_matblock(
        xl_ref[:], xh_ref[:], w_ref, s_ref, z_ref, n_groups, gs2, has_zeros,
        s_idx=(), offset_lo=offset_lo,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_matmul(x: jnp.ndarray, w: QTensor, interpret: bool = False):
    """x [..., K] @ w(QTensor [K, N]) -> [..., N] with fused dequant."""
    *lead, kdim = x.shape
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, kdim)
    n = w.out_features
    out_dtype = x.dtype

    if w.kind in INT4_KINDS and w.act_quant:
        # M-dependent kernel choice (measured r4, scripts/kernel_lab8.py):
        # decode M -> W4A8 (bandwidth-bound; ~1 VPU op/byte, int8-MXU
        # streams at ~630 GB/s); prefill M -> bf16-dequant (the W4A8
        # per-group f32 epilogue scales with M*ng*bn and lands ~16x slower
        # at M=512: 1.79 vs 0.11 ms at [2048x21888]). The bf16 kernel's
        # [K/2, bn] f32 unpack temps bust scoped VMEM at big K (K=10944
        # measured r3), so large-K stays W4A8 at any M.
        from ktransformers_tpu.ops.pallas.w4a8_matmul import dense_w4a8_matmul

        if m <= W4A8_DENSE_MAX_M or kdim // 2 * 13 * 128 > MAX_W_BLOCK_BYTES:
            y = dense_w4a8_matmul(x2, w, interpret=interpret)
            return y.reshape(*lead, n)
        # fall through: the INT4_KINDS bf16-dequant branch below is
        # offset-lo aware (offset_lo=w.act_quant)

    if w.kind in ("int8", "fp8"):
        # account the in-kernel [kdim, bn] convert temps (int8->bf16 ~4
        # B/byte; fp8->bf16 via f32 ~7): unaccounted they bust the 16 MB
        # scoped-VMEM stack at prefill M (r4: fp8 K=2816 M=512 hit 23.8M)
        tb = 7 if w.kind == "fp8" else 4
        bn = _pick_bn(n, kdim * tb)
        bm = _pick_bm(m, kdim, bn, tb)
        grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
        y = pl.pallas_call(
            _int8_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, kdim), lambda i, j: (i, 0)),
                pl.BlockSpec((kdim, bn), lambda i, j: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            interpret=interpret,
        )(x2, w.data, w.scales)
        return y.astype(out_dtype).reshape(*lead, n)

    if w.kind in INT4_KINDS:
        gs = w.group_size or kdim
        gs2 = gs // 2
        k2 = kdim // 2
        n_groups = kdim // gs
        # the VPU dequant materializes lo/hi/s_exp f32 temps [k2, bn]
        # (~12 B/packed byte): account for them or big-K shapes bust the
        # 16 MB scoped-VMEM stack (measured at K=10944)
        bn = _pick_bn(n, k2 * 13)
        bm = _pick_bm(m, kdim, bn, 0.5)
        grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
        xl, xh = split_x_for_int4(x2, kdim, w.group_size)
        scales = w.scales.reshape(-1, n)  # ng rows, possibly sublane-padded
        ngp = scales.shape[0]
        has_zeros = w.zeros is not None
        ins = [xl, xh, w.data, scales]
        in_specs = [
            pl.BlockSpec((bm, k2), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, k2), lambda i, j: (i, 0)),
            pl.BlockSpec((k2, bn), lambda i, j: (0, j)),
            pl.BlockSpec((ngp, bn), lambda i, j: (0, j)),
        ]
        if has_zeros:
            ins.append(w.zeros.reshape(-1, n))
            in_specs.append(pl.BlockSpec((ngp, bn), lambda i, j: (0, j)))
        y = pl.pallas_call(
            functools.partial(
                _int4_kernel,
                n_groups=n_groups,
                gs2=gs2,
                has_zeros=has_zeros,
                offset_lo=w.act_quant,
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            interpret=interpret,
        )(*ins)
        return y.astype(out_dtype).reshape(*lead, n)

    if w.kind == "mxfp4":
        gs = w.group_size
        gs2 = gs // 2
        k2 = kdim // 2
        n_groups = kdim // gs
        bn = _pick_bn(n, k2 * 13)  # e2m1 decode temps, as the int4 branch
        bm = _pick_bm(m, kdim, bn, 0.5)
        grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
        xl, xh = split_x_for_int4(x2, kdim, gs)
        scales = w.scales.reshape(-1, n)
        ngp = scales.shape[0]
        y = pl.pallas_call(
            functools.partial(_mx4_kernel, n_groups=n_groups, gs2=gs2),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k2), lambda i, j: (i, 0)),
                pl.BlockSpec((bm, k2), lambda i, j: (i, 0)),
                pl.BlockSpec((k2, bn), lambda i, j: (0, j)),
                pl.BlockSpec((ngp, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            interpret=interpret,
        )(xl, xh, w.data, scales)
        return y.astype(out_dtype).reshape(*lead, n)

    if w.kind == "mxfp8":
        gs = w.group_size
        n_groups = kdim // gs
        bn = _pick_bn(n, kdim * 9)  # f32 dequant temps
        bm = _pick_bm(m, kdim, bn, 1)
        grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
        scales = w.scales.reshape(-1, n)
        ngp = scales.shape[0]
        y = pl.pallas_call(
            functools.partial(_mx8_kernel, n_groups=n_groups, gs=gs),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, kdim), lambda i, j: (i, 0)),
                pl.BlockSpec((kdim, bn), lambda i, j: (0, j)),
                pl.BlockSpec((ngp, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            interpret=interpret,
        )(x2, w.data, scales)
        return y.astype(out_dtype).reshape(*lead, n)

    raise ValueError(f"quant_matmul: unsupported kind {w.kind}")


# ---------------------------------------------------------------------------
# gathered (decode MoE): per-row expert index via scalar prefetch
# ---------------------------------------------------------------------------


def _gather_int4_kernel(
    ids_ref, xl_ref, xh_ref, w_ref, s_ref, *rest, n_groups, gs2, has_zeros,
    offset_lo=False
):
    z_ref = rest[0] if has_zeros else None
    o_ref = rest[-1]
    """Grid (n_tiles, R): program (j, r) computes ALL rows against expert
    ids[r]'s block (the MXU pads to >=8 rows anyway) and accumulates only
    row r via a mask — keeps every block's sublane dim full-size, which
    mosaic requires."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = _int4_matblock(
        xl_ref[:], xh_ref[:], w_ref[0], s_ref, z_ref, n_groups, gs2,
        has_zeros, s_idx=(0,), offset_lo=offset_lo,
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
    o_ref[:] += jnp.where(row_ids == r, acc, 0.0)


def _gather_mx4_kernel(ids_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref, *,
                       n_groups, gs2):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = _mx4_matblock(
        xl_ref[:], xh_ref[:], w_ref[0], s_ref, n_groups, gs2, s_idx=(0,)
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
    o_ref[:] += jnp.where(row_ids == r, acc, 0.0)


def _gather_mx8_kernel(ids_ref, x_ref, w_ref, s_ref, o_ref, *, n_groups, gs):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = _mx8_matblock(x_ref[:], w_ref[0], s_ref, n_groups, gs, s_idx=(0,))
    row_ids = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
    o_ref[:] += jnp.where(row_ids == r, acc, 0.0)


def _grouped_mx4_kernel(tg_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref, *,
                        n_groups, gs2):
    o_ref[:] = _mx4_matblock(
        xl_ref[:], xh_ref[:], w_ref[0], s_ref, n_groups, gs2, s_idx=(0,)
    )


def _grouped_mx8_kernel(tg_ref, x_ref, w_ref, s_ref, o_ref, *, n_groups, gs):
    o_ref[:] = _mx8_matblock(
        x_ref[:], w_ref[0], s_ref, n_groups, gs, s_idx=(0,)
    )


def _gather_int8_kernel(ids_ref, x_ref, w_ref, s_ref, o_ref):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    part = jnp.dot(
        x_ref[:],
        w_ref[0].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    )
    part = part * s_ref[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
    o_ref[:] += jnp.where(row_ids == r, part, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gathered_quant_matmul(
    x_rows: jnp.ndarray,  # [R, K] one activation row per (token, slot)
    w: QTensor,  # [E, K(packed), N]
    ids: jnp.ndarray,  # [R] int32 expert index per row
    interpret: bool = False,
):
    """Decode-MoE matmul: row r uses expert ids[r]. Returns [R, N] out_dtype.

    Only the routed experts' weight tiles are fetched from HBM (block index
    map reads the prefetched ids), so per-token traffic is
    k_active * bytes(expert), like the reference's forward_decode."""
    if w.kind in INT4_KINDS and w.act_quant:
        from ktransformers_tpu.ops.pallas.w4a8_matmul import (
            gathered_w4a8_matmul,
        )

        return gathered_w4a8_matmul(x_rows, w, ids, interpret=interpret)

    r, kdim = x_rows.shape
    e = w.data.shape[0]
    n = w.out_features
    out_dtype = x_rows.dtype

    r8 = max(8, ((r + 7) // 8) * 8)
    if r8 != r:
        x_rows = jnp.pad(x_rows, ((0, r8 - r), (0, 0)))

    if w.kind in ("int8", "fp8"):
        bn = _pick_bn(n, kdim)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pl.cdiv(n, bn), r),
            in_specs=[
                pl.BlockSpec((r8, kdim), lambda j, i, ids: (0, 0)),
                pl.BlockSpec((1, kdim, bn), lambda j, i, ids: (ids[i], 0, j)),
                pl.BlockSpec((1, 1, bn), lambda j, i, ids: (ids[i], 0, j)),
            ],
            out_specs=pl.BlockSpec((r8, bn), lambda j, i, ids: (0, j)),
        )
        y = pl.pallas_call(
            _gather_int8_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((r8, n), jnp.float32),
            interpret=interpret,
        )(ids, x_rows, w.data, w.scales)
        return y[:r].astype(out_dtype)

    if w.kind in INT4_KINDS:
        gs = w.group_size or kdim
        gs2 = gs // 2
        k2 = kdim // 2
        n_groups = kdim // gs
        bn = _pick_bn(n, k2)
        xl, xh = split_x_for_int4(x_rows, kdim, w.group_size)
        scales = w.scales.reshape(e, -1, n)  # possibly sublane-padded
        ngp = scales.shape[1]
        has_zeros = w.zeros is not None
        ins = [ids, xl, xh, w.data, scales]
        in_specs = [
            pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
            pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
            pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
            pl.BlockSpec((1, ngp, bn), lambda j, i, ids: (ids[i], 0, j)),
        ]
        if has_zeros:
            ins.append(w.zeros.reshape(e, -1, n))
            in_specs.append(
                pl.BlockSpec((1, ngp, bn), lambda j, i, ids: (ids[i], 0, j))
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pl.cdiv(n, bn), r),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((r8, bn), lambda j, i, ids: (0, j)),
        )
        y = pl.pallas_call(
            functools.partial(
                _gather_int4_kernel,
                n_groups=n_groups,
                gs2=gs2,
                has_zeros=has_zeros,
                offset_lo=w.act_quant,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((r8, n), jnp.float32),
            interpret=interpret,
        )(*ins)
        return y[:r].astype(out_dtype)

    if w.kind in ("mxfp4", "mxfp8"):
        gs = w.group_size
        n_groups = kdim // gs
        scales = w.scales.reshape(e, -1, n)
        ngp = scales.shape[1]
        if w.kind == "mxfp4":
            k2 = kdim // 2
            bn = _pick_bn(n, k2 * 13)
            xl, xh = split_x_for_int4(x_rows, kdim, gs)
            ins = [ids, xl, xh, w.data, scales]
            in_specs = [
                pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
                pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
                pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
                pl.BlockSpec((1, ngp, bn), lambda j, i, ids: (ids[i], 0, j)),
            ]
            kern = functools.partial(
                _gather_mx4_kernel, n_groups=n_groups, gs2=gs // 2
            )
        else:
            bn = _pick_bn(n, kdim * 9)
            ins = [ids, x_rows, w.data, scales]
            in_specs = [
                pl.BlockSpec((r8, kdim), lambda j, i, ids: (0, 0)),
                pl.BlockSpec((1, kdim, bn), lambda j, i, ids: (ids[i], 0, j)),
                pl.BlockSpec((1, ngp, bn), lambda j, i, ids: (ids[i], 0, j)),
            ]
            kern = functools.partial(
                _gather_mx8_kernel, n_groups=n_groups, gs=gs
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pl.cdiv(n, bn), r),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((r8, bn), lambda j, i, ids: (0, j)),
        )
        y = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((r8, n), jnp.float32),
            interpret=interpret,
        )(*ins)
        return y[:r].astype(out_dtype)

    raise ValueError(f"gathered_quant_matmul: unsupported kind {w.kind}")


# ---------------------------------------------------------------------------
# grouped (prefill MoE): sorted rows, capacity-padded so each m-tile maps to
# exactly one expert (tile-group index via scalar prefetch)
# ---------------------------------------------------------------------------

GROUP_BM = 64


def grouped_tile_layout(m: int, e: int, group_sizes, bm: int = GROUP_BM):
    """The sorted-rows -> expert-aligned-tiles scatter layout shared by the
    grouped forward kernel and its transposed backward (ops/pallas/vjp.py):
    returns (dest [m] row destinations, valid [m] bool, tile_group
    [mpad/bm] expert per tile, mpad). Deterministic in group_sizes, so the
    backward can rebuild the exact forward layout."""
    mtiles = pl.cdiv(m, bm) + e
    mpad = mtiles * bm

    gs = group_sizes.astype(jnp.int32)
    padded_sizes = ((gs + bm - 1) // bm) * bm
    offsets = jnp.cumsum(gs) - gs  # exclusive
    padded_offsets = jnp.cumsum(padded_sizes) - padded_sizes
    total = jnp.sum(gs)

    rows = jnp.arange(m, dtype=jnp.int32)
    row_group = jnp.repeat(jnp.arange(e, dtype=jnp.int32), gs,
                           total_repeat_length=m)
    valid = rows < total
    dest = jnp.where(
        valid,
        padded_offsets[row_group] + (rows - offsets[row_group]),
        mpad - 1,
    )

    # tile -> group map: tile t belongs to group g iff
    # padded_offsets[g] <= t*bm < padded_offsets[g] + padded_sizes[g]
    tile_starts = padded_offsets // bm  # [E]
    tile_counts = padded_sizes // bm
    tile_idx = jnp.arange(mtiles, dtype=jnp.int32)
    tile_group = jnp.searchsorted(
        tile_starts + tile_counts, tile_idx, side="right"
    ).astype(jnp.int32)
    tile_group = jnp.minimum(tile_group, e - 1)
    return dest, valid, tile_group, mpad


def _grouped_int4_kernel(
    tg_ref, xl_ref, xh_ref, w_ref, s_ref, *rest, n_groups, gs2, has_zeros,
    offset_lo=False
):
    z_ref = rest[0] if has_zeros else None
    o_ref = rest[-1]
    o_ref[:] = _int4_matblock(
        xl_ref[:], xh_ref[:], w_ref[0], s_ref, z_ref, n_groups, gs2,
        has_zeros, s_idx=(0,), offset_lo=offset_lo,
    )


def _grouped_int8_kernel(tg_ref, x_ref, w_ref, s_ref, o_ref):
    y = jnp.dot(
        x_ref[:],
        w_ref[0].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = y * s_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def grouped_quant_matmul(
    x_sorted: jnp.ndarray,  # [M, K] rows sorted by group
    w: QTensor,  # [E, K(packed), N]
    group_sizes: jnp.ndarray,  # [E] int32; sum may be < M (masked rows)
    interpret: bool = False,
):
    """Prefill-MoE grouped matmul with fused dequant.

    The TPU analog of the reference's prefill expert GEMM pass
    (moe_base.hpp forward_prefill token bucketing + per-expert AMX GEMM) and
    of megablox gmm, specialized to quantized weights: rows are re-scattered
    so every bm-row tile belongs to exactly one expert, the tile->expert map
    is scalar-prefetched, and each program runs a dense fused-dequant matmul
    block. Rows past sum(group_sizes) come back zero (masked experts).
    """
    if w.kind in INT4_KINDS and w.act_quant and _GROUPED_IMPL == "w4a8":
        # int8-MXU grouped path (VERDICT r4 prefill item): raw packed
        # bytes into int8 dots instead of the per-m-tile bf16 VPU dequant.
        # KT_GROUPED_IMPL=bf16 instead uses the bf16-dequant kernel below
        # with the fast offset-lo decode (A/B: scripts/kernel_lab9.py)
        from ktransformers_tpu.ops.pallas.w4a8_matmul import (
            grouped_w4a8_matmul,
        )

        return grouped_w4a8_matmul(x_sorted, w, group_sizes,
                                   interpret=interpret)

    m, kdim = x_sorted.shape
    e = w.data.shape[0]
    n = w.out_features
    out_dtype = x_sorted.dtype
    bm = GROUP_BM
    dest, valid, tile_group, mpad = grouped_tile_layout(m, e, group_sizes, bm)
    mtiles = mpad // bm

    x_padded = jnp.zeros((mpad, kdim), x_sorted.dtype).at[dest].set(
        jnp.where(valid[:, None], x_sorted, 0)
    )

    if w.kind in ("int8", "fp8"):
        bn = _pick_bn(n, kdim)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mtiles, pl.cdiv(n, bn)),
            in_specs=[
                pl.BlockSpec((bm, kdim), lambda i, j, tg: (i, 0)),
                pl.BlockSpec((1, kdim, bn), lambda i, j, tg: (tg[i], 0, j)),
                pl.BlockSpec((1, 1, bn), lambda i, j, tg: (tg[i], 0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, tg: (i, j)),
        )
        y = pl.pallas_call(
            _grouped_int8_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mpad, n), jnp.float32),
            interpret=interpret,
        )(tile_group, x_padded, w.data, w.scales)
    elif w.kind in INT4_KINDS:
        gsz = w.group_size or kdim
        gs2 = gsz // 2
        k2 = kdim // 2
        n_groups = kdim // gsz
        bn = _pick_bn(n, k2)
        xl, xh = split_x_for_int4(x_padded, kdim, w.group_size)
        scales = w.scales.reshape(e, -1, n)  # possibly sublane-padded
        ngp = scales.shape[1]
        has_zeros = w.zeros is not None
        ins = [tile_group, xl, xh, w.data, scales]
        in_specs = [
            pl.BlockSpec((bm, k2), lambda i, j, tg: (i, 0)),
            pl.BlockSpec((bm, k2), lambda i, j, tg: (i, 0)),
            pl.BlockSpec((1, k2, bn), lambda i, j, tg: (tg[i], 0, j)),
            pl.BlockSpec((1, ngp, bn), lambda i, j, tg: (tg[i], 0, j)),
        ]
        if has_zeros:
            ins.append(w.zeros.reshape(e, -1, n))
            in_specs.append(
                pl.BlockSpec((1, ngp, bn), lambda i, j, tg: (tg[i], 0, j))
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mtiles, pl.cdiv(n, bn)),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, tg: (i, j)),
        )
        y = pl.pallas_call(
            functools.partial(
                _grouped_int4_kernel,
                n_groups=n_groups,
                gs2=gs2,
                has_zeros=has_zeros,
                offset_lo=w.act_quant,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mpad, n), jnp.float32),
            interpret=interpret,
        )(*ins)
    elif w.kind in ("mxfp4", "mxfp8"):
        gsz = w.group_size
        n_groups = kdim // gsz
        scales = w.scales.reshape(e, -1, n)
        ngp = scales.shape[1]
        if w.kind == "mxfp4":
            k2 = kdim // 2
            bn = _pick_bn(n, k2 * 13)
            xl, xh = split_x_for_int4(x_padded, kdim, gsz)
            ins = [tile_group, xl, xh, w.data, scales]
            in_specs = [
                pl.BlockSpec((bm, k2), lambda i, j, tg: (i, 0)),
                pl.BlockSpec((bm, k2), lambda i, j, tg: (i, 0)),
                pl.BlockSpec((1, k2, bn), lambda i, j, tg: (tg[i], 0, j)),
                pl.BlockSpec((1, ngp, bn), lambda i, j, tg: (tg[i], 0, j)),
            ]
            kern = functools.partial(
                _grouped_mx4_kernel, n_groups=n_groups, gs2=gsz // 2
            )
        else:
            bn = _pick_bn(n, kdim * 9)
            ins = [tile_group, x_padded, w.data, scales]
            in_specs = [
                pl.BlockSpec((bm, kdim), lambda i, j, tg: (i, 0)),
                pl.BlockSpec((1, kdim, bn), lambda i, j, tg: (tg[i], 0, j)),
                pl.BlockSpec((1, ngp, bn), lambda i, j, tg: (tg[i], 0, j)),
            ]
            kern = functools.partial(
                _grouped_mx8_kernel, n_groups=n_groups, gs=gsz
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(mtiles, pl.cdiv(n, bn)),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, tg: (i, j)),
        )
        y = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mpad, n), jnp.float32),
            interpret=interpret,
        )(*ins)
    else:
        raise ValueError(f"grouped_quant_matmul: unsupported kind {w.kind}")

    out = jnp.where(valid[:, None], y[dest], 0.0)
    return out.astype(out_dtype)
