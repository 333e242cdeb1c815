"""W4A8 Pallas kernels: int4 weights x int8 activations on the int8 MXU.

The decode-batch companion of ops/pallas/quant_matmul.py. Those kernels
dequantize weights to bf16 on the VPU (~14 ops/byte -> ~340 GB/s on v5e);
these feed the *raw packed bytes* to int8 MXU dots via the offset-lo dot
identity (quant/w4a8.py module docstring), cutting VPU work to ~1 op/byte
and reaching ~630 GB/s at M=8 (scripts/kernel_lab6e.py V4).

TPU re-derivation of the reference's AMX-INT8 activation-quantized MoE
(kt-kernel/operators/amx/moe.hpp: per-block int8 activation quant feeding
AMX int8 tiles); here the per-(row, scale-group) activation scales ride
outside two int8 dots per group.

Weights must be offset-lo repacked (QTensor.act_quant=True). Activations
are quantized per (row, weight scale group) by quant/w4a8.w4a8_prep,
OUTSIDE the kernels. NEGATIVE RESULT (measured round 3, don't redo): moving
the prep in-kernel (raw bf16 x in, per-group _quant_rows before each dot
pair) measured 339 -> 319 tok/s on the bench decode — the per-group VPU
quant chain (abs-max reduce -> div -> round -> clip) serializes with the
MXU dots inside the kernel body, while XLA runs the outside-prep fusions
concurrently with neighboring kernels' DMA waits. The prep's HBM round
trip (write qa/qb, re-read) is cheaper than the lost overlap at decode M.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ktransformers_tpu.quant.formats import QTensor
from ktransformers_tpu.quant.w4a8 import w4a8_prep

# one weight block (k2 x bn int8 bytes); sized so double buffering stays
# well under the ~16 MB VMEM budget alongside the activation planes
_W4A8_BLOCK_BYTES = int(__import__("os").environ.get("KT_W4A8_BLOCK_MB", "4")) * 1024 * 1024


def _pick_bn(n: int, k2: int) -> int:
    bn = _W4A8_BLOCK_BYTES // max(k2, 1)
    bn = max(256, (bn // 256) * 256)
    return min(n, bn)


def _w4a8_group_acc(qa, qb, sa, sb, t, braw, s_blk, z_blk, xsum,
                    n_groups, gs2):
    """Core math shared by the dense and gathered kernels.

    qa/qb: int8 [M, K/2]; sa/sb/t/xsum: f32 [M, ng]; braw: int8 [K/2, bn]
    offset-lo packed bytes; s_blk: f32 [ng, bn]; z_blk: f32 [ng, bn] | None.
    Returns f32 [M, bn].
    """
    u = braw & jnp.int8(0xF)
    m = qa.shape[0]
    bn = braw.shape[-1]
    acc = jnp.zeros((m, bn), jnp.float32)
    for g in range(n_groups):
        wl = slice(g * gs2, (g + 1) * gs2)
        pa = jnp.dot(qa[:, wl], u[wl], preferred_element_type=jnp.int32)
        pb = jnp.dot(qb[:, wl], braw[wl], preferred_element_type=jnp.int32)
        val = (
            pa.astype(jnp.float32) * sa[:, g][:, None]
            + pb.astype(jnp.float32) * sb[:, g][:, None]
            - t[:, g][:, None]
        )
        if z_blk is not None:
            val = val - xsum[:, g][:, None] * z_blk[g][None, :]
        acc += val * s_blk[g][None, :]
    return acc


def _gather_w4a8_kernel(ids_ref, qa_ref, qb_ref, sa_ref, sb_ref, t_ref,
                        xs_ref, w_ref, s_ref, *rest, n_groups, gs2,
                        has_zeros):
    z_ref = rest[0] if has_zeros else None
    o_ref = rest[-1]
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = _w4a8_group_acc(
        qa_ref[:], qb_ref[:], sa_ref[:], sb_ref[:], t_ref[:], w_ref[0],
        s_ref[0], z_ref[0] if has_zeros else None, xs_ref[:], n_groups, gs2,
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
    o_ref[:] += jnp.where(row_ids == r, acc, 0.0)


def _dense_w4a8_kernel(qa_ref, qb_ref, sa_ref, sb_ref, t_ref, xs_ref,
                       w_ref, s_ref, *rest, n_groups, gs2, has_zeros):
    """Dense kernel with the byte-decode done PER GROUP SLICE: the whole-
    block `u = braw & 15` temp of _w4a8_group_acc is [K/2, bn] int32+int8,
    which busts the 16 MB scoped-VMEM stack at prefill K (e.g. K=10944,
    k2=5472: 11 MB of int32 alone). Per-group temps stay [gs2, bn]."""
    z_ref = rest[0] if has_zeros else None
    o_ref = rest[-1]
    qa, qb = qa_ref[:], qb_ref[:]
    sa, sb, t, xsum = sa_ref[:], sb_ref[:], t_ref[:], xs_ref[:]
    m = qa.shape[0]
    bn = w_ref.shape[-1]
    acc = jnp.zeros((m, bn), jnp.float32)
    for g in range(n_groups):
        wl = slice(g * gs2, (g + 1) * gs2)
        braw = w_ref[wl]
        u = braw & jnp.int8(0xF)
        pa = jnp.dot(qa[:, wl], u, preferred_element_type=jnp.int32)
        pb = jnp.dot(qb[:, wl], braw, preferred_element_type=jnp.int32)
        val = (
            pa.astype(jnp.float32) * sa[:, g][:, None]
            + pb.astype(jnp.float32) * sb[:, g][:, None]
            - t[:, g][:, None]
        )
        if has_zeros:
            val = val - xsum[:, g][:, None] * z_ref[g][None, :]
        acc += val * s_ref[g][None, :]
    o_ref[:] = acc


def _as_i8(data: jnp.ndarray) -> jnp.ndarray:
    # repack_offset_lo stores int8 directly; a per-step bitcast here would
    # materialize a full copy of the weight array inside the jitted step
    if data.dtype == jnp.int8:
        return data
    return jax.lax.bitcast_convert_type(data, jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gathered_w4a8_matmul(
    x_rows: jnp.ndarray,  # [R, K] float, one activation row per (token, slot)
    w: QTensor,  # act_quant int4 kind, [E, K/2, N]
    ids: jnp.ndarray,  # [R] int32 expert per row
    interpret: bool = False,
):
    """Decode-MoE matmul on the int8 MXU. Returns [R, N] x.dtype."""
    r, kdim = x_rows.shape
    e = w.data.shape[0]
    n = w.out_features
    out_dtype = x_rows.dtype
    gs = w.group_size or kdim
    gs2 = gs // 2
    k2 = kdim // 2
    ng = kdim // gs
    bn = _pick_bn(n, k2)

    r8 = max(8, ((r + 7) // 8) * 8)
    if r8 != r:
        x_rows = jnp.pad(x_rows, ((0, r8 - r), (0, 0)))
    qa, qb, sa, sb, t, xsum = w4a8_prep(x_rows, kdim, w.group_size)

    scales = w.scales.reshape(e, -1, n)  # ng rows, possibly sublane-padded
    ngp = scales.shape[1]
    has_zeros = w.zeros is not None
    ins = [ids, qa, qb, sa, sb, t, xsum, _as_i8(w.data), scales]
    in_specs = [
        pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((r8, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((r8, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((r8, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((r8, ng), lambda j, i, ids: (0, 0)),
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
            _gather_w4a8_kernel, n_groups=ng, gs2=gs2, has_zeros=has_zeros
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r8, n), jnp.float32),
        interpret=interpret,
    )(*ins)
    return y[:r].astype(out_dtype)


def _glu(g, u, act: str):
    g = g.astype(jnp.float32)
    u = u.astype(jnp.float32)
    if act == "silu":
        return g * (1.0 / (1.0 + jnp.exp(-g))) * u
    if act == "relu":
        return jnp.maximum(g, 0.0) * u
    if act == "gelu":
        return 0.5 * g * (1.0 + jax.lax.erf(g / 2.0**0.5)) * u
    raise ValueError(act)


def _quant_rows(v):
    """Per-row int8 quantization of a [M, gs2] slice (w4a8_prep's `q`)."""
    amax = jnp.maximum(jnp.max(jnp.abs(v), -1), 1e-8)
    s = amax / 127.0
    codes = jnp.clip(jnp.round(v / s[:, None]), -127, 127).astype(jnp.int8)
    return codes, s


def _ffn_w4a8_kernel(ids_ref, qa_ref, qb_ref, sa_ref, sb_ref, t_ref,
                     xs_ref, *rest, ng1, gs2_1, gz1, ng2, gs2_2, gz2,
                     inter, act):
    """Whole expert FFN for one routed row: gate_up int8-MXU dots -> GLU
    -> in-kernel activation re-quant -> down int8-MXU dots. One kernel
    launch instead of two plus the XLA glue between them (the act quant of
    h and the swiglu): at decode batch sizes each launch has ~5 us of
    fixed cost and the glue another ~5 us/layer, so fusing is worth
    ~0.3 ms/step on the 27-layer bench model."""
    rest = list(rest)
    gu_w = rest.pop(0)
    gu_s = rest.pop(0)
    gu_z = rest.pop(0) if gz1 else None
    dn_w = rest.pop(0)
    dn_s = rest.pop(0)
    dn_z = rest.pop(0) if gz2 else None
    o_ref = rest.pop(0)
    r = pl.program_id(0)

    h = _w4a8_group_acc(
        qa_ref[:], qb_ref[:], sa_ref[:], sb_ref[:], t_ref[:], gu_w[0],
        gu_s[0], gu_z[0] if gz1 else None, xs_ref[:], ng1, gs2_1,
    )  # [r8, 2*inter] f32
    a = _glu(h[:, :inter], h[:, inter:], act)  # [r8, inter] f32

    # down matmul with the activation re-quant folded INTO the group loop
    # (w4a8_prep semantics per group): no materialized [r8, inter/2] code
    # planes or concats — the temps stay [r8, gs2_2], which is what keeps
    # the kernel inside the 16 MB scoped-VMEM limit at serving batch sizes
    m = a.shape[0]
    kdim_out = dn_w.shape[-1]
    gs = 2 * gs2_2
    braw_all = dn_w[0]
    u_all = braw_all & jnp.int8(0xF)
    y = jnp.zeros((m, kdim_out), jnp.float32)
    for g in range(ng2):
        seg = a[:, g * gs : (g + 1) * gs]
        lo, hi = seg[:, :gs2_2], seg[:, gs2_2:]
        ca, sa2 = _quant_rows(lo - hi / 16.0)
        cb, sb2 = _quant_rows(hi / 16.0)
        wl = slice(g * gs2_2, (g + 1) * gs2_2)
        pa = jnp.dot(ca, u_all[wl], preferred_element_type=jnp.int32)
        pb = jnp.dot(cb, braw_all[wl], preferred_element_type=jnp.int32)
        val = (
            pa.astype(jnp.float32) * sa2[:, None]
            + pb.astype(jnp.float32) * sb2[:, None]
            - 8.0 * jnp.sum(lo, -1)[:, None]
        )
        if gz2:
            val = val - jnp.sum(lo + hi, -1)[:, None] * dn_z[0][g][None, :]
        y += val * dn_s[0][g][None, :]

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
    o_ref[:] += jnp.where(row_ids == r, y, 0.0)


# VMEM budget for holding one expert's gate_up + down blocks double-
# buffered alongside the activation planes
_FFN_VMEM_BUDGET = 10 * 1024 * 1024


def ffn_fits(gate_up: QTensor, down: QTensor, act_kind: str,
             swiglu_limit, rows: int = 8) -> bool:
    """Static eligibility for the fused FFN kernel: both mats act_quant
    int4 kinds, a supported GLU, and whole-expert blocks + the ROW-scaled
    temps within scoped VMEM (r4: at 96 rows the int32 pa/pb planes alone
    are ~4.3 MB and tipped the 16 MB stack by 384 KB)."""
    if not (gate_up.act_quant and down.act_quant):
        return False
    if act_kind not in ("silu", "relu", "gelu") or swiglu_limit is not None:
        return False
    e, k2, n2x = gate_up.data.shape
    _, i2, kdim = down.data.shape
    inter = n2x // 2
    r8 = max(8, ((rows + 7) // 8) * 8)
    need = (
        2 * (k2 * n2x + i2 * kdim)      # weight blocks, double-buffered
        + r8 * (
            2 * k2                       # qa/qb int8
            + n2x * 4                    # h f32
            + inter * 4                  # a f32
            + 2 * kdim * 4               # y + out f32
            + 2 * n2x * 4                # gate_up pa/pb int32
            + 2 * kdim * 4               # down pa/pb int32
        )
    )
    if need > 15 * 1024 * 1024:
        return False
    gs2 = down.group_size or 2 * i2
    return (2 * i2) % gs2 == 0


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def gathered_w4a8_ffn(
    x_rows: jnp.ndarray,  # [R, K] float, one row per (token, slot)
    gate_up: QTensor,  # act_quant int4 kind, [E, K/2, 2*inter]
    down: QTensor,  # act_quant int4 kind, [E, inter/2, K]
    ids: jnp.ndarray,  # [R] int32 expert per row
    act: str = "silu",
    interpret: bool = False,
):
    """Fused decode-MoE expert FFN. Returns [R, K] x.dtype."""
    r, kdim = x_rows.shape
    e = gate_up.data.shape[0]
    n2x = gate_up.out_features  # 2*inter
    inter = n2x // 2
    out_dtype = x_rows.dtype
    k2 = kdim // 2
    i2 = inter // 2
    gs1 = gate_up.group_size or kdim
    ng1 = kdim // gs1
    gs_dn = down.group_size or inter
    ng2 = inter // gs_dn

    r8 = max(8, ((r + 7) // 8) * 8)
    if r8 != r:
        x_rows = jnp.pad(x_rows, ((0, r8 - r), (0, 0)))
    qa, qb, sa, sb, t, xsum = w4a8_prep(x_rows, kdim, gate_up.group_size)

    gz1 = gate_up.zeros is not None
    gz2 = down.zeros is not None
    gu_s = gate_up.scales.reshape(e, -1, n2x)  # possibly sublane-padded
    dn_s = down.scales.reshape(e, -1, kdim)
    ng1p, ng2p = gu_s.shape[1], dn_s.shape[1]
    ins = [ids, qa, qb, sa, sb, t, xsum, _as_i8(gate_up.data), gu_s]
    in_specs = [
        pl.BlockSpec((r8, k2), lambda i, ids: (0, 0)),
        pl.BlockSpec((r8, k2), lambda i, ids: (0, 0)),
        pl.BlockSpec((r8, ng1), lambda i, ids: (0, 0)),
        pl.BlockSpec((r8, ng1), lambda i, ids: (0, 0)),
        pl.BlockSpec((r8, ng1), lambda i, ids: (0, 0)),
        pl.BlockSpec((r8, ng1), lambda i, ids: (0, 0)),
        pl.BlockSpec((1, k2, n2x), lambda i, ids: (ids[i], 0, 0)),
        pl.BlockSpec((1, ng1p, n2x), lambda i, ids: (ids[i], 0, 0)),
    ]
    if gz1:
        ins.append(gate_up.zeros.reshape(e, -1, n2x))
        in_specs.append(
            pl.BlockSpec((1, ng1p, n2x), lambda i, ids: (ids[i], 0, 0))
        )
    ins += [_as_i8(down.data), dn_s]
    in_specs += [
        pl.BlockSpec((1, i2, kdim), lambda i, ids: (ids[i], 0, 0)),
        pl.BlockSpec((1, ng2p, kdim), lambda i, ids: (ids[i], 0, 0)),
    ]
    if gz2:
        ins.append(down.zeros.reshape(e, -1, kdim))
        in_specs.append(
            pl.BlockSpec((1, ng2p, kdim), lambda i, ids: (ids[i], 0, 0))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r8, kdim), lambda i, ids: (0, 0)),
    )
    y = pl.pallas_call(
        functools.partial(
            _ffn_w4a8_kernel, ng1=ng1, gs2_1=gs1 // 2, gz1=gz1,
            ng2=ng2, gs2_2=gs_dn // 2, gz2=gz2, inter=inter, act=act,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r8, kdim), jnp.float32),
        interpret=interpret,
    )(*ins)
    return y[:r].astype(out_dtype)


def _math_lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


def dense_ffn_plan(gate_up: QTensor, down: QTensor, act_kind: str,
                   swiglu_limit) -> int | None:
    """Pick the inter-dim chunk width bc for dense_w4a8_ffn, or None when
    the shapes/kinds are ineligible. bc must divide inter, be a multiple
    of lcm(128, down group) for Mosaic lane/group alignment, and keep the
    double-buffered gate/up/down blocks inside the VMEM budget."""
    if not (isinstance(gate_up, QTensor) and isinstance(down, QTensor)):
        return None
    if not (getattr(gate_up, "act_quant", False)
            and getattr(down, "act_quant", False)):
        return None
    if act_kind not in ("silu", "relu", "gelu") or swiglu_limit is not None:
        return None
    if gate_up.data.ndim != 2 or down.data.ndim != 2:
        return None
    k2, n2x = gate_up.data.shape
    i2, kdim = down.data.shape
    inter = n2x // 2
    if n2x != 2 * inter or 2 * i2 != inter:
        return None
    gs_dn = down.group_size or inter
    step = _math_lcm(128, gs_dn)
    best = None
    bc = (inter // step) * step
    while bc >= step:
        if inter % bc == 0:
            need = 2 * (2 * k2 * bc + (bc // 2) * kdim)
            if need <= _FFN_VMEM_BUDGET:
                best = bc
                break
        bc -= step
    return best


def _dense_ffn_kernel(qa_ref, qb_ref, sa_ref, sb_ref, t_ref, xs_ref,
                      *rest, ng1, gs2_1, gz1, cg, gs2_2, gz2, act):
    """One inter-dim chunk of a dense FFN: gate/up int8-MXU dots -> GLU ->
    in-chunk activation re-quant -> partial down dots accumulated into the
    output. Grid (m_blocks, inter/bc); one launch replaces the two dense
    W4A8 launches + the XLA GLU/act-quant glue between them (the shared
    experts of every MoE layer are this shape: ffn_fits rejects them from
    the whole-expert kernel at 17.3 MB)."""
    rest = list(rest)
    g_w = rest.pop(0)
    g_s = rest.pop(0)
    g_z = rest.pop(0) if gz1 else None
    u_w = rest.pop(0)
    u_s = rest.pop(0)
    u_z = rest.pop(0) if gz1 else None
    dn_w = rest.pop(0)
    dn_s = rest.pop(0)
    dn_z = rest.pop(0) if gz2 else None
    o_ref = rest.pop(0)
    c = pl.program_id(1)

    qa, qb = qa_ref[:], qb_ref[:]
    sa, sb, t, xsum = sa_ref[:], sb_ref[:], t_ref[:], xs_ref[:]
    hg = _w4a8_group_acc(qa, qb, sa, sb, t, g_w[:],
                         g_s[:], g_z[:] if gz1 else None, xsum, ng1, gs2_1)
    hu = _w4a8_group_acc(qa, qb, sa, sb, t, u_w[:], u_s[:],
                         u_z[:] if gz1 else None, xsum, ng1, gs2_1)
    a = _glu(hg, hu, act)  # [bm, bc] f32

    m = a.shape[0]
    kdim_out = dn_w.shape[-1]
    gs = 2 * gs2_2
    y = jnp.zeros((m, kdim_out), jnp.float32)
    for g in range(cg):
        seg = a[:, g * gs : (g + 1) * gs]
        lo, hi = seg[:, :gs2_2], seg[:, gs2_2:]
        ca, sa2 = _quant_rows(lo - hi / 16.0)
        cb, sb2 = _quant_rows(hi / 16.0)
        wl = slice(g * gs2_2, (g + 1) * gs2_2)
        braw = dn_w[wl]
        u = braw & jnp.int8(0xF)
        pa = jnp.dot(ca, u, preferred_element_type=jnp.int32)
        pb = jnp.dot(cb, braw, preferred_element_type=jnp.int32)
        val = (
            pa.astype(jnp.float32) * sa2[:, None]
            + pb.astype(jnp.float32) * sb2[:, None]
            - 8.0 * jnp.sum(lo, -1)[:, None]
        )
        grow = c * cg + g  # global down-scale row (dn_s is resident whole)
        if gz2:
            val = val - jnp.sum(lo + hi, -1)[:, None] * dn_z[grow][None, :]
        y += val * dn_s[grow][None, :]

    @pl.when(c == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += y


@functools.partial(jax.jit, static_argnames=("act", "bc", "interpret"))
def dense_w4a8_ffn(
    x2: jnp.ndarray,  # [M, K] float
    gate_up: QTensor,  # act_quant int4 kind, [K/2, 2*inter]
    down: QTensor,  # act_quant int4 kind, [inter/2, K]
    act: str = "silu",
    bc: int | None = None,
    interpret: bool = False,
):
    """Fused dense FFN (gate_up -> GLU -> down) streamed in inter-dim
    chunks: handles FFN sizes the whole-expert kernel (gathered_w4a8_ffn)
    cannot hold in VMEM. Returns [M, K] x.dtype. The TPU analog of the
    reference's fused shared-expert forward
    (kt-kernel/operators/amx/moe_base.hpp gate+up+down tiling)."""
    m, kdim = x2.shape
    k2, n2x = gate_up.data.shape
    inter = n2x // 2
    out_dtype = x2.dtype
    gs1 = gate_up.group_size or kdim
    ng1 = kdim // gs1
    gs_dn = down.group_size or inter
    if bc is None:
        bc = dense_ffn_plan(gate_up, down, act, None)
    assert bc is not None and inter % bc == 0 and bc % gs_dn == 0
    nc = inter // bc
    cg = bc // gs_dn

    m8 = max(8, ((m + 7) // 8) * 8)
    if m8 != m:
        x2 = jnp.pad(x2, ((0, m8 - m), (0, 0)))
    qa, qb, sa, sb, t, xsum = w4a8_prep(x2, kdim, gate_up.group_size)
    # M tile: the three weight blocks (gate, up, down) are the fixed cost;
    # activation planes + the f32 out/a temps scale with bm
    wbytes = 2 * (2 * k2 * bc + (bc // 2) * kdim)
    bm = min(m8, 512)
    while bm > 8:
        need = (
            wbytes
            + 2 * 2 * bm * k2        # qa, qb double-buffered
            + 4 * 4 * bm * ng1       # sa/sb/t/xsum f32
            + bm * kdim * 4          # out f32
            + bm * bc * 4 * 3        # hg/hu/a f32 temps
            + bm * kdim * 4 * 3      # pa/pb int32 + y f32 down-dot temps
        )
        if need <= _FFN_VMEM_BUDGET + 4 * 1024 * 1024:
            break
        bm = max(8, (bm // 2 // 8) * 8)  # sublane-aligned (see above)
    if m8 % bm:
        pad = bm - m8 % bm
        qa, qb, sa, sb, t, xsum = (
            jnp.pad(v, ((0, pad), (0, 0))) for v in (qa, qb, sa, sb, t, xsum)
        )
        m8 += pad

    gz1 = gate_up.zeros is not None
    gz2 = down.zeros is not None
    gu_s = gate_up.scales.reshape(-1, n2x)  # ng1p rows (sublane-padded ok)
    ng1p = gu_s.shape[0]
    dn_s = down.scales.reshape(-1, kdim)  # resident whole; dynamic rows
    ng2p = dn_s.shape[0]
    cb0 = inter // bc  # first block index of the `up` half

    ins = [qa, qb, sa, sb, t, xsum]
    in_specs = [
        pl.BlockSpec((bm, k2), lambda i, c: (i, 0)),
        pl.BlockSpec((bm, k2), lambda i, c: (i, 0)),
        pl.BlockSpec((bm, ng1), lambda i, c: (i, 0)),
        pl.BlockSpec((bm, ng1), lambda i, c: (i, 0)),
        pl.BlockSpec((bm, ng1), lambda i, c: (i, 0)),
        pl.BlockSpec((bm, ng1), lambda i, c: (i, 0)),
    ]
    wdata = _as_i8(gate_up.data)
    # gate columns at block c, up columns at block inter/bc + c
    ins += [wdata, gu_s]
    in_specs += [
        pl.BlockSpec((k2, bc), lambda i, c: (0, c)),
        pl.BlockSpec((ng1p, bc), lambda i, c: (0, c)),
    ]
    if gz1:
        gu_z = gate_up.zeros.reshape(-1, n2x)
        ins.append(gu_z)
        in_specs.append(pl.BlockSpec((ng1p, bc), lambda i, c: (0, c)))
    ins += [wdata, gu_s]
    in_specs += [
        pl.BlockSpec((k2, bc), lambda i, c, _b=cb0: (0, _b + c)),
        pl.BlockSpec((ng1p, bc), lambda i, c, _b=cb0: (0, _b + c)),
    ]
    if gz1:
        ins.append(gu_z)
        in_specs.append(
            pl.BlockSpec((ng1p, bc), lambda i, c, _b=cb0: (0, _b + c))
        )
    ins += [_as_i8(down.data), dn_s]
    in_specs += [
        pl.BlockSpec((bc // 2, kdim), lambda i, c: (c, 0)),
        pl.BlockSpec((ng2p, kdim), lambda i, c: (0, 0)),
    ]
    if gz2:
        ins.append(down.zeros.reshape(-1, kdim))
        in_specs.append(pl.BlockSpec((ng2p, kdim), lambda i, c: (0, 0)))

    y = pl.pallas_call(
        functools.partial(
            _dense_ffn_kernel, ng1=ng1, gs2_1=gs1 // 2, gz1=gz1,
            cg=cg, gs2_2=gs_dn // 2, gz2=gz2, act=act,
        ),
        grid=(m8 // bm, nc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, kdim), lambda i, c: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m8, kdim), jnp.float32),
        interpret=interpret,
    )(*ins)
    return y[:m].astype(out_dtype)


def _grouped_w4a8_kernel(tg_ref, qa_ref, qb_ref, sa_ref, sb_ref, t_ref,
                         xs_ref, w_ref, s_ref, *rest, n_groups, gs2,
                         has_zeros):
    """Grouped (prefill-MoE) W4A8 matmul block: every bm-row tile belongs
    to exactly one expert (tile->expert map scalar-prefetched, same layout
    as quant_matmul.grouped_quant_matmul). Per-group byte decode as in
    _dense_w4a8_kernel keeps temps [gs2, bn]."""
    z_ref = rest[0] if has_zeros else None
    o_ref = rest[-1]
    qa, qb = qa_ref[:], qb_ref[:]
    sa, sb, t, xsum = sa_ref[:], sb_ref[:], t_ref[:], xs_ref[:]
    m = qa.shape[0]
    bn = w_ref.shape[-1]
    acc = jnp.zeros((m, bn), jnp.float32)
    for g in range(n_groups):
        wl = slice(g * gs2, (g + 1) * gs2)
        braw = w_ref[0, wl]
        u = braw & jnp.int8(0xF)
        pa = jnp.dot(qa[:, wl], u, preferred_element_type=jnp.int32)
        pb = jnp.dot(qb[:, wl], braw, preferred_element_type=jnp.int32)
        val = (
            pa.astype(jnp.float32) * sa[:, g][:, None]
            + pb.astype(jnp.float32) * sb[:, g][:, None]
            - t[:, g][:, None]
        )
        if has_zeros:
            val = val - xsum[:, g][:, None] * z_ref[0, g][None, :]
        acc += val * s_ref[0, g][None, :]
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def grouped_w4a8_matmul(
    x_sorted: jnp.ndarray,  # [M, K] float rows sorted by expert
    w: QTensor,  # act_quant int4 kind, [E, K/2, N]
    group_sizes: jnp.ndarray,  # [E] int32
    interpret: bool = False,
):
    """Prefill-MoE grouped matmul on the int8 MXU (VERDICT r3 item 1: the
    bf16-dequant grouped kernel pays ~13 VPU ops/packed byte per m-tile;
    this streams raw bytes into int8 dots at 2x MXU rate and ~1 op/byte).
    Reference analog: the AMX-INT8 prefill expert GEMM pass
    (kt-kernel/operators/amx/moe_base.hpp forward_prefill)."""
    from ktransformers_tpu.ops.pallas.quant_matmul import (
        GROUP_BM,
        grouped_tile_layout,
    )

    m, kdim = x_sorted.shape
    e = w.data.shape[0]
    n = w.out_features
    out_dtype = x_sorted.dtype
    gs = w.group_size or kdim
    gs2 = gs // 2
    k2 = kdim // 2
    ng = kdim // gs
    bn = _pick_bn(n, k2)
    bm = GROUP_BM

    dest, valid, tile_group, mpad = grouped_tile_layout(m, e, group_sizes, bm)
    mtiles = mpad // bm
    x_padded = jnp.zeros((mpad, kdim), x_sorted.dtype).at[dest].set(
        jnp.where(valid[:, None], x_sorted, 0)
    )
    qa, qb, sa, sb, t, xsum = w4a8_prep(x_padded, kdim, w.group_size)

    scales = w.scales.reshape(e, -1, n)  # ng rows, possibly sublane-padded
    ngp = scales.shape[1]
    has_zeros = w.zeros is not None
    ins = [tile_group, qa, qb, sa, sb, t, xsum, _as_i8(w.data), scales]
    in_specs = [
        pl.BlockSpec((bm, k2), lambda i, j, tg: (i, 0)),
        pl.BlockSpec((bm, k2), lambda i, j, tg: (i, 0)),
        pl.BlockSpec((bm, ng), lambda i, j, tg: (i, 0)),
        pl.BlockSpec((bm, ng), lambda i, j, tg: (i, 0)),
        pl.BlockSpec((bm, ng), lambda i, j, tg: (i, 0)),
        pl.BlockSpec((bm, ng), lambda i, j, tg: (i, 0)),
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
            _grouped_w4a8_kernel, n_groups=ng, gs2=gs2, has_zeros=has_zeros
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mpad, n), jnp.float32),
        interpret=interpret,
    )(*ins)
    out = jnp.where(valid[:, None], y[dest], 0.0)
    return out.astype(out_dtype)


def _grouped_ffn_kernel(tg_ref, nlive_ref, qa_ref, qb_ref, sa_ref, sb_ref,
                        t_ref, xs_ref, *rest, ng1, gs2_1, gz1, ng2, gs2_2,
                        gz2, inter, act):
    """Whole expert FFN for one bm-row expert tile: gate_up int8-MXU dots
    -> GLU -> in-kernel activation re-quant -> down int8-MXU dots, writing
    the tile's FFN output in ONE launch. The prefill companion of
    _ffn_w4a8_kernel (decode, one row per grid step): here the grid is the
    sorted expert-tile layout of grouped_quant_matmul, so the unfused
    chain's f32 intermediates (gate_up out 4B*M*2I, the GLU round trip,
    the down re-prep) never touch HBM — at S=512 on the 16B bench model
    those intermediates are ~220 MB/layer of the ~750 MB routed traffic.

    Weight decode is per group slice (the _dense_w4a8_kernel discipline)
    so temps stay [gs2, bn]. Trailing all-padding tiles (the layout's
    static worst case allocates cdiv(m,bm)+e tiles) skip all compute via
    the prefetched live-tile count and write zeros; their weight blocks
    all index expert e-1 consecutively, so Mosaic's pipeline skips the
    re-fetch and dead tiles cost neither HBM nor MXU.

    Reference analog: the prefill expert FFN pass of
    kt-kernel/operators/amx/moe_base.hpp forward_prefill (gate+up GEMM ->
    act -> down GEMM per expert bucket, fused at the tile level)."""
    rest = list(rest)
    gu_w = rest.pop(0)
    gu_s = rest.pop(0)
    gu_z = rest.pop(0) if gz1 else None
    dn_w = rest.pop(0)
    dn_s = rest.pop(0)
    dn_z = rest.pop(0) if gz2 else None
    o_ref = rest.pop(0)
    i = pl.program_id(0)

    @pl.when(i >= nlive_ref[0])
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(i < nlive_ref[0])
    def _():
        qa, qb = qa_ref[:], qb_ref[:]
        sa, sb, t, xsum = sa_ref[:], sb_ref[:], t_ref[:], xs_ref[:]
        m = qa.shape[0]
        n2x = gu_w.shape[-1]
        h = jnp.zeros((m, n2x), jnp.float32)
        for g in range(ng1):
            wl = slice(g * gs2_1, (g + 1) * gs2_1)
            braw = gu_w[0, wl]
            u = braw & jnp.int8(0xF)
            pa = jnp.dot(qa[:, wl], u, preferred_element_type=jnp.int32)
            pb = jnp.dot(qb[:, wl], braw, preferred_element_type=jnp.int32)
            val = (
                pa.astype(jnp.float32) * sa[:, g][:, None]
                + pb.astype(jnp.float32) * sb[:, g][:, None]
                - t[:, g][:, None]
            )
            if gz1:
                val = val - xsum[:, g][:, None] * gu_z[0][g][None, :]
            h += val * gu_s[0][g][None, :]
        a = _glu(h[:, :inter], h[:, inter:], act)  # [bm, inter] f32

        kdim_out = dn_w.shape[-1]
        gs = 2 * gs2_2
        y = jnp.zeros((m, kdim_out), jnp.float32)
        for g in range(ng2):
            seg = a[:, g * gs : (g + 1) * gs]
            lo, hi = seg[:, :gs2_2], seg[:, gs2_2:]
            ca, sa2 = _quant_rows(lo - hi / 16.0)
            cb, sb2 = _quant_rows(hi / 16.0)
            wl = slice(g * gs2_2, (g + 1) * gs2_2)
            braw = dn_w[0, wl]
            u = braw & jnp.int8(0xF)
            pa = jnp.dot(ca, u, preferred_element_type=jnp.int32)
            pb = jnp.dot(cb, braw, preferred_element_type=jnp.int32)
            val = (
                pa.astype(jnp.float32) * sa2[:, None]
                + pb.astype(jnp.float32) * sb2[:, None]
                - 8.0 * jnp.sum(lo, -1)[:, None]
            )
            if gz2:
                val = val - jnp.sum(lo + hi, -1)[:, None] * dn_z[0][g][None, :]
            y += val * dn_s[0][g][None, :]
        o_ref[:] = y.astype(o_ref.dtype)


def grouped_ffn_fits(gate_up: QTensor, down: QTensor, act_kind: str,
                     swiglu_limit, bm: int) -> bool:
    """Static eligibility for grouped_w4a8_ffn: act_quant int4 kinds, a
    supported GLU, and one expert's whole gate_up+down blocks double-
    buffered + the bm-row temps inside the scoped-VMEM stack."""
    if not (isinstance(gate_up, QTensor) and isinstance(down, QTensor)):
        return False
    if not (getattr(gate_up, "act_quant", False)
            and getattr(down, "act_quant", False)):
        return False
    if act_kind not in ("silu", "relu", "gelu") or swiglu_limit is not None:
        return False
    if gate_up.data.ndim != 3 or down.data.ndim != 3:
        return False
    e, k2, n2x = gate_up.data.shape
    _, i2, kdim = down.data.shape
    inter = n2x // 2
    if 2 * i2 != inter or kdim != 2 * k2:
        return False
    gs_dn = down.group_size or inter
    if inter % gs_dn:
        return False
    need = (
        2 * (k2 * n2x + i2 * kdim)   # weight blocks double-buffered
        + 2 * (bm * k2) * 2          # qa/qb int8 double-buffered
        + bm * n2x * 4               # h f32
        + bm * inter * 4             # a f32
        + 2 * bm * kdim * 4          # y f32 + out
        + 2 * bm * n2x * 4           # pa/pb int32 (gate_up dots)
    )
    return need <= 15 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def grouped_w4a8_ffn(
    x_sorted: jnp.ndarray,  # [M, K] float rows sorted by expert
    gate_up: QTensor,  # act_quant int4 kind, [E, K/2, 2*inter]
    down: QTensor,  # act_quant int4 kind, [E, inter/2, K]
    group_sizes: jnp.ndarray,  # [E] int32
    act: str = "silu",
    interpret: bool = False,
):
    """Fused prefill-MoE expert FFN over the sorted expert-tile layout.

    Returns [M, K] x.dtype (rows past sum(group_sizes) are zero). See
    _grouped_ffn_kernel; callers should gate on grouped_ffn_fits."""
    from ktransformers_tpu.ops.pallas.quant_matmul import (
        GROUP_BM,
        grouped_tile_layout,
    )

    m, kdim = x_sorted.shape
    e = gate_up.data.shape[0]
    n2x = gate_up.out_features
    inter = n2x // 2
    out_dtype = x_sorted.dtype
    gs1 = gate_up.group_size or kdim
    ng1 = kdim // gs1
    gs_dn = down.group_size or inter
    ng2 = inter // gs_dn
    bm = GROUP_BM

    dest, valid, tile_group, mpad = grouped_tile_layout(m, e, group_sizes, bm)
    mtiles = mpad // bm
    x_padded = jnp.zeros((mpad, kdim), x_sorted.dtype).at[dest].set(
        jnp.where(valid[:, None], x_sorted, 0)
    )
    qa, qb, sa, sb, t, xsum = w4a8_prep(x_padded, kdim, gate_up.group_size)
    n_live = jnp.cumsum(
        (group_sizes.astype(jnp.int32) + bm - 1) // bm
    )[-1:].astype(jnp.int32)

    gz1 = gate_up.zeros is not None
    gz2 = down.zeros is not None
    gu_s = gate_up.scales.reshape(e, -1, n2x)
    dn_s = down.scales.reshape(e, -1, kdim)
    ng1p, ng2p = gu_s.shape[1], dn_s.shape[1]
    k2 = kdim // 2
    i2 = inter // 2
    ins = [tile_group, n_live, qa, qb, sa, sb, t, xsum,
           _as_i8(gate_up.data), gu_s]
    in_specs = [
        pl.BlockSpec((bm, k2), lambda i, tg, nl: (i, 0)),
        pl.BlockSpec((bm, k2), lambda i, tg, nl: (i, 0)),
        pl.BlockSpec((bm, ng1), lambda i, tg, nl: (i, 0)),
        pl.BlockSpec((bm, ng1), lambda i, tg, nl: (i, 0)),
        pl.BlockSpec((bm, ng1), lambda i, tg, nl: (i, 0)),
        pl.BlockSpec((bm, ng1), lambda i, tg, nl: (i, 0)),
        pl.BlockSpec((1, k2, n2x), lambda i, tg, nl: (tg[i], 0, 0)),
        pl.BlockSpec((1, ng1p, n2x), lambda i, tg, nl: (tg[i], 0, 0)),
    ]
    if gz1:
        ins.append(gate_up.zeros.reshape(e, -1, n2x))
        in_specs.append(
            pl.BlockSpec((1, ng1p, n2x), lambda i, tg, nl: (tg[i], 0, 0))
        )
    ins += [_as_i8(down.data), dn_s]
    in_specs += [
        pl.BlockSpec((1, i2, kdim), lambda i, tg, nl: (tg[i], 0, 0)),
        pl.BlockSpec((1, ng2p, kdim), lambda i, tg, nl: (tg[i], 0, 0)),
    ]
    if gz2:
        ins.append(down.zeros.reshape(e, -1, kdim))
        in_specs.append(
            pl.BlockSpec((1, ng2p, kdim), lambda i, tg, nl: (tg[i], 0, 0))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(mtiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, kdim), lambda i, tg, nl: (i, 0)),
    )
    y = pl.pallas_call(
        functools.partial(
            _grouped_ffn_kernel, ng1=ng1, gs2_1=gs1 // 2, gz1=gz1,
            ng2=ng2, gs2_2=gs_dn // 2, gz2=gz2, inter=inter, act=act,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mpad, kdim), out_dtype),
        interpret=interpret,
    )(*ins)
    out = jnp.where(valid[:, None], y[dest], 0)
    return out.astype(out_dtype)


def _pick_bm_w4a8(m8: int, k2: int, bn: int, ng: int) -> int:
    """M tile under the scoped-VMEM stack: double-buffered qa/qb planes,
    the w block + per-group decode temps, activation scales, f32 out."""
    bm = min(m8, 512)
    while bm > 8:
        need = (
            2 * 2 * bm * k2          # qa, qb int8, double-buffered
            + 2 * bn * k2            # w block int8, double-buffered
            + 4 * 4 * bm * ng        # sa/sb/t/xsum f32
            + bm * bn * 4            # out f32
            + bn * k2                # per-group decode temps (bounded)
        )
        if need <= _FFN_VMEM_BUDGET:
            break
        # keep bm sublane-aligned: non-power-of-two M (e.g. the fused
        # mixed step's 8+256=264 rows) would otherwise halve to 66
        bm = max(8, (bm // 2 // 8) * 8)
    return bm


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_w4a8_matmul(
    x2: jnp.ndarray,  # [M, K] float — decode M=1 through prefill M=512+
    w: QTensor,  # act_quant int4 kind, [K/2, N]
    interpret: bool = False,
):
    """Dense linear on the int8 MXU. The W4A8 PREFILL path as well as the
    decode one (VERDICT r2 item 2): weights stream as packed int4 bytes at
    int8-MXU rates for any M; the bf16-dequant VPU kernel
    (quant_matmul._int4_kernel) needs [K/2, bn] f32 unpack temps that bust
    scoped VMEM at prefill K. Returns [M, N] x.dtype."""
    m, kdim = x2.shape
    n = w.out_features
    out_dtype = x2.dtype
    gs = w.group_size or kdim
    gs2 = gs // 2
    k2 = kdim // 2
    ng = kdim // gs
    bn = _pick_bn(n, k2)

    m8 = max(8, ((m + 7) // 8) * 8)
    if m8 != m:
        x2 = jnp.pad(x2, ((0, m8 - m), (0, 0)))
    qa, qb, sa, sb, t, xsum = w4a8_prep(x2, kdim, w.group_size)

    bm = _pick_bm_w4a8(m8, k2, bn, ng)
    if m8 % bm:
        pad = bm - m8 % bm
        qa = jnp.pad(qa, ((0, pad), (0, 0)))
        qb = jnp.pad(qb, ((0, pad), (0, 0)))
        sa = jnp.pad(sa, ((0, pad), (0, 0)))
        sb = jnp.pad(sb, ((0, pad), (0, 0)))
        t = jnp.pad(t, ((0, pad), (0, 0)))
        xsum = jnp.pad(xsum, ((0, pad), (0, 0)))
        m8 += pad

    scales = w.scales.reshape(-1, n)  # ng rows, possibly sublane-padded
    ngp = scales.shape[0]
    has_zeros = w.zeros is not None
    ins = [qa, qb, sa, sb, t, xsum, _as_i8(w.data), scales]
    in_specs = [
        pl.BlockSpec((bm, k2), lambda i, j: (i, 0)),
        pl.BlockSpec((bm, k2), lambda i, j: (i, 0)),
        pl.BlockSpec((bm, ng), lambda i, j: (i, 0)),
        pl.BlockSpec((bm, ng), lambda i, j: (i, 0)),
        pl.BlockSpec((bm, ng), lambda i, j: (i, 0)),
        pl.BlockSpec((bm, ng), lambda i, j: (i, 0)),
        pl.BlockSpec((k2, bn), lambda i, j: (0, j)),
        pl.BlockSpec((ngp, bn), lambda i, j: (0, j)),
    ]
    if has_zeros:
        ins.append(w.zeros.reshape(-1, n))
        in_specs.append(pl.BlockSpec((ngp, bn), lambda i, j: (0, j)))
    y = pl.pallas_call(
        functools.partial(
            _dense_w4a8_kernel, n_groups=ng, gs2=gs2, has_zeros=has_zeros
        ),
        grid=(m8 // bm, pl.cdiv(n, bn)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m8, n), jnp.float32),
        interpret=interpret,
    )(*ins)
    return y[:m].astype(out_dtype)
