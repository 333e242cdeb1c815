"""custom_vjp rules for the fused dequant-matmul kernels: on-chip SFT runs
at Pallas speed instead of erroring out (pallas_call has no autodiff rule).

Only INPUT gradients are defined — the quantized base weights are frozen
in LoRA SFT (reference: the hand-written fused MoE backward,
kt-kernel/operators/amx/sft_moe.hpp:355, exists for the same reason: the
AMX forward is opaque to autodiff). Weight cotangents are float0 zeros.

The backward contractions run through the transposed fused kernels in
ops/pallas/quant_matmul_t.py, so gradient HBM traffic is the packed bytes
— the same property that makes the forward bandwidth-optimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.ops.pallas.quant_matmul import (
    GROUP_BM,
    gathered_quant_matmul,
    grouped_quant_matmul,
    grouped_tile_layout,
    quant_matmul,
)
from ktransformers_tpu.ops.pallas.quant_matmul_t import (
    grouped_quant_matmul_t,
    quant_matmul_t,
)


# tests on the CPU mesh set this to run the kernels in interpret mode
_INTERPRET = False


def _zero_cot(p):
    """Cotangent for a frozen QTensor leaf: float0 for integer storage."""
    if p is None:
        return None
    if jnp.issubdtype(p.dtype, jnp.floating):
        return jnp.zeros_like(p)
    return np.zeros(p.shape, jax.dtypes.float0)


def _w_cot(w):
    return jax.tree.map(_zero_cot, w)


# --- dense ------------------------------------------------------------------


@jax.custom_vjp
def quant_matmul_diff(x, w):
    return quant_matmul(x, w, interpret=_INTERPRET)


def _qm_fwd(x, w):
    return quant_matmul(x, w, interpret=_INTERPRET), (w,)


_T_KINDS = (
    "int8", "fp8", "int4", "int4_g", "int4_gz", "mxfp4", "mxfp8",
)


def _qm_bwd(res, dy):
    # y.dtype == x.dtype in quant_matmul, so dy carries the right dtype
    (w,) = res
    if w.kind in _T_KINDS:
        dx = quant_matmul_t(dy, w, interpret=_INTERPRET).astype(dy.dtype)
    else:  # pragma: no cover - every Pallas kind has a transposed kernel
        from ktransformers_tpu.quant.formats import dequantize

        dx = (dy.astype(jnp.float32) @ dequantize(w, jnp.float32).T).astype(
            dy.dtype
        )
    return dx, _w_cot(w)


quant_matmul_diff.defvjp(_qm_fwd, _qm_bwd)


# --- grouped (prefill / training MoE) ----------------------------------------


@jax.custom_vjp
def grouped_quant_matmul_diff(x_sorted, w, group_sizes):
    return grouped_quant_matmul(x_sorted, w, group_sizes, interpret=_INTERPRET)


def _gmm_fwd(x_sorted, w, group_sizes):
    y = grouped_quant_matmul(x_sorted, w, group_sizes, interpret=_INTERPRET)
    return y, (w, group_sizes)


def _gmm_bwd(res, dy):
    w, group_sizes = res
    m = dy.shape[0]  # same row count as x_sorted
    e = w.data.shape[0]
    if w.kind not in _T_KINDS:
        # MX kinds: XLA ragged fallback (transposed MX kernel = follow-up)
        from ktransformers_tpu.quant.formats import dequantize

        wd_t = dequantize(w, jnp.bfloat16).transpose(0, 2, 1)  # [E, N, K]
        dx = jax.lax.ragged_dot(
            dy.astype(jnp.bfloat16), wd_t, group_sizes.astype(jnp.int32),
            preferred_element_type=jnp.float32,
        ).astype(dy.dtype)
        return (
            dx, _w_cot(w), np.zeros(group_sizes.shape, jax.dtypes.float0)
        )
    # rebuild the forward's tile layout (deterministic in group_sizes) and
    # run the transposed grouped kernel over expert-aligned dy tiles
    dest, valid, tile_group, mpad = grouped_tile_layout(
        m, e, group_sizes, GROUP_BM
    )
    dy_tiles = jnp.zeros((mpad, dy.shape[-1]), dy.dtype).at[dest].set(
        jnp.where(valid[:, None], dy, 0)
    )
    dx_tiles = grouped_quant_matmul_t(
        dy_tiles, w, tile_group, bm=GROUP_BM, interpret=_INTERPRET
    )
    dx = jnp.where(valid[:, None], dx_tiles[dest], 0.0).astype(dy.dtype)
    return dx, _w_cot(w), np.zeros(group_sizes.shape, jax.dtypes.float0)


grouped_quant_matmul_diff.defvjp(_gmm_fwd, _gmm_bwd)


# --- gathered (decode MoE) ----------------------------------------------------


@jax.custom_vjp
def gathered_quant_matmul_diff(x_rows, w, ids):
    return gathered_quant_matmul(x_rows, w, ids, interpret=_INTERPRET)


def _gather_fwd(x_rows, w, ids):
    return (
        gathered_quant_matmul(x_rows, w, ids, interpret=_INTERPRET),
        (w, ids),
    )


def _gather_bwd(res, dy):
    w, ids = res
    r = ids.shape[0]
    e = w.data.shape[0]
    # sort rows by expert so the grouped transposed kernel applies, then
    # un-sort the gradients
    order = jnp.argsort(ids)
    sizes = jnp.bincount(ids, length=e).astype(jnp.int32)
    dy_sorted = dy[order]
    if w.kind not in _T_KINDS:
        from ktransformers_tpu.quant.formats import dequantize

        wd_t = dequantize(w, jnp.bfloat16).transpose(0, 2, 1)
        dxs = jax.lax.ragged_dot(
            dy_sorted.astype(jnp.bfloat16), wd_t, sizes,
            preferred_element_type=jnp.float32,
        )
        dx = jnp.zeros_like(dxs).at[order].set(dxs).astype(dy.dtype)
        return dx, _w_cot(w), jnp.zeros(ids.shape, jax.dtypes.float0)
    dest, valid, tile_group, mpad = grouped_tile_layout(
        r, e, sizes, GROUP_BM
    )
    dy_tiles = jnp.zeros((mpad, dy.shape[-1]), dy.dtype).at[dest].set(
        jnp.where(valid[:, None], dy_sorted, 0)
    )
    dx_tiles = grouped_quant_matmul_t(
        dy_tiles, w, tile_group, bm=GROUP_BM, interpret=_INTERPRET
    )
    dx_sorted = dx_tiles[dest]
    dx = (
        jnp.zeros_like(dx_sorted).at[order].set(dx_sorted).astype(dy.dtype)
    )
    return dx, _w_cot(w), jnp.zeros(ids.shape, jax.dtypes.float0)


gathered_quant_matmul_diff.defvjp(_gather_fwd, _gather_bwd)


# --- fused FFN kernels (prefill grouped / dense shared) -----------------------
#
# Forward runs the one-launch fused kernel; backward REMATERIALIZES the
# unfused composition (grouped/dense diff matmuls + GLU) and pulls dy
# through it, so gradients ride the transposed fused kernels like every
# other path. The forward's in-kernel activation re-quant and the
# backward's out-of-kernel re-quant differ by bf16 rounding — the same
# W4A8 approximation class as the rest of the frozen-base SFT path.


def _glu_f32(h, inter, act):
    g = h[..., :inter].astype(jnp.float32)
    u = h[..., inter:].astype(jnp.float32)
    if act == "silu":
        return g * jax.nn.sigmoid(g) * u
    if act == "relu":
        return jnp.maximum(g, 0.0) * u
    if act == "gelu":
        return 0.5 * g * (1.0 + jax.lax.erf(g / 2.0**0.5)) * u
    raise ValueError(act)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def grouped_w4a8_ffn_diff(x_sorted, gate_up, down, group_sizes, act):
    from ktransformers_tpu.ops.pallas.w4a8_matmul import grouped_w4a8_ffn

    return grouped_w4a8_ffn(x_sorted, gate_up, down, group_sizes, act=act,
                            interpret=_INTERPRET)


def _gffn_fwd(x_sorted, gate_up, down, group_sizes, act):
    y = grouped_w4a8_ffn_diff(x_sorted, gate_up, down, group_sizes, act)
    return y, (x_sorted, gate_up, down, group_sizes)


def _gffn_bwd(act, res, dy):
    x_sorted, gate_up, down, group_sizes = res
    inter = gate_up.out_features // 2

    def ref(x):
        h = grouped_quant_matmul_diff(x, gate_up, group_sizes)
        a = _glu_f32(h, inter, act).astype(x.dtype)
        return grouped_quant_matmul_diff(a, down, group_sizes)

    _, pull = jax.vjp(ref, x_sorted)
    (dx,) = pull(dy)
    return (
        dx.astype(dy.dtype), _w_cot(gate_up), _w_cot(down),
        np.zeros(group_sizes.shape, jax.dtypes.float0),
    )


grouped_w4a8_ffn_diff.defvjp(_gffn_fwd, _gffn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dense_w4a8_ffn_diff(x2, gate_up, down, act, bc):
    from ktransformers_tpu.ops.pallas.w4a8_matmul import dense_w4a8_ffn

    return dense_w4a8_ffn(x2, gate_up, down, act=act, bc=bc,
                          interpret=_INTERPRET)


def _dffn_fwd(x2, gate_up, down, act, bc):
    y = dense_w4a8_ffn_diff(x2, gate_up, down, act, bc)
    return y, (x2, gate_up, down)


def _dffn_bwd(act, bc, res, dy):
    x2, gate_up, down = res
    inter = gate_up.out_features // 2

    def ref(x):
        h = quant_matmul_diff(x, gate_up)
        a = _glu_f32(h, inter, act).astype(x.dtype)
        return quant_matmul_diff(a, down)

    _, pull = jax.vjp(ref, x2)
    (dx,) = pull(dy)
    return dx.astype(dy.dtype), _w_cot(gate_up), _w_cot(down)


dense_w4a8_ffn_diff.defvjp(_dffn_fwd, _dffn_bwd)
