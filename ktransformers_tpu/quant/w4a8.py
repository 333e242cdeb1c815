"""W4A8 decode path: int4 weights x int8 activations on the int8 MXU.

Why: the fused bf16-dequant kernels (ops/pallas/quant_matmul.py) are
VPU-bound at decode batch sizes — ~14 VPU ops per packed byte caps them at
~340 GB/s on v5e, while int8 weights stream at ~720 GB/s (HBM-bound).
This module is the TPU re-derivation of the reference's AMX-INT8 MoE design
(kt-kernel/operators/amx/moe.hpp: activations are quantized per block so
the AMX tiles run int8 x int8): activations are quantized per (row, scale
group) to int8 and the weights are fed to the MXU as *raw packed bytes*
via a dot identity, cutting in-kernel VPU work to ~1 op/byte.

The identity (measured 630 GB/s vs 338 production, rel err ~8e-3 at
DeepSeek-V2-Lite shapes — scripts/kernel_lab6e.py):

  Repack every packed byte b = (lo_s & 15) | (hi_s << 4) as b' = b ^ 0x08,
  then the int8 bitcast of b' is   braw = 16*hi_s + (lo_s + 8)
  and one VPU op recovers          u    = braw & 15 = lo_s + 8.

  With split activations (split_x_for_int4) a := x_lo - x_hi/16 and
  b := x_hi/16, each int8-quantized per (row, group) on its OWN scale
  (sharing one scale costs 6e-2 rel err — x_hi*hi_s is O(1) of the output):

    a @ u + b @ braw = x_lo*lo_s + x_hi*hi_s + 8*sum(x_lo)

  so two int8 MXU dots per group + one correction term give the int4
  matmul without ever materializing dequantized weights.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ktransformers_tpu.quant.formats import QTensor

W4A8_KINDS = ("int4", "int4_g", "int4_gz")


def _flip(d: jnp.ndarray) -> jnp.ndarray:
    # repacked data is stored ALREADY BITCAST to int8: the kernels feed it
    # straight to int8 MXU dots, and doing the bitcast per decode step
    # inside the jitted forward materializes a full copy of every expert
    # array each step (measured: 224 -> 43 tok/s on the bench model).
    return jax.lax.bitcast_convert_type(d ^ jnp.uint8(8), jnp.int8)


_flip_lo = jax.jit(_flip)
# Donating variant for engine init: packed expert bytes are a large
# fraction of HBM, so the repack must reuse the input buffers — a
# non-donated pass doubles resident expert bytes and OOMs big models.
_flip_lo_donate = jax.jit(_flip, donate_argnums=0)


def repack_offset_lo(qt: QTensor, donate: bool = False) -> QTensor:
    """Offset-lo repack of an int4 QTensor (sets act_quant=True).

    donate=True invalidates qt.data (in-place buffer reuse on device).
    """
    if qt.act_quant or qt.kind not in W4A8_KINDS:
        return qt
    flip = _flip_lo_donate if donate else _flip_lo
    return dataclasses.replace(qt, data=flip(qt.data), act_quant=True)


def enable_w4a8(params, donate: bool = False):
    """Repack every int4-kind QTensor in a params pytree for the w4a8
    kernels. Idempotent; one extra pass over the packed bytes at init."""

    pending = [0]

    def visit(leaf):
        if not isinstance(leaf, QTensor):
            return leaf
        out = repack_offset_lo(leaf, donate=donate)
        if donate and out is not leaf:
            # async dispatch allocates flip outputs ahead of donated frees
            # retiring; barrier periodically so HBM never transiently
            # doubles on big models
            pending[0] += out.data.size
            if pending[0] > 512 * 1024 * 1024:
                jax.block_until_ready(out.data)
                pending[0] = 0
        return out

    return jax.tree.map(
        visit, params, is_leaf=lambda x: isinstance(x, QTensor)
    )


def w4a8_prep(x2: jnp.ndarray, kdim: int, group_size: int):
    """Quantize activations for the w4a8 kernels.

    x2: [M, K] float. Returns (qa, qb int8 [M, K/2], sa, sb f32 [M, ng],
    t f32 [M, ng] = 8*sum_g(x_lo), xsum f32 [M, ng] = sum_g(x) for the
    zero-point correction of _gz kinds).
    """
    from ktransformers_tpu.quant.formats import split_x_for_int4

    m = x2.shape[0]
    gs = group_size or kdim
    ng = kdim // gs
    gs2 = gs // 2
    k2 = kdim // 2
    xl, xh = split_x_for_int4(x2, kdim, group_size)
    xlf = xl.astype(jnp.float32).reshape(m, ng, gs2)
    xhf = xh.astype(jnp.float32).reshape(m, ng, gs2)
    a = xlf - xhf / 16.0
    b = xhf / 16.0

    def q(v):
        amax = jnp.maximum(jnp.max(jnp.abs(v), -1), 1e-8)
        s = amax / 127.0
        codes = jnp.clip(jnp.round(v / s[..., None]), -127, 127)
        return codes.astype(jnp.int8).reshape(m, k2), s

    qa, sa = q(a)
    qb, sb = q(b)
    t = 8.0 * jnp.sum(xlf, axis=-1)
    xsum = jnp.sum(xlf + xhf, axis=-1)
    return qa, qb, sa, sb, t, xsum
