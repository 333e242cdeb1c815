"""Fused MLA decode attention (Pallas): online-softmax over KV blocks with
length-clamped fetches.

The TPU analog of the reference's decode attention kernels
(custom_flashinfer BatchMLAPagedAttentionWrapper + the Triton 2-stage
grouped decode kernel, archive/ktransformers/operators/
triton_attention.py:16-358): one query token per sequence attends over the
compressed (ckv + k_pe) cache. Compared to the XLA path this fuses the two
score matmuls, masking, softmax, and the value contraction into one VMEM
pass, and — via the scalar-prefetched lengths — *clamps block fetches* at
each sequence's true length, so HBM traffic scales with the actual context
(the flash-decode property), not the padded cache size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    lens_ref,  # scalar prefetch [B]
    qn_ref,  # (1, H, R)
    qp_ref,  # (1, H, Dr)
    ckv_ref,  # (1, bs, R)
    kpe_ref,  # (1, bs, Dr)
    o_ref,  # (1, H, R)
    m_sc,  # (H, 128) f32
    l_sc,  # (H, 128) f32
    acc_sc,  # (H, R) f32
    *,
    scale: float,
    bs: int,
    n_s: int,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    length = lens_ref[b]

    @pl.when(s == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    @pl.when(s * bs < length)
    def _():
        qn = qn_ref[0].astype(jnp.float32)  # [H, R]
        qp = qp_ref[0].astype(jnp.float32)  # [H, Dr]
        ckv = ckv_ref[0].astype(jnp.float32)  # [bs, R]
        kpe = kpe_ref[0].astype(jnp.float32)  # [bs, Dr]
        # zero rows past the valid length: boundary blocks may be padded
        # with undefined values, and 0 * NaN would poison the accumulator
        row_pos = s * bs + jax.lax.broadcasted_iota(
            jnp.int32, (ckv.shape[0], 1), 0
        )
        row_valid = row_pos < length
        ckv = jnp.where(row_valid, ckv, 0.0)
        kpe = jnp.where(row_valid, kpe, 0.0)
        scores = (
            jax.lax.dot_general(
                qn, ckv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                qp, kpe, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ) * scale  # [H, bs]
        kpos = s * bs + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1
        )
        scores = jnp.where(kpos < length, scores, NEG_INF)

        m_prev = m_sc[:, :1]  # [H, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)  # [H, bs]
        corr = jnp.exp(m_prev - m_new)  # [H, 1]
        l_sc[:, :1] = l_sc[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_sc[:] = acc_sc[:] * corr + jnp.dot(
            p, ckv, preferred_element_type=jnp.float32
        )
        m_sc[:, :1] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[0] = (
            acc_sc[:] / jnp.maximum(l_sc[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_s", "scale")
)
def mla_decode_attention(
    q_nope_eff: jnp.ndarray,  # [B, H, R]
    q_pe: jnp.ndarray,  # [B, H, Dr]
    ckv: jnp.ndarray,  # [B, Smax, R]
    kpe: jnp.ndarray,  # [B, Smax, Dr]
    lengths: jnp.ndarray,  # [B] valid kv length per sequence (incl. current)
    scale: float,
    block_s: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, R] attention output in the compressed space."""
    b, h, r = q_nope_eff.shape
    smax = ckv.shape[1]
    dr = q_pe.shape[-1]
    bs = min(block_s, smax)
    n_s = pl.cdiv(smax, bs)

    def clamp(sidx, lens):
        # last block that still contains valid tokens for this sequence
        vb = jnp.maximum((lens + bs - 1) // bs - 1, 0)
        return vb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec((1, h, r), lambda i, s, L: (i, 0, 0)),
            pl.BlockSpec((1, h, dr), lambda i, s, L: (i, 0, 0)),
            pl.BlockSpec(
                (1, bs, r),
                lambda i, s, L: (i, jnp.minimum(s, clamp(s, L[i])), 0),
            ),
            pl.BlockSpec(
                (1, bs, dr),
                lambda i, s, L: (i, jnp.minimum(s, clamp(s, L[i])), 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, h, r), lambda i, s, L: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, r), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, bs=bs, n_s=n_s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, r), q_nope_eff.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q_nope_eff, q_pe, ckv, kpe)
