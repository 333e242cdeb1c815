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


def _fused_kernel(
    lens_ref,   # scalar prefetch [B] — OLD cached length p (current pos)
    qn_ref,     # (1, H, R) absorbed query q_nope @ w_uk (computed outside:
                # XLA runs that einsum at ~SOL; keeping w_uk out of the
                # kernel also avoids its per-step layout copy — r3 profile)
    qp_ref,     # (1, H, dr) RAW rope-part query (pre-rotation)
    kvraw_ref,  # (1, 1, R+Dr) raw kv_a projection (pre-norm, pre-rope)
    gamma_ref,  # (1, R) kv_a_norm weight
    rot_ref,    # (1, dr, dr) rope rotation matrix at position p
    ckv_ref,    # (1, bs, R) cache block (OLD contents)
    kpe_ref,    # (1, bs, dr)
    o_ref,      # (1, H, R) attention context (pre-w_uv)
    ckvn_ref,   # (1, 1, R) normed current ckv (for the cache write outside)
    kpen_ref,   # (1, 1, dr) roped current k_pe
    m_sc, l_sc, acc_sc, qp_sc,
    *,
    scale: float,
    eps: float,
    bs: int,
    n_s: int,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    length = lens_ref[b]  # tokens already cached (current token excluded)

    @pl.when(s == 0)
    def _():
        rot = rot_ref[0].astype(jnp.float32)  # [dr, dr]
        qp = jnp.dot(
            qp_ref[0].astype(jnp.float32), rot,
            preferred_element_type=jnp.float32,
        )  # [H, dr]
        kvraw = kvraw_ref[0].astype(jnp.float32)  # [1, R+Dr]
        r = gamma_ref.shape[-1]
        ckv_raw = kvraw[:, :r]
        ms = jnp.mean(ckv_raw * ckv_raw, axis=-1, keepdims=True)
        ckv_new = (
            ckv_raw * jax.lax.rsqrt(ms + eps) * gamma_ref[:].astype(jnp.float32)
        )  # [1, R]
        # M=1 dot padded to 8 sublanes (Mosaic matmul constraint)
        kpe8 = jnp.broadcast_to(kvraw[:, r:], (8, rot.shape[-1]))
        kpe_new = jnp.dot(
            kpe8, rot, preferred_element_type=jnp.float32
        )[:1]  # [1, dr]
        ckvn_ref[0] = ckv_new.astype(ckvn_ref.dtype)
        kpen_ref[0] = kpe_new.astype(kpen_ref.dtype)
        qp_sc[:] = qp
        # fold the CURRENT token in immediately: the cache blocks hold only
        # the p previous tokens; softmax runs over p+1 keys. Elementwise
        # mul+reduce, not an N=1 dot.
        qn = qn_ref[0].astype(jnp.float32)
        s_cur = (
            jnp.sum(qn * ckv_new, axis=-1, keepdims=True)
            + jnp.sum(qp * kpe_new, axis=-1, keepdims=True)
        ) * scale  # [H, 1]
        m_sc[:] = jnp.broadcast_to(s_cur, m_sc.shape)
        l_sc[:] = jnp.ones_like(l_sc)
        acc_sc[:] = jnp.broadcast_to(ckv_new, acc_sc.shape)

    @pl.when(s * bs < length)
    def _():
        ckv = ckv_ref[0].astype(jnp.float32)  # [bs, R]
        kpe = kpe_ref[0].astype(jnp.float32)  # [bs, dr]
        row_pos = s * bs + jax.lax.broadcasted_iota(
            jnp.int32, (ckv.shape[0], 1), 0
        )
        row_valid = row_pos < length
        ckv = jnp.where(row_valid, ckv, 0.0)
        kpe = jnp.where(row_valid, kpe, 0.0)
        scores = (
            jax.lax.dot_general(
                qn_ref[0].astype(jnp.float32), ckv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                qp_sc[:], kpe, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ) * scale  # [H, bs]
        kpos = s * bs + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(kpos < length, scores, NEG_INF)

        m_prev = m_sc[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_sc[:, :1] = l_sc[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_sc[:] = acc_sc[:] * corr + jnp.dot(
            p, ckv, preferred_element_type=jnp.float32
        )
        m_sc[:, :1] = m_new

    @pl.when(s == n_s - 1)
    def _():
        ctx = acc_sc[:] / jnp.maximum(l_sc[:, :1], 1e-30)  # [H, R]
        o_ref[0] = ctx.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_s", "scale", "eps")
)
def mla_decode_fused(
    qn_eff: jnp.ndarray,     # [B, H, R] absorbed query (q_nope @ w_uk)
    qp_raw: jnp.ndarray,     # [B, H, dr] rope-part query, NOT yet rotated
    ckv_kpe: jnp.ndarray,    # [B, 1, R+Dr] raw kv_a projection
    gamma: jnp.ndarray,      # [R] kv_a_norm weight
    rot: jnp.ndarray,        # [B, dr, dr] rope rotation matrix at position p
    ckv: jnp.ndarray,        # [B, Smax, R] cache, OLD contents
    kpe: jnp.ndarray,        # [B, Smax, Dr]
    lengths: jnp.ndarray,    # [B] cached length p (current token excluded)
    scale: float,
    eps: float,
    block_s: int = 512,
    interpret: bool = False,
):
    """MLA decode attention fused with the current token\'s KV path: kv_a
    rms-norm, rope for q_pe and k_pe (as an exact [dr, dr] rotation matmul
    — sidesteps Mosaic\'s strided-lane cost for interleaved layouts), flash
    attention over the cached blocks PLUS the current token, in ONE launch.

    Replaces the per-layer XLA chain [kv norm, 2x rope, cache-write-then-
    read ordering] and lets the cache dus overlap with attention (the
    caller writes the returned ckv_new/kpe_new — independent of the
    attention output). The absorbed einsums (q@w_uk, ctx@w_uv) stay
    outside: XLA runs them at ~SOL and keeping the mats out of the kernel
    avoids their per-step layout copies (r3 profile).

    Returns (ctx [B, H, R], ckv_new [B, 1, R], kpe_new [B, 1, Dr]).
    Reference role: the fused decode attention of
    archive/ktransformers/operators/triton_attention.py +
    flashinfer BatchMLAPagedAttentionWrapper.
    """
    b, h, r = qn_eff.shape
    dr = qp_raw.shape[-1]
    smax = ckv.shape[1]
    bs = min(block_s, smax)
    n_s = pl.cdiv(smax, bs)

    def clamp(lens):
        return jnp.maximum((lens + bs - 1) // bs - 1, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec((1, h, r), lambda i, s, L: (i, 0, 0)),
            pl.BlockSpec((1, h, dr), lambda i, s, L: (i, 0, 0)),
            pl.BlockSpec((1, 1, r + dr), lambda i, s, L: (i, 0, 0)),
            pl.BlockSpec((1, r), lambda i, s, L: (0, 0)),
            pl.BlockSpec((1, dr, dr), lambda i, s, L: (i, 0, 0)),
            pl.BlockSpec(
                (1, bs, r),
                lambda i, s, L: (i, jnp.minimum(s, clamp(L[i])), 0),
            ),
            pl.BlockSpec(
                (1, bs, dr),
                lambda i, s, L: (i, jnp.minimum(s, clamp(L[i])), 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, h, r), lambda i, s, L: (i, 0, 0)),
            pl.BlockSpec((1, 1, r), lambda i, s, L: (i, 0, 0)),
            pl.BlockSpec((1, 1, dr), lambda i, s, L: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, r), jnp.float32),
            pltpu.VMEM((h, dr), jnp.float32),
        ],
    )
    ctx, ckv_new, kpe_new = pl.pallas_call(
        functools.partial(
            _fused_kernel, scale=scale, eps=eps, bs=bs, n_s=n_s
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, r), qn_eff.dtype),
            jax.ShapeDtypeStruct((b, 1, r), ckv.dtype),
            jax.ShapeDtypeStruct((b, 1, dr), kpe.dtype),
        ],
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        qn_eff,
        qp_raw,
        ckv_kpe,
        gamma.reshape(1, r),
        rot,
        ckv,
        kpe,
    )
    return ctx, ckv_new, kpe_new


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
