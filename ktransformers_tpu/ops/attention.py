"""Attention ops: MLA (with matrix absorption) and GQA/MHA, cached decode.

TPU re-design of the reference attention stack:
- KDeepseekV2Attention matrix absorption (archive/ktransformers/operators/
  attention.py:69-196 `get_absorbed`): kv_b_proj is split into W_uk
  [heads, qk_nope, r] and W_uv [heads, r, v_dim]; decode attends in the
  compressed (ckv r=512 + k_pe 64) space so the KV cache stores r+64 floats
  per token instead of heads*(nope+rope+v).
- custom_flashinfer MLA paged decode + Triton 2-stage decode kernel
  (operators/triton_attention.py) -> here one jnp formulation that XLA maps
  to MXU batched matmuls; the Pallas flash/paged variants plug in behind the
  same signatures (ops/pallas/).
- GQA paths (KQwen2/3MoeAttention, balance_serve_attention.py).

Softmax is always float32. Causal masking uses position arithmetic, no
materialized [S, S] bool tensors beyond the f32 additive mask XLA fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# Pallas fused MLA decode kernel, registered by ops.pallas.enable().
_PALLAS_MLA_DECODE = None

# Whole-attention fused decode kernel (norm + rope + absorb einsums +
# flash + current token in ONE launch, ops/pallas/mla_decode.mla_decode_fused)
_PALLAS_MLA_FUSED = None


def set_pallas_mla_decode(fn) -> None:
    global _PALLAS_MLA_DECODE
    _PALLAS_MLA_DECODE = fn


def set_pallas_mla_fused(fn) -> None:
    global _PALLAS_MLA_FUSED
    _PALLAS_MLA_FUSED = fn


def mla_fused_hook():
    return _PALLAS_MLA_FUSED


def mla_decode(q_nope_eff, q_pe, ckv, kpe, lengths, *, scale):
    """Single-token MLA attention [B,H,1,R]-shaped inputs squeezed to
    [B,H,R]; uses the fused Pallas kernel when registered, else the dense
    path with a mask."""
    if _PALLAS_MLA_DECODE is not None:
        return _PALLAS_MLA_DECODE(
            q_nope_eff[:, :, 0], q_pe[:, :, 0], ckv, kpe, lengths, scale
        )[:, :, None]
    kpos = jnp.arange(ckv.shape[1])[None, None, :]
    mask = jnp.where(
        kpos < lengths[:, None, None], 0.0, NEG_INF
    ).astype(jnp.float32)
    return mla_absorbed(q_nope_eff, q_pe, ckv, kpe, scale=scale, mask=mask)


def _softmax(scores: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jax.nn.softmax(scores.astype(jnp.float32), axis=axis)


def causal_mask(q_len: int, kv_len: int, q_offset) -> jnp.ndarray:
    """Additive f32 mask [q_len, kv_len]; query i (at absolute position
    q_offset + i) may attend to kv positions <= q_offset + i."""
    qpos = q_offset + jnp.arange(q_len)[:, None]
    kpos = jnp.arange(kv_len)[None, :]
    return jnp.where(kpos <= qpos, 0.0, NEG_INF).astype(jnp.float32)


def length_mask(kv_len_valid, kv_len: int) -> jnp.ndarray:
    """Additive f32 mask [kv_len] hiding cache slots >= kv_len_valid."""
    kpos = jnp.arange(kv_len)
    return jnp.where(kpos < kv_len_valid, 0.0, NEG_INF).astype(jnp.float32)


def mha(
    q: jnp.ndarray,  # [B, H, Sq, D]
    k: jnp.ndarray,  # [B, Hkv, Skv, D]
    v: jnp.ndarray,  # [B, Hkv, Skv, Dv]
    *,
    scale: float,
    mask: jnp.ndarray | None = None,  # additive, broadcastable to [B,H,Sq,Skv]
) -> jnp.ndarray:
    """Dense attention with GQA head-group broadcast. Returns [B, H, Sq, Dv]."""
    b, h, sq, d = q.shape
    hkv = k.shape[1]
    if hkv != h:
        assert h % hkv == 0
        group = h // hkv
        qg = q.reshape(b, hkv, group, sq, d)
        scores = jnp.einsum(
            "bkgqd,bksd->bkgqs", qg.astype(jnp.float32), k.astype(jnp.float32)
        )
        scores = scores * scale
        if mask is not None:
            if mask.ndim == 2:
                mask = mask[None]
            scores = scores + mask[:, None, None]
        probs = _softmax(scores)
        out = jnp.einsum("bkgqs,bksd->bkgqd", probs, v.astype(jnp.float32))
        return out.reshape(b, h, sq, v.shape[-1]).astype(q.dtype)
    scores = (
        jnp.einsum("bhqd,bhsd->bhqs", q.astype(jnp.float32), k.astype(jnp.float32))
        * scale
    )
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None, None]
        elif mask.ndim == 3:
            mask = mask[:, None]
        scores = scores + mask
    probs = _softmax(scores)
    out = jnp.einsum("bhqs,bhsd->bhqd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def mla_absorbed(
    q_nope_eff: jnp.ndarray,  # [B, H, Sq, R]   (q_nope @ W_uk)
    q_pe: jnp.ndarray,  # [B, H, Sq, Dr]  (rope'd)
    ckv: jnp.ndarray,  # [B, Skv, R]     compressed kv cache (post-norm)
    k_pe: jnp.ndarray,  # [B, Skv, Dr]    rope'd shared key
    *,
    scale: float,
    mask: jnp.ndarray | None = None,  # additive [B, Sq, Skv] or [Sq, Skv]
) -> jnp.ndarray:
    """MLA attention in the compressed space. Returns [B, H, Sq, R]; caller
    applies W_uv ([H, R, Dv]) to get values, then o_proj.

    score[h, q, s] = (q_nope_eff[h,q] . ckv[s] + q_pe[h,q] . k_pe[s]) * scale
    out[h, q]      = sum_s softmax(score)[h,q,s] * ckv[s]
    """
    qn = q_nope_eff.astype(jnp.float32)
    qp = q_pe.astype(jnp.float32)
    c = ckv.astype(jnp.float32)
    kp = k_pe.astype(jnp.float32)
    scores = jnp.einsum("bhqr,bsr->bhqs", qn, c) + jnp.einsum(
        "bhqd,bsd->bhqs", qp, kp
    )
    scores = scores * scale
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None]
        scores = scores + mask[:, None]
    probs = _softmax(scores)
    out = jnp.einsum("bhqs,bsr->bhqr", probs, c)
    return out.astype(q_nope_eff.dtype)


BLOCKWISE_KV_THRESHOLD = 8192


def mla_absorbed_blockwise(
    q_nope_eff: jnp.ndarray,  # [B, H, Sq, R]
    q_pe: jnp.ndarray,  # [B, H, Sq, Dr]
    ckv: jnp.ndarray,  # [B, Skv, R]
    k_pe: jnp.ndarray,  # [B, Skv, Dr]
    q_positions: jnp.ndarray,  # [B, Sq] absolute positions
    *,
    scale: float,
    block_size: int = 2048,
) -> jnp.ndarray:
    """Online-softmax (flash-style) MLA attention over KV blocks.

    Replaces the materialized [B, H, Sq, Skv] score tensor with a
    `lax.scan` over KV blocks — the long-context path (reference: chunked
    prefill + absorbed MLA reach 139K in 24GB, doc/en/
    DeepseekR1_V3_tutorial.md:190-200; here memory is O(block) regardless
    of context). Exactly equals mla_absorbed for any Skv.
    """
    b, h, sq, r = q_nope_eff.shape
    skv = ckv.shape[1]
    nb = -(-skv // block_size)
    pad = nb * block_size - skv
    if pad:
        ckv = jnp.pad(ckv, ((0, 0), (0, pad), (0, 0)))
        k_pe = jnp.pad(k_pe, ((0, 0), (0, pad), (0, 0)))
    ckv_b = ckv.reshape(b, nb, block_size, r).transpose(1, 0, 2, 3)
    kpe_b = k_pe.reshape(b, nb, block_size, -1).transpose(1, 0, 2, 3)

    qn = q_nope_eff.astype(jnp.float32)
    qp = q_pe.astype(jnp.float32)
    qpos = q_positions[:, None, :, None].astype(jnp.int32)  # [B,1,Sq,1]

    def body(carry, blk):
        m, l, acc = carry
        c_blk, p_blk, idx = blk
        cf = c_blk.astype(jnp.float32)
        pf = p_blk.astype(jnp.float32)
        scores = (
            jnp.einsum("bhqr,bsr->bhqs", qn, cf)
            + jnp.einsum("bhqd,bsd->bhqs", qp, pf)
        ) * scale
        kpos = idx * block_size + jnp.arange(block_size)
        scores = jnp.where(kpos[None, None, None, :] <= qpos, scores, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        p = jnp.exp(scores - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum("bhqs,bsr->bhqr", p, cf)
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b, h, sq), NEG_INF, jnp.float32),
        jnp.zeros((b, h, sq), jnp.float32),
        jnp.zeros((b, h, sq, r), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(
        body, init, (ckv_b, kpe_b, jnp.arange(nb))
    )
    out = acc / jnp.maximum(l[..., None], 1e-30)
    return out.astype(q_nope_eff.dtype)


def mha_blockwise(
    q: jnp.ndarray,  # [B, H, Sq, D]
    k: jnp.ndarray,  # [B, Hkv, Skv, D]
    v: jnp.ndarray,  # [B, Hkv, Skv, D]
    q_positions: jnp.ndarray,  # [B, Sq]
    *,
    scale: float,
    block_size: int = 2048,
) -> jnp.ndarray:
    """Online-softmax GQA attention over KV blocks (causal by position)."""
    b, h, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    group = h // hkv
    nb = -(-skv // block_size)
    pad = nb * block_size - skv
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kb = k.reshape(b, hkv, nb, block_size, d).transpose(2, 0, 1, 3, 4)
    vb = v.reshape(b, hkv, nb, block_size, -1).transpose(2, 0, 1, 3, 4)
    dv = v.shape[-1]

    qg = q.reshape(b, hkv, group, sq, d).astype(jnp.float32)
    qpos = q_positions[:, None, None, :, None].astype(jnp.int32)

    def body(carry, blk):
        m, l, acc = carry
        k_blk, v_blk, idx = blk
        kf = k_blk.astype(jnp.float32)
        vf = v_blk.astype(jnp.float32)
        scores = jnp.einsum("bkgqd,bksd->bkgqs", qg, kf) * scale
        kpos = idx * block_size + jnp.arange(block_size)
        scores = jnp.where(
            kpos[None, None, None, None, :] <= qpos, scores, NEG_INF
        )
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        p = jnp.exp(scores - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bkgqs,bksd->bkgqd", p, vf
        )
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b, hkv, group, sq), NEG_INF, jnp.float32),
        jnp.zeros((b, hkv, group, sq), jnp.float32),
        jnp.zeros((b, hkv, group, sq, dv), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, (kb, vb, jnp.arange(nb)))
    out = acc / jnp.maximum(l[..., None], 1e-30)
    return out.reshape(b, h, sq, dv).astype(q.dtype)


def absorb_kv_b_proj(
    kv_b_proj: jnp.ndarray,  # [R, H*(nope+v)] dense (dequantized)
    num_heads: int,
    qk_nope_head_dim: int,
    v_head_dim: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Split kv_b_proj into the two absorbed matrices.

    Returns (w_uk [H, nope, R], w_uv [H, R, v_dim]). Mirrors `get_absorbed`
    (archive/ktransformers/operators/attention.py:69-75) without the torch
    module bookkeeping.
    """
    r = kv_b_proj.shape[0]
    w = kv_b_proj.reshape(r, num_heads, qk_nope_head_dim + v_head_dim)
    w_uk = w[:, :, :qk_nope_head_dim].transpose(1, 2, 0)  # [H, nope, R]
    w_uv = w[:, :, qk_nope_head_dim:].transpose(1, 0, 2)  # [H, R, v]
    return w_uk, w_uv
