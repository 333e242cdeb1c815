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
