"""Gated DeltaNet linear attention (Qwen3-Next's hybrid layers).

The reference serves Qwen3-Next through fla/causal-conv1d CUDA kernels
(archive/ktransformers/models/modeling_qwen3_next.py,
custom_modeling_qwen3_next.py); here the same math is expressed as XLA
primitives: a depthwise causal conv (K static shifts), l2-normed q/k, and
the gated delta-rule recurrence

    S_t = exp(g_t) * S_{t-1}
    S_t = S_t + k_t (beta_t * (v_t - S_t^T k_t))^T
    o_t = S_t^T q_t

run as a `lax.scan` over time for prefill and a single step for decode.
State per layer is O(1) in context: conv tail [B, C, K] plus the
[B, Hv, dk, dv] recurrent matrix — this is the whole point of the hybrid
design (3/4 of layers pay no KV growth).

Weights are pre-permuted at load time (models/loading.py) into the clean
[q | k | v | z] column order so runtime splits are contiguous (the HF
checkpoint interleaves them per key-head group)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LinearAttentionSpec:
    num_v_heads: int
    num_k_heads: int
    head_k_dim: int
    head_v_dim: int
    conv_kernel: int = 4

    @property
    def key_dim(self) -> int:
        return self.num_k_heads * self.head_k_dim

    @property
    def value_dim(self) -> int:
        return self.num_v_heads * self.head_v_dim

    @property
    def conv_dim(self) -> int:
        return 2 * self.key_dim + self.value_dim


def _l2norm(x, eps=1e-6):
    x = x.astype(jnp.float32)
    return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + eps)


def causal_conv(x, weight, conv_state=None, valid=None):
    """Depthwise causal conv + silu. x [B, S, C]; weight [C, K];
    conv_state [B, K, C] (the K inputs before this chunk) or None (zeros).
    valid [B] int32 (optional): rows t >= valid[b] are padding (bucketed
    prefill chunks) — the new state holds the last K inputs BEFORE the
    padding. Returns (y [B, S, C], new_state [B, K, C])."""
    b, s, c = x.shape
    k = weight.shape[1]
    if conv_state is None:
        conv_state = jnp.zeros((b, k, c), x.dtype)
    full = jnp.concatenate([conv_state, x], 1)  # [B, K+S, C]
    ext = full[:, 1:]  # [B, S+K-1, C]
    y = jnp.zeros((b, s, c), jnp.float32)
    for j in range(k):
        y = y + ext[:, j : j + s].astype(jnp.float32) * weight[:, j].astype(
            jnp.float32
        )
    if valid is None:
        new_state = full[:, -k:]
    else:
        # last K valid inputs: full position (valid[b] + j) == x[valid-K+j]
        idx = valid[:, None] + jnp.arange(k)[None, :]  # [B, K]
        new_state = jnp.take_along_axis(full, idx[:, :, None], axis=1)
    return jax.nn.silu(y).astype(x.dtype), new_state


def gated_delta_scan(q, k, v, g, beta, state=None, valid=None):
    """q,k [B, S, Hv, dk] (already repeated to v heads), v [B, S, Hv, dv],
    g/beta [B, S, Hv]; state [B, Hv, dk, dv] f32 or None; valid [B] int32
    (optional): steps t >= valid[b] leave row b's state untouched.
    Returns (out [B, S, Hv, dv] f32, final state). Matches HF's
    torch_recurrent_gated_delta_rule with use_qk_l2norm_in_kernel=True."""
    b, s, h, dk = q.shape
    dv = v.shape[-1]
    scale = dk**-0.5
    q = _l2norm(q) * scale
    k = _l2norm(k)
    v = v.astype(jnp.float32)
    g = g.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    if state is None:
        state = jnp.zeros((b, h, dk, dv), jnp.float32)
    mask = None
    if valid is not None:
        mask = (
            jnp.arange(s)[None, :] < valid[:, None]
        ).astype(jnp.float32)  # [B, S]

    def step(st, inp):
        q_t, k_t, v_t, g_t, b_t, m_t = inp
        new = st * jnp.exp(g_t)[:, :, None, None]
        kv_mem = jnp.einsum("bhkv,bhk->bhv", new, k_t)
        delta = (v_t - kv_mem) * b_t[:, :, None]
        new = new + k_t[..., None] * delta[:, :, None, :]
        out = jnp.einsum("bhkv,bhk->bhv", new, q_t)
        if m_t is not None:
            new = jnp.where(m_t[:, None, None, None] > 0, new, st)
        return new, out

    xs = tuple(
        jnp.moveaxis(a, 1, 0) for a in (q, k, v, g, beta)
    )  # time-major
    if mask is None:
        state, outs = jax.lax.scan(
            lambda st, inp: step(st, inp + (None,)), state, xs
        )
    else:
        state, outs = jax.lax.scan(
            step, state, xs + (jnp.moveaxis(mask, 1, 0),)
        )
    return jnp.moveaxis(outs, 0, 1), state


def gated_delta_net(
    p: dict,       # layer params (see models/loading.py qwen3_next)
    spec: LinearAttentionSpec,
    x,             # [B, S, H]
    conv_state,    # [B, K, conv_dim] or None
    rec_state,     # [B, Hv, dk, dv] f32 or None
    rms_eps: float = 1e-6,
    valid=None,    # [B] int32: rows t >= valid[b] are padding (bucketed
    # serving prefill chunks) — they leave both states untouched
):
    """Full GatedDeltaNet block: projections + conv + delta rule + gated
    norm + out projection. Returns (y [B, S, H], conv_state, rec_state)."""
    from ktransformers_tpu.ops.linear import linear
    from ktransformers_tpu.ops.norm import rms_norm

    b, s, _ = x.shape
    hv, hk = spec.num_v_heads, spec.num_k_heads
    dk, dv = spec.head_k_dim, spec.head_v_dim
    r = hv // hk

    if valid is not None:
        # zero padded inputs so garbage can't reach the conv window
        x = x * (jnp.arange(s)[None, :] < valid[:, None])[..., None].astype(
            x.dtype
        )
    qkvz = linear(x, p["in_proj_qkvz"])  # clean order [q | k | v | z]
    ba = linear(x, p["in_proj_ba"])      # [b | a]
    kq = spec.key_dim
    vd = spec.value_dim
    qkv = qkvz[..., : 2 * kq + vd]
    z = qkvz[..., 2 * kq + vd :].reshape(b, s, hv, dv)
    bgate = ba[..., :hv]
    a = ba[..., hv:]

    qkv, new_conv = causal_conv(qkv, p["conv_w"], conv_state, valid)
    q = qkv[..., :kq].reshape(b, s, hk, dk)
    k = qkv[..., kq : 2 * kq].reshape(b, s, hk, dk)
    v = qkv[..., 2 * kq :].reshape(b, s, hv, dv)

    beta = jax.nn.sigmoid(bgate.astype(jnp.float32))
    g = -jnp.exp(p["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32)
    )
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)

    out, new_rec = gated_delta_scan(q, k, v, g, beta, rec_state, valid)

    # gated RMS norm per v-head, then merge heads
    normed = rms_norm(out, p["norm_w"], rms_eps)
    normed = normed.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
    y = normed.reshape(b, s, hv * dv).astype(x.dtype)
    return linear(y, p["out_proj"]), new_conv, new_rec
