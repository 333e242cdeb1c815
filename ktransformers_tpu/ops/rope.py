"""Rotary position embeddings: standard, YaRN, partial-rotary, interleaved.

Covers the variants the reference's model zoo needs
(archive/ktransformers/operators/RoPE.py and the HF modeling files it copies):

- llama-style half-rotation (rotate_half) rope,
- deepseek-style *interleaved* (complex-pair) rope applied only to the
  qk_rope_head_dim slice (partial rotary for MLA),
- YaRN long-context scaling with mscale attention-temperature correction
  (deepseek v2/v3 `rope_scaling: {type: yarn, ...}`).

Tables are precomputed once in float32 and gathered by position id inside the
jitted step, which keeps the decode step free of trig.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    dim: int  # rotary dim (qk_rope_head_dim for MLA models)
    base: float = 10000.0
    max_position: int = 4096
    # yarn scaling (None = no scaling)
    scaling_type: str | None = None  # None | "yarn" | "linear"
    scaling_factor: float = 1.0
    original_max_position: int = 4096
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    mscale: float = 1.0
    mscale_all_dim: float = 0.0
    interleaved: bool = False  # deepseek complex-pair layout


def _yarn_find_correction_dim(num_rotations, dim, base, max_pos):
    return (dim * math.log(max_pos / (num_rotations * 2 * math.pi))) / (
        2 * math.log(base)
    )


def _yarn_find_correction_range(low_rot, high_rot, dim, base, max_pos):
    low = math.floor(_yarn_find_correction_dim(low_rot, dim, base, max_pos))
    high = math.ceil(_yarn_find_correction_dim(high_rot, dim, base, max_pos))
    return max(low, 0), min(high, dim - 1)


def _yarn_linear_ramp(lo, hi, dim):
    if lo == hi:
        hi += 0.001
    ramp = (np.arange(dim, dtype=np.float64) - lo) / (hi - lo)
    return np.clip(ramp, 0, 1)


def yarn_get_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def rope_attention_scale(cfg: RopeConfig) -> float:
    """Extra attention-softmax scale factor induced by YaRN mscale.

    DeepSeek applies softmax_scale *= mscale(s, mscale)^2 / mscale(s,
    mscale_all_dim)^2 folded as a single mscale when mscale == mscale_all_dim.
    """
    if cfg.scaling_type != "yarn":
        return 1.0
    m = yarn_get_mscale(cfg.scaling_factor, cfg.mscale)
    m_all = yarn_get_mscale(cfg.scaling_factor, cfg.mscale_all_dim)
    return (m / m_all) ** 2 if cfg.mscale_all_dim else m * m


def precompute_rope_tables(cfg: RopeConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin) tables of shape [max_position, dim // 2], float32.

    YaRN follows the deepseek yarn formulation: interpolate inverse
    frequencies between extrapolation (theta^-i) and interpolation
    (theta^-i / s) with a linear ramp over the correction range, and scale
    the tables by the mscale temperature.
    """
    half = cfg.dim // 2
    exponent = np.arange(0, cfg.dim, 2, dtype=np.float64)[:half] / cfg.dim
    inv_freq = 1.0 / (cfg.base**exponent)

    attn_factor = 1.0
    if cfg.scaling_type == "yarn" and cfg.scaling_factor > 1.0:
        inv_freq_inter = inv_freq / cfg.scaling_factor
        lo, hi = _yarn_find_correction_range(
            cfg.beta_fast,
            cfg.beta_slow,
            cfg.dim,
            cfg.base,
            cfg.original_max_position,
        )
        ramp = 1.0 - _yarn_linear_ramp(lo, hi, half)
        inv_freq = inv_freq_inter * (1.0 - ramp) + inv_freq * ramp
        attn_factor = yarn_get_mscale(cfg.scaling_factor, cfg.mscale)
        m_all = yarn_get_mscale(cfg.scaling_factor, cfg.mscale_all_dim)
        # HF bakes mscale/mscale_all_dim into the cos/sin tables.
        attn_factor = attn_factor / m_all if cfg.mscale_all_dim else attn_factor
    elif cfg.scaling_type == "linear":
        inv_freq = inv_freq / cfg.scaling_factor

    t = np.arange(cfg.max_position, dtype=np.float64)
    freqs = np.outer(t, inv_freq)
    cos = np.cos(freqs) * attn_factor
    sin = np.sin(freqs) * attn_factor
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def apply_rope(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    interleaved: bool = False,
) -> jnp.ndarray:
    """Rotate the last dim of x by (cos, sin).

    x: [..., seq, dim]; cos/sin: [seq, dim // 2] (already position-gathered).
    ``interleaved=True`` pairs (x[2i], x[2i+1]) (deepseek complex layout);
    otherwise pairs (x[i], x[i + dim/2]) (llama rotate_half layout).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # Broadcast tables over leading dims: [..., seq, half]
    while cos.ndim < xf.ndim - 1:
        cos = cos[None]
        sin = sin[None]
    half = xf.shape[-1] // 2
    if interleaved:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        out = jnp.stack([r1, r2], axis=-1).reshape(xf.shape)
    else:
        x1 = xf[..., :half]
        x2 = xf[..., half:]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        out = jnp.concatenate([r1, r2], axis=-1)
    return out.astype(dtype)


def gather_rope(
    cos: jnp.ndarray, sin: jnp.ndarray, positions: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-position cos/sin rows: positions [...]-> [..., dim//2]."""
    return cos[positions], sin[positions]


def rope_rotation_matrix(cos, sin, interleaved: bool):
    """Exact rope rotation as a dense [dr, dr] matrix: x_roped = x @ R.

    cos/sin: [..., dr/2]. Built ONCE per decode step (position-dependent,
    layer-independent) so a fused attention kernel can apply rope as one
    tiny MXU dot — value-equal to apply_rope (the off-diagonal zeros add
    exactly in f32). Used by ops/pallas/mla_decode.mla_decode_fused."""
    d2 = cos.shape[-1]
    lead = cos.shape[:-1]
    c = cos.astype(jnp.float32)
    s = sin.astype(jnp.float32)
    eye = jnp.eye(d2, dtype=jnp.float32)
    cd = c[..., None, :] * eye  # [..., d2, d2]: diag(c) per lead index
    sd = s[..., None, :] * eye
    # half-split layout: out[:d2] = x[:d2] c - x[d2:] s
    #                    out[d2:] = x[:d2] s + x[d2:] c
    top = jnp.concatenate([cd, sd], axis=-1)
    bot = jnp.concatenate([-sd, cd], axis=-1)
    rot = jnp.concatenate([top, bot], axis=-2)  # [..., dr, dr]
    if interleaved:
        # interleaved pairs (2i, 2i+1): p[i] = interleaved position of half
        # index i; R_int[a, b] = R_half[p^-1(a), p^-1(b)]
        p = jnp.concatenate([jnp.arange(d2) * 2, jnp.arange(d2) * 2 + 1])
        inv = jnp.argsort(p)
        rot = rot[..., inv, :][..., :, inv]
    return rot.reshape(*lead, 2 * d2, 2 * d2)
