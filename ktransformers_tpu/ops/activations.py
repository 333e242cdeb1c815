"""Gated-MLP activations with the reference's knob set.

TPU analog of the AVX512 activation pass in the reference AMX MoE
(kt-kernel/operators/amx/la/amx.hpp:48-120): standard SwiGLU plus the two
model-specific variants the reference supports:

- ``swiglu_limit`` — clamp gate/up before activation (DeepSeek-V4-Flash).
- ``swiglu_alpha`` — "swigluoai": gate * sigmoid(alpha * gate) * (up + 1)
  (MiniMax-M-family; gpt-oss-style interleaved glu).

These are plain jnp ops: XLA fuses them into the surrounding matmuls, which
is exactly the fusion the reference does by hand in AVX512.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ActivationConfig:
    kind: str = "silu"  # silu | gelu | swigluoai | relu
    swiglu_limit: float | None = None  # clamp on gate (and up) pre-activation
    swiglu_alpha: float = 1.702  # only used by swigluoai


def glu_activate(
    gate: jnp.ndarray, up: jnp.ndarray, cfg: ActivationConfig | None = None
) -> jnp.ndarray:
    """Compute act(gate) * up with the configured variant (f32 internally)."""
    cfg = cfg or ActivationConfig()
    g = gate.astype(jnp.float32)
    u = up.astype(jnp.float32)
    if cfg.swiglu_limit is not None:
        # Reference clamps gate to (-inf, limit] and up to [-limit, limit].
        g = jnp.minimum(g, cfg.swiglu_limit)
        u = jnp.clip(u, -cfg.swiglu_limit, cfg.swiglu_limit)
    if cfg.kind == "silu":
        y = jax.nn.silu(g) * u
    elif cfg.kind == "gelu":
        y = jax.nn.gelu(g, approximate=False) * u
    elif cfg.kind == "relu":
        y = jnp.maximum(g, 0.0) * u
    elif cfg.kind == "swigluoai":
        y = g * jax.nn.sigmoid(cfg.swiglu_alpha * g) * (u + 1.0)
    else:
        raise ValueError(f"unknown activation kind: {cfg.kind}")
    return y.astype(gate.dtype)
