"""Token sampling: greedy / temperature / top-k / top-p / repetition penalty.

Analog of the reference's sampler stack (archive/ktransformers/server/
balance_serve/inference/sampling/sampler.py + penaltylib): functional,
jit-friendly, per-sequence parameter vectors so one jitted step serves a
mixed batch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => disabled
    top_p: float = 1.0  # 1 => disabled
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0  # OpenAI-style additive penalties
    frequency_penalty: float = 0.0


def apply_repetition_penalty(
    logits: jnp.ndarray, generated_mask: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """generated_mask: [B, V] float/bool 1 where token has appeared.
    Positive logits are divided by penalty, negative multiplied (HF rule)."""
    if penalty == 1.0:
        return logits
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(generated_mask > 0, pen, logits)


def apply_presence_frequency_penalties(
    logits: jnp.ndarray,
    token_counts: jnp.ndarray,  # [B, V] occurrences in the output so far
    presence_penalty,
    frequency_penalty,
) -> jnp.ndarray:
    """OpenAI-style additive penalties (reference analog: the penaltylib
    orchestrator, inference/sampling/penaltylib). Accepts scalars or [B]
    vectors."""
    p = jnp.asarray(presence_penalty, jnp.float32).reshape(-1, 1)
    f = jnp.asarray(frequency_penalty, jnp.float32).reshape(-1, 1)
    counts = token_counts.astype(jnp.float32)
    return (
        logits
        - p * (counts > 0).astype(jnp.float32)
        - f * counts
    )


def _top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    vals, _ = jax.lax.top_k(logits, k)
    kth = vals[..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def _top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep the smallest prefix with cumulative prob > p (always keep top-1).
    cutoff_mask = cum - probs > p
    cutoff_logit = jnp.min(
        jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
    )
    return jnp.where(logits < cutoff_logit, -jnp.inf, logits)


def sample(
    logits: jnp.ndarray,  # [B, V]
    key: jax.Array,
    cfg: SamplingConfig,
    generated_mask: jnp.ndarray | None = None,  # [B, V]
) -> jnp.ndarray:
    """Returns sampled token ids [B] int32."""
    logits = logits.astype(jnp.float32)
    if generated_mask is not None:
        logits = apply_repetition_penalty(
            logits, generated_mask, cfg.repetition_penalty
        )
        if cfg.presence_penalty or cfg.frequency_penalty:
            logits = apply_presence_frequency_penalties(
                logits, generated_mask, cfg.presence_penalty,
                cfg.frequency_penalty,
            )
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / cfg.temperature
    if cfg.top_k > 0:
        logits = _top_k_filter(logits, cfg.top_k)
    if cfg.top_p < 1.0:
        logits = _top_p_filter(logits, cfg.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
