"""Token sampling: greedy / temperature / top-k / top-p / repetition /
presence / frequency penalties.

Analog of the reference's sampler stack (archive/ktransformers/server/
balance_serve/inference/sampling/sampler.py + penaltylib): functional,
jit-friendly, per-sequence parameter vectors so one jitted step serves a
mixed batch. Penalty semantics follow the reference/OpenAI conventions:
repetition penalty (HF rule) considers the FULL context (prompt +
generated), presence/frequency penalties consider generated tokens only —
hence the split between `token_counts` (generated occurrences, [B, V]) and
`prompt_mask` ([B, V] bool, tokens present in the prompt).
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

    @property
    def needs_counts(self) -> bool:
        return (
            self.repetition_penalty != 1.0
            or self.presence_penalty != 0.0
            or self.frequency_penalty != 0.0
        )


def apply_repetition_penalty(
    logits: jnp.ndarray, seen_mask: jnp.ndarray, penalty
) -> jnp.ndarray:
    """seen_mask: [B, V] bool/float 1 where token appeared in the context.
    Positive logits are divided by penalty, negative multiplied (HF rule).
    `penalty` may be a scalar or a [B] vector."""
    pen = jnp.asarray(penalty, jnp.float32).reshape(-1, 1)
    out = jnp.where(logits > 0, logits / pen, logits * pen)
    return jnp.where(seen_mask > 0, out, logits)


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


def _top_k_filter_rows(logits: jnp.ndarray, ks: jnp.ndarray) -> jnp.ndarray:
    """Per-row variable top-k: ks [B] int32, 0/negative = disabled."""
    v = logits.shape[-1]
    sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
    k = jnp.clip(jnp.where(ks > 0, ks, v), 1, v).astype(jnp.int32)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    return jnp.where(logits < kth, -jnp.inf, logits)


def _top_p_filter(logits: jnp.ndarray, p) -> jnp.ndarray:
    """p: scalar or [B] vector; 1.0 = disabled (filter keeps everything)."""
    p = jnp.asarray(p, jnp.float32).reshape(-1, 1)
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
    token_counts: jnp.ndarray | None = None,  # [B, V] generated-token counts
    prompt_mask: jnp.ndarray | None = None,  # [B, V] bool prompt occurrence
) -> jnp.ndarray:
    """Returns sampled token ids [B] int32 (one SamplingConfig for the
    whole batch; use sample_batched for per-row parameter vectors)."""
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        if cfg.repetition_penalty != 1.0:
            seen = token_counts > 0
            if prompt_mask is not None:
                seen = seen | prompt_mask
            logits = apply_repetition_penalty(
                logits, seen, cfg.repetition_penalty
            )
        if cfg.presence_penalty or cfg.frequency_penalty:
            logits = apply_presence_frequency_penalties(
                logits, token_counts, cfg.presence_penalty,
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


def sample_batched(
    logits: jnp.ndarray,  # [B, V]
    key: jax.Array,
    temps: jnp.ndarray,  # [B] f32; <=0 rows are greedy
    top_ks: jnp.ndarray | None = None,  # [B] int32; <=0 disabled
    top_ps: jnp.ndarray | None = None,  # [B] f32; 1.0 disabled
    rep_pens: jnp.ndarray | None = None,  # [B] f32; 1.0 disabled
    pres_pens: jnp.ndarray | None = None,  # [B] f32
    freq_pens: jnp.ndarray | None = None,  # [B] f32
    token_counts: jnp.ndarray | None = None,  # [B, V] generated counts
    prompt_mask: jnp.ndarray | None = None,  # [B, V] bool
) -> jnp.ndarray:
    """Fully per-row vectorized sampling for mixed serving batches (the
    reference's per-query sampler, inference/sampling/sampler.py). Returns
    [B] int32."""
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        if rep_pens is not None:
            seen = token_counts > 0
            if prompt_mask is not None:
                seen = seen | prompt_mask
            logits = apply_repetition_penalty(logits, seen, rep_pens)
        if pres_pens is not None or freq_pens is not None:
            logits = apply_presence_frequency_penalties(
                logits,
                token_counts,
                0.0 if pres_pens is None else pres_pens,
                0.0 if freq_pens is None else freq_pens,
            )
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = jnp.maximum(temps, 1e-6)[:, None]
    scaled = logits / t
    if top_ks is not None or top_ps is not None:
        # single descending sort serves both filters: top-k masks ranks >= k
        # before the top-p cumulative cutoff is computed over the remainder
        v = scaled.shape[-1]
        sorted_desc = jnp.sort(scaled, axis=-1)[..., ::-1]
        rank = jax.lax.broadcasted_iota(jnp.int32, sorted_desc.shape, 1)
        if top_ks is not None:
            k = jnp.clip(
                jnp.where(top_ks > 0, top_ks, v), 1, v
            ).astype(jnp.int32)
            sorted_desc = jnp.where(
                rank < k[:, None], sorted_desc, -jnp.inf
            )
        if top_ps is not None:
            p = jnp.asarray(top_ps, jnp.float32).reshape(-1, 1)
            probs = jax.nn.softmax(sorted_desc, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            cutoff_mask = cum - probs > p
            sorted_desc = jnp.where(cutoff_mask, -jnp.inf, sorted_desc)
        # per-row smallest surviving logit is the threshold
        cutoff = jnp.max(
            jnp.where(jnp.isfinite(sorted_desc), -sorted_desc, -jnp.inf),
            axis=-1,
            keepdims=True,
        )
        scaled = jnp.where(scaled < -cutoff, -jnp.inf, scaled)
    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temps > 0, sampled, greedy)
