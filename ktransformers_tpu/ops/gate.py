"""MoE routing (gate) with every scoring/top-k variant the reference supports.

TPU analog of the reference's routers:
- C++ defaults: kt-kernel/operators/common.hpp:365-396 (sigmoid scoring +
  noaux_tc group-limited top-k with e_score_correction_bias),
- Python: archive/ktransformers/models/modeling_deepseek_v3.py:401-479 and
  archive/ktransformers/operators/gate.py (KMoEGate families),
- CUDA topk_softmax (kt-kernel/cuda/moe/moe_topk_softmax_kernels.cu).

Everything here is branch-free under jit (static config selects the trace).
All scoring is float32 — perplexity parity with the reference requires the
router to be exact (SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GateConfig:
    num_experts: int
    top_k: int
    scoring: str = "softmax"  # "softmax" | "sigmoid"
    # group-limited selection: none | "group_max" (deepseek-v2) |
    # "group_top2sum" (deepseek-v3 noaux_tc)
    group_method: str = "none"
    n_group: int = 1
    topk_group: int = 1
    norm_topk_prob: bool = False
    routed_scaling_factor: float = 1.0
    has_correction_bias: bool = False  # e_score_correction_bias (noaux_tc)


def _group_limited_mask(
    scores_for_choice: jnp.ndarray, cfg: GateConfig
) -> jnp.ndarray:
    """Zero scores outside the top `topk_group` expert groups per token."""
    t = scores_for_choice.shape[0]
    grouped = scores_for_choice.reshape(t, cfg.n_group, -1)
    if cfg.group_method == "group_max":
        group_scores = jnp.max(grouped, axis=-1)
    elif cfg.group_method == "group_top2sum":
        top2 = jax.lax.top_k(grouped, 2)[0]
        group_scores = jnp.sum(top2, axis=-1)
    else:
        raise ValueError(cfg.group_method)
    # Mask of the winning groups.
    _, group_idx = jax.lax.top_k(group_scores, cfg.topk_group)
    group_mask = jnp.zeros_like(group_scores).at[
        jnp.arange(t)[:, None], group_idx
    ].set(1.0)
    score_mask = jnp.repeat(
        group_mask, cfg.num_experts // cfg.n_group, axis=-1
    )
    return jnp.where(score_mask > 0, scores_for_choice, 0.0)


def route(
    logits: jnp.ndarray,
    cfg: GateConfig,
    correction_bias: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Select top-k experts per token.

    logits: [tokens, num_experts] router logits (any float dtype).
    Returns (topk_idx [tokens, k] int32, topk_weights [tokens, k] float32).
    """
    logits = logits.astype(jnp.float32)
    if cfg.scoring == "softmax":
        scores = jax.nn.softmax(logits, axis=-1)
    elif cfg.scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        raise ValueError(cfg.scoring)

    scores_for_choice = scores
    if cfg.scoring == "sigmoid" and not cfg.has_correction_bias:
        # select by the raw logits: sigmoid saturates to exactly 1.0 in
        # f32 above ~17, creating artificial top-k ties; logits preserve
        # the order (and match the reference's topk-then-sigmoid,
        # modeling_smallthinker.py:92-97)
        scores_for_choice = logits
    if cfg.has_correction_bias:
        if correction_bias is None:
            raise ValueError("gate requires e_score_correction_bias")
        scores_for_choice = scores + correction_bias.astype(jnp.float32)[None, :]

    if cfg.group_method != "none":
        scores_for_choice = _group_limited_mask(scores_for_choice, cfg)

    _, topk_idx = jax.lax.top_k(scores_for_choice, cfg.top_k)
    # Weights always come from the *uncorrected* scores (deepseek-v3
    # semantics; identical to plain top-k values when there is no bias).
    topk_weights = jnp.take_along_axis(scores, topk_idx, axis=-1)

    if cfg.norm_topk_prob:
        denom = jnp.sum(topk_weights, axis=-1, keepdims=True) + 1e-20
        topk_weights = topk_weights / denom
    topk_weights = topk_weights * cfg.routed_scaling_factor
    return topk_idx.astype(jnp.int32), topk_weights
