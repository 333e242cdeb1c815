"""Router parity vs the HuggingFace torch implementations the reference uses.

The reference's perplexity parity depends on exact router semantics
(SURVEY.md §7 "Hard parts": sigmoid + noaux_tc + e_score_correction_bias).
We check our jit-friendly router against transformers' DeepseekV3TopkRouter /
DeepseekV2MoEGate bit-for-bit on random inputs.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from ktransformers_tpu.ops.gate import GateConfig, route


def _sorted_pairs(idx, w):
    order = np.argsort(idx, axis=-1)
    return np.take_along_axis(idx, order, -1), np.take_along_axis(w, order, -1)


def test_deepseek_v3_noaux_tc_parity(rng):
    from transformers.models.deepseek_v3.configuration_deepseek_v3 import (
        DeepseekV3Config,
    )
    from transformers.models.deepseek_v3.modeling_deepseek_v3 import (
        DeepseekV3TopkRouter,
    )

    cfg = DeepseekV3Config(
        hidden_size=64,
        n_routed_experts=32,
        num_experts_per_tok=6,
        n_group=8,
        topk_group=4,
        routed_scaling_factor=2.5,
        norm_topk_prob=True,
    )
    torch.manual_seed(0)
    router = DeepseekV3TopkRouter(cfg)
    with torch.no_grad():
        router.weight.normal_()
        router.e_score_correction_bias.uniform_(-0.2, 0.2)

    x = rng.standard_normal((16, 64)).astype(np.float32)
    with torch.no_grad():
        t_idx, t_w = router(torch.from_numpy(x)[None])

    logits = x @ np.asarray(router.weight.detach()).T
    g = GateConfig(
        num_experts=32,
        top_k=6,
        scoring="sigmoid",
        group_method="group_top2sum",
        n_group=8,
        topk_group=4,
        norm_topk_prob=True,
        routed_scaling_factor=2.5,
        has_correction_bias=True,
    )
    j_idx, j_w = route(
        jnp.asarray(logits),
        g,
        jnp.asarray(router.e_score_correction_bias.detach().numpy()),
    )

    ti, tw = _sorted_pairs(t_idx.numpy(), t_w.numpy())
    ji, jw = _sorted_pairs(np.asarray(j_idx), np.asarray(j_w))
    np.testing.assert_array_equal(ti, ji)
    np.testing.assert_allclose(tw, jw, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("topk_method", ["greedy", "group_limited_greedy"])
def test_deepseek_v2_gate_parity(rng, topk_method):
    from transformers.models.deepseek_v2.configuration_deepseek_v2 import (
        DeepseekV2Config,
    )
    from transformers.models.deepseek_v2.modeling_deepseek_v2 import (
        DeepseekV2MoEGate,
    )

    cfg = DeepseekV2Config(
        hidden_size=64,
        n_routed_experts=16,
        num_experts_per_tok=4,
        n_group=4,
        topk_group=2,
        topk_method=topk_method,
        routed_scaling_factor=1.0,
        norm_topk_prob=False,
    )
    torch.manual_seed(1)
    gate = DeepseekV2MoEGate(cfg)
    with torch.no_grad():
        gate.weight.normal_()

    x = rng.standard_normal((8, 64)).astype(np.float32)
    with torch.no_grad():
        t_idx, t_w = gate(torch.from_numpy(x)[None])

    logits = x @ np.asarray(gate.weight.detach()).T
    g = GateConfig(
        num_experts=16,
        top_k=4,
        scoring="softmax",
        group_method="none" if topk_method == "greedy" else "group_max",
        n_group=4,
        topk_group=2,
        norm_topk_prob=False,
        routed_scaling_factor=1.0,
    )
    j_idx, j_w = route(jnp.asarray(logits), g)

    ti, tw = _sorted_pairs(t_idx.numpy().reshape(8, 4), t_w.numpy().reshape(8, 4))
    ji, jw = _sorted_pairs(np.asarray(j_idx), np.asarray(j_w))
    np.testing.assert_array_equal(ti, ji)
    np.testing.assert_allclose(tw, jw, rtol=2e-5, atol=1e-6)


def test_qwen_style_softmax_norm(rng):
    # softmax + norm_topk_prob (qwen2/3-moe): weights sum to 1.
    logits = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
    g = GateConfig(num_experts=64, top_k=8, scoring="softmax", norm_topk_prob=True)
    idx, w = route(logits, g)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
    assert idx.shape == (32, 8)
