"""Full-model logit parity vs HuggingFace torch at tiny random configs.

The strongest correctness check we can run without weights (zero egress):
the same random weights through transformers (torch CPU, fp32, eager) and
through our decoder must give near-identical logits. Mirrors the role of the
reference's MMLU-parity harness (doc/en/benchmark.md) at unit scale.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ktransformers_tpu.models.hf_import import params_from_hf
from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import spec_from_hf_config


def _run_parity(hf_model, cfg, prompt_len=12, batch=2, atol=2e-3):
    hf_model = hf_model.eval().float()
    spec = spec_from_hf_config(cfg)
    params = params_from_hf(hf_model, spec, quant="f32")

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(batch, prompt_len))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(tokens)).logits.numpy()

    cache = KVCache.create(spec, batch, prompt_len + 8, dtype=jnp.float32)
    logits, _ = forward(
        params, spec, jnp.asarray(tokens, jnp.int32), cache,
        compute_dtype=jnp.float32,
    )
    out = np.asarray(logits, np.float32)

    assert out.shape == ref.shape
    denom = np.abs(ref).max() + 1e-6
    err = np.abs(out - ref).max() / denom
    assert err < atol, f"max rel logit err {err}"
    # Same argmax on the last position (greedy decode agreement).
    np.testing.assert_array_equal(out[:, -1].argmax(-1), ref[:, -1].argmax(-1))
    return spec, params, tokens, ref


def test_deepseek_v2_lite_parity():
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = DeepseekV2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        n_shared_experts=2,
        n_routed_experts=8,
        num_experts_per_tok=2,
        first_k_dense_replace=1,
        moe_layer_freq=1,
        routed_scaling_factor=1.0,
        topk_method="greedy",
        norm_topk_prob=False,
        kv_lora_rank=32,
        q_lora_rank=None,
        qk_rope_head_dim=16,
        qk_nope_head_dim=32,
        v_head_dim=32,
        head_dim=16,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    _run_parity(DeepseekV2ForCausalLM(cfg), cfg)


def test_deepseek_v3_parity():
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    cfg = DeepseekV3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        n_shared_experts=1,
        n_routed_experts=16,
        num_experts_per_tok=4,
        n_group=4,
        topk_group=2,
        first_k_dense_replace=1,
        norm_topk_prob=True,
        routed_scaling_factor=2.5,
        kv_lora_rank=32,
        q_lora_rank=48,
        qk_rope_head_dim=16,
        qk_nope_head_dim=32,
        v_head_dim=32,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = DeepseekV3ForCausalLM(cfg)
    with torch.no_grad():
        for layer in model.model.layers[cfg.first_k_dense_replace:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.1, 0.1)
    _run_parity(model, cfg)


def test_qwen2_moe_parity():
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    cfg = Qwen2MoeConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=32,
        shared_expert_intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=8,
        num_experts_per_tok=2,
        decoder_sparse_step=1,
        norm_topk_prob=False,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    _run_parity(Qwen2MoeForCausalLM(cfg), cfg)


def test_qwen3_moe_parity():
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    cfg = Qwen3MoeConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=8,
        num_experts_per_tok=2,
        decoder_sparse_step=1,
        norm_topk_prob=True,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    _run_parity(Qwen3MoeForCausalLM(cfg), cfg)


def test_mixtral_parity():
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(4)
    _run_parity(MixtralForCausalLM(cfg), cfg)


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(5)
    _run_parity(LlamaForCausalLM(cfg), cfg)


def test_incremental_decode_matches_prefill():
    """prefill(N) then per-token decode must equal one full forward —
    the KV-cache correctness invariant behind the reference's decode loop
    (util/utils.py prefill_and_generate)."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = DeepseekV2Config(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        moe_intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        n_shared_experts=1,
        n_routed_experts=4,
        num_experts_per_tok=2,
        first_k_dense_replace=1,
        topk_method="greedy",
        kv_lora_rank=16,
        q_lora_rank=None,
        qk_rope_head_dim=8,
        qk_nope_head_dim=16,
        v_head_dim=16,
        head_dim=8,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(6)
    model = DeepseekV2ForCausalLM(cfg).eval().float()
    spec = spec_from_hf_config(cfg)
    params = params_from_hf(model, spec, quant="bf16")

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 64, size=(1, 10)), jnp.int32)

    cache = KVCache.create(spec, 1, 16, dtype=jnp.float32)
    full_logits, _ = forward(params, spec, tokens, cache, compute_dtype=jnp.float32)

    cache = KVCache.create(spec, 1, 16, dtype=jnp.float32)
    logits_p, cache = forward(
        params, spec, tokens[:, :6], cache, compute_dtype=jnp.float32
    )
    outs = [np.asarray(logits_p)]
    for i in range(6, 10):
        logits_i, cache = forward(
            params, spec, tokens[:, i : i + 1], cache, compute_dtype=jnp.float32
        )
        outs.append(np.asarray(logits_i))
    inc = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        inc, np.asarray(full_logits), rtol=1e-4, atol=1e-4
    )


def test_glm4_moe_parity():
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    cfg = Glm4MoeConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        partial_rotary_factor=0.5,
        use_qk_norm=True,
        n_routed_experts=8,
        num_experts_per_tok=2,
        n_shared_experts=1,
        n_group=2,
        topk_group=1,
        norm_topk_prob=True,
        routed_scaling_factor=1.5,
        first_k_dense_replace=1,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = Glm4MoeForCausalLM(cfg)
    with torch.no_grad():
        for layer in model.model.layers[cfg.first_k_dense_replace:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.1, 0.1)
    _run_parity(model, cfg)


def test_qwen3_next_parity():
    """Hybrid GatedDeltaNet (3 linear + 1 full attention layers) + gated
    full attention + qwen2-moe-style MoE: logits vs HF torch fp32 eager.
    Reference: archive/ktransformers/models/modeling_qwen3_next.py."""
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    cfg = Qwen3NextConfig(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=48,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        linear_num_value_heads=4,
        linear_num_key_heads=2,
        linear_key_head_dim=16,
        linear_value_head_dim=16,
        linear_conv_kernel_dim=4,
        num_experts=8,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        max_position_embeddings=128,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    _run_parity(Qwen3NextForCausalLM(cfg), cfg, atol=4e-3)
