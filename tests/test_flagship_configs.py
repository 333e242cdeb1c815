"""Spec translation for the flagship production configs (public values) and
a narrow-depth forward sanity run for each — guards the path to the real
671B/1T targets (BASELINE.md north star) without needing the weights."""

import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import spec_from_hf_config

DEEPSEEK_V3_671B = dict(
    model_type="deepseek_v3",
    vocab_size=129280,
    hidden_size=7168,
    intermediate_size=18432,
    moe_intermediate_size=2048,
    num_hidden_layers=61,
    num_attention_heads=128,
    num_key_value_heads=128,
    n_shared_experts=1,
    n_routed_experts=256,
    num_experts_per_tok=8,
    n_group=8,
    topk_group=4,
    first_k_dense_replace=3,
    norm_topk_prob=True,
    routed_scaling_factor=2.5,
    scoring_func="sigmoid",
    topk_method="noaux_tc",
    kv_lora_rank=512,
    q_lora_rank=1536,
    qk_rope_head_dim=64,
    qk_nope_head_dim=128,
    v_head_dim=128,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=163840,
    rope_scaling=dict(
        type="yarn",
        factor=40.0,
        beta_fast=32,
        beta_slow=1,
        mscale=1.0,
        mscale_all_dim=1.0,
        original_max_position_embeddings=4096,
    ),
)

KIMI_K2 = dict(
    DEEPSEEK_V3_671B,
    vocab_size=163840,
    num_attention_heads=64,
    num_key_value_heads=64,
    n_routed_experts=384,
    n_group=1,
    topk_group=1,
    first_k_dense_replace=1,
)

QWEN3_235B = dict(
    model_type="qwen3_moe",
    vocab_size=151936,
    hidden_size=4096,
    intermediate_size=12288,
    moe_intermediate_size=1536,
    num_hidden_layers=94,
    num_attention_heads=64,
    num_key_value_heads=4,
    head_dim=128,
    num_experts=128,
    num_experts_per_tok=8,
    decoder_sparse_step=1,
    norm_topk_prob=True,
    rms_norm_eps=1e-6,
    rope_theta=1000000.0,
    max_position_embeddings=40960,
)


def test_deepseek_v3_671b_spec():
    spec = spec_from_hf_config(DEEPSEEK_V3_671B)
    a = spec.attention
    assert a.kind == "mla" and a.q_lora_rank == 1536 and a.kv_lora_rank == 512
    assert spec.moe.num_experts == 256 and spec.moe.top_k == 8
    assert spec.moe.gate.group_method == "group_top2sum"
    assert spec.moe.gate.has_correction_bias
    assert spec.rope.scaling_type == "yarn" and spec.rope.scaling_factor == 40.0
    # yarn mscale == mscale_all_dim folds the attention factor to 1
    from ktransformers_tpu.ops.rope import rope_attention_scale

    assert abs(rope_attention_scale(spec.rope) - 1.0) < 1e-9
    # param count sanity: experts dominate at ~656B-ish total
    e_params = (
        spec.moe.num_experts
        * (spec.hidden_size * 2 * spec.moe.moe_intermediate_size
           + spec.moe.moe_intermediate_size * spec.hidden_size)
        * (spec.num_layers - spec.moe.first_k_dense)
    )
    assert 6.0e11 < e_params < 7.5e11


def test_kimi_k2_spec():
    spec = spec_from_hf_config(KIMI_K2)
    assert spec.moe.num_experts == 384
    assert spec.attention.num_heads == 64
    assert spec.moe.gate.scoring == "sigmoid"


def test_qwen3_235b_spec():
    spec = spec_from_hf_config(QWEN3_235B)
    assert spec.attention.qk_norm and spec.attention.num_kv_heads == 4
    assert spec.moe.num_experts == 128 and spec.moe.top_k == 8


def _narrow(cfg, **overrides):
    c = dict(cfg)
    c.update(
        num_hidden_layers=2,
        vocab_size=256,
        first_k_dense_replace=1,
        **overrides,
    )
    return c


def test_flagship_narrow_forward():
    """2-layer variants of each flagship config must run end to end (full
    hidden/expert dims for DeepSeek-V3 are too slow for CI; scale dims but
    keep every architectural knob)."""
    for base in (DEEPSEEK_V3_671B, KIMI_K2):
        c = _narrow(
            base,
            hidden_size=128,
            intermediate_size=256,
            moe_intermediate_size=64,
            num_attention_heads=8,
            num_key_value_heads=8,
            kv_lora_rank=64,
            q_lora_rank=96,
            qk_rope_head_dim=16,
            qk_nope_head_dim=32,
            v_head_dim=32,
            n_routed_experts=16,
            n_group=8 if base is DEEPSEEK_V3_671B else 1,
            topk_group=4 if base is DEEPSEEK_V3_671B else 1,
            num_experts_per_tok=4,
        )
        spec = spec_from_hf_config(c)
        params = init_params(spec, seed=0, quant="int8", moe_quant="int4_g")
        cache = KVCache.create(spec, 1, 32, dtype=jnp.float32)
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (1, 8)), jnp.int32
        )
        logits, _ = forward(
            params, spec, tokens, cache, compute_dtype=jnp.float32
        )
        assert np.isfinite(np.asarray(logits)).all()

    c = _narrow(
        QWEN3_235B,
        hidden_size=128,
        intermediate_size=256,
        moe_intermediate_size=64,
        num_attention_heads=8,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=16,
        num_experts_per_tok=4,
    )
    c.pop("first_k_dense_replace")
    spec = spec_from_hf_config(c)
    params = init_params(spec, seed=0, quant="int8")
    cache = KVCache.create(spec, 1, 32, dtype=jnp.float32)
    tokens = jnp.asarray(np.arange(8)[None] % 256, jnp.int32)
    logits, _ = forward(params, spec, tokens, cache, compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
