"""End-to-end loader tests: HF torch model -> GGUF file -> our params must
produce the same logits as the torch model (validates the whole GGUF name
mapping + container + builder path). Safetensors provider likewise."""

import numpy as np
import jax.numpy as jnp
import torch

from ktransformers_tpu.loader.gguf_writer import write_gguf
from ktransformers_tpu.loader.providers import GGUFProvider, SafetensorsProvider
from ktransformers_tpu.models.loading import build_params
from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import spec_from_hf_config

_HF2GGUF_TOP = {
    "model.embed_tokens.weight": "token_embd.weight",
    "model.norm.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
}
_HF2GGUF_SUF = {
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.kv_a_proj_with_mqa.weight": "attn_kv_a_mqa.weight",
    "self_attn.kv_a_layernorm.weight": "attn_kv_a_norm.weight",
    "self_attn.kv_b_proj.weight": "attn_kv_b.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "mlp.gate.weight": "ffn_gate_inp.weight",
    "mlp.shared_experts.gate_proj.weight": "ffn_gate_shexp.weight",
    "mlp.shared_experts.up_proj.weight": "ffn_up_shexp.weight",
    "mlp.shared_experts.down_proj.weight": "ffn_down_shexp.weight",
}


def _tiny_ds_model():
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = DeepseekV2Config(
        vocab_size=96,
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
        norm_topk_prob=False,
        kv_lora_rank=16,
        q_lora_rank=None,
        qk_rope_head_dim=8,
        qk_nope_head_dim=16,
        v_head_dim=16,
        head_dim=8,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(11)
    return DeepseekV2ForCausalLM(cfg).eval().float(), cfg


def _export_gguf(model, cfg, path):
    """HF state dict -> gguf tensor names (F32), including stacked experts."""
    sd = {k: v.detach().numpy() for k, v in model.named_parameters()}
    tensors = {}
    for name, arr in sd.items():
        if name in _HF2GGUF_TOP:
            tensors[_HF2GGUF_TOP[name]] = arr
            continue
        import re

        m = re.match(r"model\.layers\.(\d+)\.(.+)$", name)
        assert m, name
        li, suf = m.group(1), m.group(2)
        if ".experts." in suf:
            continue  # handled stacked below
        assert suf in _HF2GGUF_SUF, suf
        tensors[f"blk.{li}.{_HF2GGUF_SUF[suf]}"] = arr
    # stacked expert tensors: gguf layout [E, out, in]
    for li in range(cfg.num_hidden_layers):
        base = f"model.layers.{li}.mlp.experts"
        if f"{base}.0.gate_proj.weight" not in sd:
            continue
        g = np.stack([sd[f"{base}.{e}.gate_proj.weight"] for e in range(cfg.n_routed_experts)])
        u = np.stack([sd[f"{base}.{e}.up_proj.weight"] for e in range(cfg.n_routed_experts)])
        d = np.stack([sd[f"{base}.{e}.down_proj.weight"] for e in range(cfg.n_routed_experts)])
        tensors[f"blk.{li}.ffn_gate_exps.weight"] = g
        tensors[f"blk.{li}.ffn_up_exps.weight"] = u
        tensors[f"blk.{li}.ffn_down_exps.weight"] = d
    write_gguf(
        path,
        {
            "general.architecture": "deepseek2",
            "deepseek2.block_count": cfg.num_hidden_layers,
        },
        tensors,
    )


def _check_logits(params, spec, model, atol=2e-3):
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 96, size=(1, 9))
    with torch.no_grad():
        ref = model(torch.from_numpy(tokens)).logits.numpy()
    cache = KVCache.create(spec, 1, 16, dtype=jnp.float32)
    logits, _ = forward(
        params, spec, jnp.asarray(tokens, jnp.int32), cache,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref, rtol=atol, atol=atol * np.abs(ref).max()
    )


def test_gguf_roundtrip_logits(tmp_path):
    model, cfg = _tiny_ds_model()
    path = str(tmp_path / "tiny.gguf")
    _export_gguf(model, cfg, path)
    spec = spec_from_hf_config(cfg)
    provider = GGUFProvider(path)
    params = build_params(provider, spec, quant="f32")
    _check_logits(params, spec, model)


def test_safetensors_roundtrip_logits(tmp_path):
    from safetensors.numpy import save_file

    model, cfg = _tiny_ds_model()
    sd = {k: v.detach().numpy() for k, v in model.named_parameters()}
    save_file(sd, str(tmp_path / "model.safetensors"))
    spec = spec_from_hf_config(cfg)
    provider = SafetensorsProvider(str(tmp_path))
    params = build_params(provider, spec, quant="f32")
    _check_logits(params, spec, model)


def test_safetensors_fp8_blockwise(tmp_path):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 256)).astype(np.float32) * 0.05
    # emulate DeepSeek-V3 native fp8: w = fp8_codes * scale_inv per 128x128
    scale = np.abs(w).reshape(2, 128, 2, 128).max(axis=(1, 3)) / 448.0
    scale = np.maximum(scale, 1e-9)
    s_full = np.repeat(np.repeat(scale, 128, 0), 128, 1)
    codes = jnp.asarray(w / s_full).astype(jnp.float8_e4m3fn)
    codes_np = np.asarray(codes).view(np.uint8)
    save_file(
        {
            "x.weight": codes_np,
            "x.weight_scale_inv": scale.astype(np.float32),
        },
        str(tmp_path / "model.safetensors"),
    )
    p = SafetensorsProvider(str(tmp_path))
    out = p.get("x.weight")
    ref = np.asarray(jnp.asarray(codes).astype(jnp.float32)) * s_full
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_spec_from_gguf_fields():
    from ktransformers_tpu.models.spec import spec_from_gguf_fields

    fields = {
        "general.architecture": "deepseek2",
        "deepseek2.block_count": 27,
        "deepseek2.embedding_length": 2048,
        "deepseek2.feed_forward_length": 10944,
        "deepseek2.attention.head_count": 16,
        "deepseek2.attention.head_count_kv": 16,
        "deepseek2.attention.layer_norm_rms_epsilon": 1e-6,
        "deepseek2.rope.freq_base": 10000.0,
        "deepseek2.context_length": 163840,
        "deepseek2.vocab_size": 102400,
        "deepseek2.expert_count": 64,
        "deepseek2.expert_used_count": 6,
        "deepseek2.expert_feed_forward_length": 1408,
        "deepseek2.expert_shared_count": 2,
        "deepseek2.expert_weights_scale": 1.0,
        "deepseek2.leading_dense_block_count": 1,
        "deepseek2.attention.kv_lora_rank": 512,
        "deepseek2.attention.q_lora_rank": 0,
        "deepseek2.rope.dimension_count": 64,
        "deepseek2.attention.key_length": 192,
        "deepseek2.attention.value_length": 128,
    }
    spec = spec_from_gguf_fields(fields)
    assert spec.model_type == "deepseek_v2"
    assert spec.attention.kind == "mla"
    assert spec.attention.kv_lora_rank == 512
    assert spec.attention.qk_nope_head_dim == 128
    assert spec.moe.num_experts == 64
    assert spec.moe.shared_expert_intermediate_size == 2816
    assert spec.moe.first_k_dense == 1
