"""Model registry: named presets for the production model zoo.

Reference analog: kt-kernel's CLI model registry (kt-kernel/python/cli/
model.py — `kt model list/show/download`): a catalog mapping friendly
names to architectures, sizes and recommended run configs. Re-designed
for this stack: each entry carries the PUBLIC HF config values needed by
spec_from_hf_config plus TPU-side advice (quant kinds, HBM fit on a v5e,
host-offload recommendation). No download manager — this environment has
no egress; `path_hint` names the upstream HF repo for provenance.

Size arithmetic intentionally mirrors models/init.py's allocation so the
`kt models show` numbers match what actually materializes on-chip.
"""

from __future__ import annotations

import dataclasses

from ktransformers_tpu.models.spec import ModelSpec, spec_from_hf_config

V5E_HBM_GB = 16.0  # one TPU v5e chip

# bytes per weight for each QTensor kind (quant/formats.py): int4 kinds
# are nibble-packed (0.5 B) + group scales; int8 1 B + scales; mx kinds
# add one ue8m0 scale byte per 32-group.
_BYTES_PER_PARAM = {
    "bf16": 2.0,
    "fp8": 1.0 + 2 / 128,
    "int8": 1.0 + 2 / 128,
    "int8_g": 1.0 + 2 / 128,
    "int8_gz": 1.0 + 4 / 128,
    "int4": 0.5 + 2 / 128,
    "int4_g": 0.5 + 2 / 128,
    "int4_gz": 0.5 + 4 / 128,
    "mxfp4": 0.5 + 1 / 32,
    "mxfp8": 1.0 + 1 / 32,
}


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    name: str  # registry key
    hf_id: str  # upstream checkpoint this preset mirrors
    config: dict  # HF config.json subset consumed by spec_from_hf_config
    total_params_b: float  # public headline size (for display only)
    active_params_b: float  # activated per token (MoE) or == total
    quant: str = "int8"  # recommended dense/attention kind
    moe_quant: str = "int4_g"  # recommended routed-expert kind
    notes: str = ""

    def spec(self) -> ModelSpec:
        return spec_from_hf_config(dict(self.config))


def _p(spec: ModelSpec) -> dict:
    """Parameter counts by role, mirroring models/init.py allocation."""
    h = spec.hidden_size
    a = spec.attention
    counts = {"embed": spec.vocab_size * h * (1 if spec.tie_word_embeddings else 2)}
    attn = 0.0
    if a.kind == "mla":
        qd = a.qk_nope_head_dim + a.qk_rope_head_dim
        if a.q_lora_rank:
            attn += h * a.q_lora_rank + a.q_lora_rank * a.num_heads * qd
        else:
            attn += h * a.num_heads * qd
        attn += h * (a.kv_lora_rank + a.qk_rope_head_dim)
        attn += a.kv_lora_rank * a.num_heads * (a.qk_nope_head_dim + a.v_head_dim)
        attn += a.num_heads * a.v_head_dim * h
    else:
        attn += h * a.num_heads * a.head_dim * (2 if a.gated_output else 1)
        attn += 2 * h * a.num_kv_heads * a.head_dim
        attn += a.num_heads * a.head_dim * h
    m = spec.moe
    n_moe = 0
    if m is not None:
        n_moe = sum(
            1 for li in range(spec.num_layers)
            if li >= m.first_k_dense
            and (li - m.moe_layer_offset) % m.moe_layer_freq == 0
            and li not in m.mlp_only_layers
        )
    n_dense = spec.num_layers - n_moe
    counts["attn"] = attn * spec.num_layers
    counts["dense_mlp"] = n_dense * 3 * h * spec.intermediate_size
    if m is not None:
        counts["experts"] = n_moe * m.num_experts * 3 * h * m.moe_intermediate_size
        counts["shared"] = n_moe * 3 * h * m.shared_expert_intermediate_size
        counts["router"] = n_moe * m.num_experts * h
        counts["active_experts"] = n_moe * m.top_k * 3 * h * m.moe_intermediate_size
    return counts


def estimate_bytes(spec: ModelSpec, quant: str, moe_quant: str) -> dict:
    """Weight bytes by role + the per-token active read set (the decode
    bandwidth bound), at the given quant kinds."""
    c = _p(spec)
    bq, bm = _BYTES_PER_PARAM[quant], _BYTES_PER_PARAM[moe_quant]
    resident = {
        "embed_gb": c["embed"] * 2 / 1e9,  # embeddings stay bf16
        "attn_gb": c["attn"] * bq / 1e9,
        "dense_mlp_gb": c["dense_mlp"] * bq / 1e9,
        "experts_gb": c.get("experts", 0) * bm / 1e9,
        "shared_gb": (c.get("shared", 0) + c.get("router", 0)) * bq / 1e9,
    }
    total = sum(resident.values())
    active = (
        total
        - resident["experts_gb"]
        - resident["embed_gb"] / 2  # lm_head read, embed row lookup ~free
        + c.get("active_experts", 0) * bm / 1e9
    )
    return {
        **{k: round(v, 2) for k, v in resident.items()},
        "total_gb": round(total, 2),
        "active_gb_per_token": round(active, 3),
        "fits_v5e": total < V5E_HBM_GB * 0.85,  # leave room for KV + jit
        "min_v5e_chips": max(1, int(-(-total // (V5E_HBM_GB * 0.85)))),
    }


# -- catalog -----------------------------------------------------------------
# Public config values from each model's HF config.json. Flagship MoE
# entries mirror tests/test_flagship_configs.py.

_DS_V3 = dict(
    model_type="deepseek_v3", vocab_size=129280, hidden_size=7168,
    intermediate_size=18432, moe_intermediate_size=2048,
    num_hidden_layers=61, num_attention_heads=128, num_key_value_heads=128,
    n_shared_experts=1, n_routed_experts=256, num_experts_per_tok=8,
    n_group=8, topk_group=4, first_k_dense_replace=3, norm_topk_prob=True,
    routed_scaling_factor=2.5, scoring_func="sigmoid",
    topk_method="noaux_tc", kv_lora_rank=512, q_lora_rank=1536,
    qk_rope_head_dim=64, qk_nope_head_dim=128, v_head_dim=128,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=163840,
    rope_scaling=dict(type="yarn", factor=40.0, beta_fast=32, beta_slow=1,
                      mscale=1.0, mscale_all_dim=1.0,
                      original_max_position_embeddings=4096),
)

REGISTRY: dict[str, ModelEntry] = {}


def _add(entry: ModelEntry) -> None:
    REGISTRY[entry.name] = entry


_add(ModelEntry(
    "deepseek-v2-lite", "deepseek-ai/DeepSeek-V2-Lite",
    dict(model_type="deepseek_v2", vocab_size=102400, hidden_size=2048,
         intermediate_size=10944, moe_intermediate_size=1408,
         num_hidden_layers=27, num_attention_heads=16,
         num_key_value_heads=16, n_shared_experts=2, n_routed_experts=64,
         num_experts_per_tok=6, first_k_dense_replace=1, moe_layer_freq=1,
         topk_method="greedy", norm_topk_prob=False,
         routed_scaling_factor=1.0, scoring_func="softmax",
         kv_lora_rank=512, q_lora_rank=None, qk_rope_head_dim=64,
         qk_nope_head_dim=128, v_head_dim=128, rms_norm_eps=1e-6,
         rope_theta=10000.0, max_position_embeddings=163840),
    15.7, 2.4, notes="bench.py model; single-chip resident"))

_add(ModelEntry(
    "deepseek-v2", "deepseek-ai/DeepSeek-V2",
    dict(model_type="deepseek_v2", vocab_size=102400, hidden_size=5120,
         intermediate_size=12288, moe_intermediate_size=1536,
         num_hidden_layers=60, num_attention_heads=128,
         num_key_value_heads=128, n_shared_experts=2, n_routed_experts=160,
         num_experts_per_tok=6, n_group=8, topk_group=3,
         first_k_dense_replace=1, moe_layer_freq=1,
         topk_method="group_limited_greedy", norm_topk_prob=False,
         routed_scaling_factor=16.0, scoring_func="softmax",
         kv_lora_rank=512, q_lora_rank=1536, qk_rope_head_dim=64,
         qk_nope_head_dim=128, v_head_dim=128, rms_norm_eps=1e-6,
         rope_theta=10000.0, max_position_embeddings=163840),
    236.0, 21.0, notes="host-offload or multi-chip EP"))

_add(ModelEntry("deepseek-v3", "deepseek-ai/DeepSeek-V3", _DS_V3,
                671.0, 37.0,
                notes="the reference's headline model; host-offload"))
_add(ModelEntry("deepseek-r1", "deepseek-ai/DeepSeek-R1", _DS_V3,
                671.0, 37.0, notes="V3 architecture"))

_add(ModelEntry(
    "kimi-k2", "moonshotai/Kimi-K2-Instruct",
    dict(_DS_V3, vocab_size=163840, num_attention_heads=64,
         num_key_value_heads=64, n_routed_experts=384, n_group=1,
         topk_group=1, first_k_dense_replace=1),
    1026.0, 32.0, notes="1T-class; reference K2 group-128 int4 target"))

_add(ModelEntry(
    "qwen3-235b-a22b", "Qwen/Qwen3-235B-A22B",
    dict(model_type="qwen3_moe", vocab_size=151936, hidden_size=4096,
         intermediate_size=12288, moe_intermediate_size=1536,
         num_hidden_layers=94, num_attention_heads=64,
         num_key_value_heads=4, head_dim=128, num_experts=128,
         num_experts_per_tok=8, decoder_sparse_step=1, norm_topk_prob=True,
         rms_norm_eps=1e-6, rope_theta=1000000.0,
         max_position_embeddings=40960),
    235.0, 22.0))

_add(ModelEntry(
    "qwen3-30b-a3b", "Qwen/Qwen3-30B-A3B",
    dict(model_type="qwen3_moe", vocab_size=151936, hidden_size=2048,
         intermediate_size=6144, moe_intermediate_size=768,
         num_hidden_layers=48, num_attention_heads=32,
         num_key_value_heads=4, head_dim=128, num_experts=128,
         num_experts_per_tok=8, decoder_sparse_step=1, norm_topk_prob=True,
         rms_norm_eps=1e-6, rope_theta=1000000.0,
         max_position_embeddings=40960),
    30.5, 3.3, notes="single-chip resident at int4"))

_add(ModelEntry(
    "qwen2-57b-a14b", "Qwen/Qwen2-57B-A14B-Instruct",
    dict(model_type="qwen2_moe", vocab_size=151936, hidden_size=3584,
         intermediate_size=18944, moe_intermediate_size=2560,
         shared_expert_intermediate_size=20480, num_hidden_layers=28,
         num_attention_heads=28, num_key_value_heads=4, num_experts=64,
         num_experts_per_tok=8, decoder_sparse_step=1, norm_topk_prob=False,
         rms_norm_eps=1e-6, rope_theta=1000000.0,
         max_position_embeddings=32768),
    57.4, 14.2))

_add(ModelEntry(
    "mixtral-8x7b", "mistralai/Mixtral-8x7B-Instruct-v0.1",
    dict(model_type="mixtral", vocab_size=32000, hidden_size=4096,
         intermediate_size=14336, num_hidden_layers=32,
         num_attention_heads=32, num_key_value_heads=8,
         num_local_experts=8, num_experts_per_tok=2, rms_norm_eps=1e-5,
         rope_theta=1000000.0, max_position_embeddings=32768),
    46.7, 12.9))

_add(ModelEntry(
    "llama-3.1-8b", "meta-llama/Llama-3.1-8B-Instruct",
    dict(model_type="llama", vocab_size=128256, hidden_size=4096,
         intermediate_size=14336, num_hidden_layers=32,
         num_attention_heads=32, num_key_value_heads=8, rms_norm_eps=1e-5,
         rope_theta=500000.0, max_position_embeddings=131072,
         rope_scaling=dict(rope_type="llama3", factor=8.0,
                           low_freq_factor=1.0, high_freq_factor=4.0,
                           original_max_position_embeddings=8192)),
    8.0, 8.0, quant="int8", moe_quant="int8", notes="dense"))

_add(ModelEntry(
    "qwen3-next-80b-a3b", "Qwen/Qwen3-Next-80B-A3B-Instruct",
    dict(model_type="qwen3_next", vocab_size=151936, hidden_size=2048,
         intermediate_size=5120, moe_intermediate_size=512,
         shared_expert_intermediate_size=512, num_hidden_layers=48,
         num_attention_heads=16, num_key_value_heads=2, head_dim=256,
         linear_num_value_heads=32, linear_num_key_heads=16,
         linear_key_head_dim=128, linear_value_head_dim=128,
         linear_conv_kernel_dim=4, num_experts=512, num_experts_per_tok=10,
         norm_topk_prob=True, decoder_sparse_step=1, rms_norm_eps=1e-6,
         rope_theta=10000000.0, max_position_embeddings=262144,
         # 3 GatedDeltaNet layers per full-attention layer
         # (full_attention_interval=4)
         layer_types=[
             "full_attention" if i % 4 == 3 else "linear_attention"
             for i in range(48)
         ]),
    80.0, 3.0, notes="hybrid GatedDeltaNet linear attention"))

_add(ModelEntry(
    "glm-4.5-air", "zai-org/GLM-4.5-Air",
    dict(model_type="glm4_moe", vocab_size=151552, hidden_size=4096,
         intermediate_size=10944, moe_intermediate_size=1408,
         num_hidden_layers=46, num_attention_heads=96,
         num_key_value_heads=8, head_dim=128, partial_rotary_factor=0.5,
         use_qk_norm=True, n_routed_experts=128, num_experts_per_tok=8,
         n_shared_experts=1, n_group=1, topk_group=1, norm_topk_prob=True,
         routed_scaling_factor=1.0, first_k_dense_replace=1,
         rms_norm_eps=1e-5, rope_theta=1000000.0,
         max_position_embeddings=131072),
    106.0, 12.0))

for name, hf in (("smallthinker-21b", "PowerInfer/SmallThinker-21BA3B-Instruct"),):
    # per-layer rope/SWA layouts live in the spec translation; the preset
    # only records the public dimensions (tests/test_smallthinker.py)
    _add(ModelEntry(
        name, hf,
        dict(model_type="smallthinker", vocab_size=151936, hidden_size=2560,
             num_hidden_layers=52, num_attention_heads=28,
             num_key_value_heads=4, head_dim=128, rope_theta=1.5e6,
             rms_norm_eps=1e-6, sliding_window_size=4096,
             # NoPE every 4th layer / SWA on rope layers (public config's
             # rope_layout/sliding_window_layout pattern)
             rope_layout=[0 if i % 4 == 3 else 1 for i in range(52)],
             sliding_window_layout=[0 if i % 4 == 3 else 1 for i in range(52)],
             moe_num_primary_experts=64, moe_num_active_primary_experts=6,
             moe_ffn_hidden_size=768, dense_ffn_hidden_size=768,
             moe_enable_early_router=True,
             moe_primary_router_apply_softmax=False,
             moe_enable_secondary_experts=False,
             max_position_embeddings=16384),
        21.5, 3.0))


def list_models() -> list[dict]:
    out = []
    for e in REGISTRY.values():
        try:
            est = estimate_bytes(e.spec(), e.quant, e.moe_quant)
        except Exception as exc:  # pragma: no cover - preset translation bug
            est = {"error": str(exc)}
        out.append({
            "name": e.name,
            "hf_id": e.hf_id,
            "params_b": e.total_params_b,
            "active_b": e.active_params_b,
            "quant": f"{e.quant}/{e.moe_quant}",
            "total_gb": est.get("total_gb"),
            "fits_v5e": est.get("fits_v5e"),
            "min_v5e_chips": est.get("min_v5e_chips"),
            "notes": e.notes,
        })
    return out


def show_model(name: str) -> dict:
    e = REGISTRY[name]
    spec = e.spec()
    est = estimate_bytes(spec, e.quant, e.moe_quant)
    rec: dict = {"quant": e.quant, "moe_quant": e.moe_quant}
    if not est["fits_v5e"]:
        rec["offload"] = (
            "routed experts -> host RAM (offload/host_engine.py) on one "
            "chip, or expert-parallel over "
            f">={est['min_v5e_chips']} chips (parallel/ep.py)"
        )
    return {
        "name": e.name,
        "hf_id": e.hf_id,
        "model_type": spec.model_type,
        "layers": spec.num_layers,
        "hidden": spec.hidden_size,
        "attention": spec.attention.kind,
        "experts": spec.moe.num_experts if spec.moe else 0,
        "top_k": spec.moe.top_k if spec.moe else 0,
        "estimate": est,
        "recommended": rec,
        "notes": e.notes,
    }
