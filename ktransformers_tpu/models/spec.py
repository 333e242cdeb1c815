"""ModelSpec: static architecture description + HF config translators.

The TPU analog of the reference's YAML injection rules *plus* modeling files:
a single declarative record of everything the decoder needs, derived from a
HuggingFace config dict. Supported families mirror the reference model zoo
(archive/ktransformers/models/: deepseek v2/v3, qwen2/3-moe, mixtral, llama,
qwen2/3 dense, glm4-moe).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from ktransformers_tpu.ops.activations import ActivationConfig
from ktransformers_tpu.ops.gate import GateConfig
from ktransformers_tpu.ops.rope import RopeConfig


@dataclasses.dataclass(frozen=True)
class AttentionSpec:
    kind: str  # "gqa" | "mla"
    num_heads: int
    num_kv_heads: int
    head_dim: int  # gqa head dim; for mla = qk_nope + qk_rope
    # mla-only:
    q_lora_rank: int | None = None
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    # knobs
    attention_bias: bool = False
    qk_norm: bool = False  # qwen3/glm4-style per-head RMSNorm on q/k
    partial_rotary_dim: int = 0  # 0 = rotate the whole head (glm4: half)
    softmax_scale: float | None = None  # None = head_dim**-0.5 (x yarn mscale)
    gated_output: bool = False  # qwen3-next: q_proj emits q||gate and the
    # attention output is multiplied by sigmoid(gate) before o_proj
    sliding_window: int = 0  # smallthinker: window for swa_layout layers

    @property
    def rotary_dim(self) -> int:
        if self.kind == "mla":
            return self.qk_rope_head_dim
        return self.partial_rotary_dim or self.head_dim


@dataclasses.dataclass(frozen=True)
class MoESpec:
    num_experts: int
    top_k: int
    moe_intermediate_size: int
    gate: GateConfig = None  # type: ignore[assignment]
    shared_expert_intermediate_size: int = 0  # 0 = no shared experts
    shared_expert_gate: bool = False  # qwen2-moe sigmoid gate on shared out
    first_k_dense: int = 0  # first_k_dense_replace
    moe_layer_freq: int = 1
    # deepseek checks layer_idx % freq == 0; qwen checks (layer_idx+1) % step
    moe_layer_offset: int = 0
    mlp_only_layers: tuple[int, ...] = ()  # qwen3-moe explicit dense layers
    # smallthinker: router consumes the LAYER INPUT (pre-attention
    # residual) instead of the post-attention hidden state
    early_router: bool = False

    def is_moe_layer(self, layer_idx: int) -> bool:
        if layer_idx in self.mlp_only_layers:
            return False
        return (
            layer_idx >= self.first_k_dense
            and (layer_idx + self.moe_layer_offset) % self.moe_layer_freq == 0
        )


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    model_type: str
    vocab_size: int
    hidden_size: int
    num_layers: int
    intermediate_size: int  # dense-MLP layers
    rms_norm_eps: float
    attention: AttentionSpec
    rope: RopeConfig
    activation: ActivationConfig = ActivationConfig()
    moe: MoESpec | None = None
    tie_word_embeddings: bool = False
    max_position: int = 4096
    # hybrid models (qwen3-next): per-layer kind "full" | "linear"; None =
    # all full attention. linear_attn holds the GatedDeltaNet dims.
    layer_kinds: tuple | None = None
    linear_attn: object | None = None
    # smallthinker per-layer layouts: rope on/off and sliding-window
    # on/off (window size in attention.sliding_window)
    rope_layout: tuple | None = None
    swa_layout: tuple | None = None

    def layer_uses_rope(self, li: int) -> bool:
        return self.rope_layout is None or bool(self.rope_layout[li])

    def layer_window(self, li: int) -> int:
        """0 = full attention; else the sliding window size."""
        if self.swa_layout is None or not self.swa_layout[li]:
            return 0
        return self.attention.sliding_window

    def layer_kind(self, li: int) -> str:
        if self.layer_kinds is None:
            return "full"
        return self.layer_kinds[li]


def _rope_from_hf(cfg: dict, dim: int, interleaved: bool) -> RopeConfig:
    scaling = cfg.get("rope_scaling") or {}
    stype = scaling.get("type") or scaling.get("rope_type")
    return RopeConfig(
        dim=dim,
        base=float(cfg.get("rope_theta", 10000.0)),
        max_position=int(cfg.get("max_position_embeddings", 4096)),
        scaling_type=stype if stype in ("yarn", "linear") else None,
        scaling_factor=float(scaling.get("factor", 1.0)),
        original_max_position=int(
            scaling.get("original_max_position_embeddings", 4096)
        ),
        beta_fast=float(scaling.get("beta_fast", 32.0)),
        beta_slow=float(scaling.get("beta_slow", 1.0)),
        mscale=float(scaling.get("mscale", 1.0)),
        mscale_all_dim=float(scaling.get("mscale_all_dim", 0.0)),
        interleaved=interleaved,
    )


def _deepseek_spec(cfg: dict, model_type: str) -> ModelSpec:
    v3 = model_type == "deepseek_v3"
    qk_rope = int(cfg["qk_rope_head_dim"])
    qk_nope = int(cfg["qk_nope_head_dim"])
    attn = AttentionSpec(
        kind="mla",
        num_heads=int(cfg["num_attention_heads"]),
        num_kv_heads=int(cfg["num_attention_heads"]),
        head_dim=qk_nope + qk_rope,
        q_lora_rank=cfg.get("q_lora_rank"),
        kv_lora_rank=int(cfg["kv_lora_rank"]),
        qk_nope_head_dim=qk_nope,
        qk_rope_head_dim=qk_rope,
        v_head_dim=int(cfg["v_head_dim"]),
        attention_bias=bool(cfg.get("attention_bias", False)),
    )
    topk_method = cfg.get("topk_method", "noaux_tc" if v3 else "greedy")
    gate = GateConfig(
        num_experts=int(cfg["n_routed_experts"]),
        top_k=int(cfg["num_experts_per_tok"]),
        scoring="sigmoid" if cfg.get("scoring_func", "softmax") == "sigmoid" or v3 else "softmax",
        group_method={
            "greedy": "none",
            "group_limited_greedy": "group_max",
            "noaux_tc": "group_top2sum",
        }[topk_method],
        n_group=int(cfg.get("n_group", 1) or 1),
        topk_group=int(cfg.get("topk_group", 1) or 1),
        norm_topk_prob=bool(cfg.get("norm_topk_prob", v3)),
        routed_scaling_factor=float(cfg.get("routed_scaling_factor", 1.0)),
        has_correction_bias=(topk_method == "noaux_tc"),
    )
    moe = MoESpec(
        num_experts=int(cfg["n_routed_experts"]),
        top_k=int(cfg["num_experts_per_tok"]),
        moe_intermediate_size=int(cfg["moe_intermediate_size"]),
        gate=gate,
        shared_expert_intermediate_size=int(cfg.get("n_shared_experts") or 0)
        * int(cfg["moe_intermediate_size"]),
        first_k_dense=int(cfg.get("first_k_dense_replace", 0)),
        moe_layer_freq=int(cfg.get("moe_layer_freq", 1)),
    )
    return ModelSpec(
        model_type=model_type,
        vocab_size=int(cfg["vocab_size"]),
        hidden_size=int(cfg["hidden_size"]),
        num_layers=int(cfg["num_hidden_layers"]),
        intermediate_size=int(cfg["intermediate_size"]),
        rms_norm_eps=float(cfg.get("rms_norm_eps", 1e-6)),
        attention=attn,
        rope=_rope_from_hf(cfg, qk_rope, interleaved=True),
        moe=moe,
        tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
        max_position=int(cfg.get("max_position_embeddings", 4096)),
    )


def _gqa_attn(cfg: dict, qk_norm: bool = False) -> AttentionSpec:
    heads = int(cfg["num_attention_heads"])
    head_dim = int(cfg.get("head_dim") or cfg["hidden_size"] // heads)
    prf = float(cfg.get("partial_rotary_factor", 1.0) or 1.0)
    return AttentionSpec(
        kind="gqa",
        num_heads=heads,
        num_kv_heads=int(cfg.get("num_key_value_heads", heads)),
        head_dim=head_dim,
        attention_bias=bool(cfg.get("attention_bias", False))
        or cfg.get("model_type") in ("qwen2", "qwen2_moe"),
        qk_norm=qk_norm,
        partial_rotary_dim=int(head_dim * prf) if prf < 1.0 else 0,
    )


def _qwen_moe_spec(cfg: dict, model_type: str) -> ModelSpec:
    q3 = model_type == "qwen3_moe"
    gate = GateConfig(
        num_experts=int(cfg["num_experts"]),
        top_k=int(cfg["num_experts_per_tok"]),
        scoring="softmax",
        norm_topk_prob=bool(cfg.get("norm_topk_prob", False)),
    )
    moe = MoESpec(
        num_experts=int(cfg["num_experts"]),
        top_k=int(cfg["num_experts_per_tok"]),
        moe_intermediate_size=int(cfg["moe_intermediate_size"]),
        gate=gate,
        shared_expert_intermediate_size=0
        if q3
        else int(cfg.get("shared_expert_intermediate_size", 0)),
        shared_expert_gate=not q3,
        moe_layer_freq=int(cfg.get("decoder_sparse_step", 1)),
        moe_layer_offset=1,
        mlp_only_layers=tuple(cfg.get("mlp_only_layers", []) or []),
    )
    return ModelSpec(
        model_type=model_type,
        vocab_size=int(cfg["vocab_size"]),
        hidden_size=int(cfg["hidden_size"]),
        num_layers=int(cfg["num_hidden_layers"]),
        intermediate_size=int(cfg["intermediate_size"]),
        rms_norm_eps=float(cfg.get("rms_norm_eps", 1e-6)),
        attention=_gqa_attn(cfg, qk_norm=q3),
        rope=_rope_from_hf(
            cfg,
            int(cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"]),
            interleaved=False,
        ),
        moe=moe,
        tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
        max_position=int(cfg.get("max_position_embeddings", 4096)),
    )


def _qwen3_next_spec(cfg: dict) -> ModelSpec:
    """Qwen3-Next: hybrid GatedDeltaNet (3/4 of layers) + gated full
    attention (1/4), qwen2-moe-style MoE with gated shared expert.
    Reference: archive/ktransformers/models/modeling_qwen3_next.py."""
    from ktransformers_tpu.ops.linear_attention import LinearAttentionSpec

    base = _qwen_moe_spec(cfg, "qwen3_moe")
    head_dim = int(cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"])
    prf = float(cfg.get("partial_rotary_factor", 0.25))
    attn = dataclasses.replace(
        base.attention,
        qk_norm=True,
        gated_output=True,
        attention_bias=bool(cfg.get("attention_bias", False)),
        partial_rotary_dim=int(head_dim * prf) if prf < 1.0 else 0,
        num_kv_heads=int(cfg["num_key_value_heads"]),
        head_dim=head_dim,
    )
    kinds = tuple(
        "linear" if t == "linear_attention" else "full"
        for t in cfg["layer_types"]
    )
    moe = dataclasses.replace(
        base.moe,
        shared_expert_intermediate_size=int(
            cfg.get("shared_expert_intermediate_size", 0)
        ),
        shared_expert_gate=True,
    )
    rot = int(head_dim * prf) if prf < 1.0 else head_dim
    return dataclasses.replace(
        base,
        model_type="qwen3_next",
        attention=attn,
        moe=moe,
        rope=_rope_from_hf(cfg, rot, interleaved=False),
        layer_kinds=kinds,
        linear_attn=LinearAttentionSpec(
            num_v_heads=int(cfg["linear_num_value_heads"]),
            num_k_heads=int(cfg["linear_num_key_heads"]),
            head_k_dim=int(cfg["linear_key_head_dim"]),
            head_v_dim=int(cfg["linear_value_head_dim"]),
            conv_kernel=int(cfg.get("linear_conv_kernel_dim", 4)),
        ),
    )


def _smallthinker_spec(cfg: dict) -> ModelSpec:
    """SmallThinker (4B/21B MoE): plain GQA with per-layer nope/rope and
    per-layer sliding window, ReLU-GLU experts, early (pre-attention)
    router, sigmoid-or-softmax top-k weighting. Reference:
    archive/ktransformers/models/modeling_smallthinker.py,
    configuration_smallthinker.py."""
    if cfg.get("moe_enable_secondary_experts"):
        raise NotImplementedError(
            "smallthinker secondary experts are not supported yet"
        )
    n_layers = int(cfg["num_hidden_layers"])
    e = int(cfg["moe_num_primary_experts"])
    gate = GateConfig(
        num_experts=e,
        top_k=int(cfg["moe_num_active_primary_experts"]),
        scoring="softmax"
        if cfg.get("moe_primary_router_apply_softmax", True)
        else "sigmoid",
        norm_topk_prob=bool(cfg.get("moe_primary_router_apply_softmax", True)),
    )
    moe_layout = list(cfg.get("moe_layer_layout") or [1] * n_layers)
    moe = MoESpec(
        num_experts=e,
        top_k=gate.top_k,
        moe_intermediate_size=int(cfg["moe_ffn_hidden_size"]),
        gate=gate,
        mlp_only_layers=tuple(
            li for li in range(n_layers) if not moe_layout[li]
        ),
        early_router=bool(cfg.get("moe_enable_early_router", True)),
    )
    head_dim = int(cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"])
    attn = AttentionSpec(
        kind="gqa",
        num_heads=int(cfg["num_attention_heads"]),
        num_kv_heads=int(cfg["num_key_value_heads"]),
        head_dim=head_dim,
        sliding_window=int(cfg.get("sliding_window_size", 0)),
    )
    rope_layout = cfg.get("rope_layout")
    swa_layout = cfg.get("sliding_window_layout")
    return ModelSpec(
        model_type="smallthinker",
        vocab_size=int(cfg["vocab_size"]),
        hidden_size=int(cfg["hidden_size"]),
        num_layers=n_layers,
        intermediate_size=int(
            cfg.get("dense_ffn_hidden_size", cfg.get("moe_ffn_hidden_size"))
        ),
        rms_norm_eps=float(cfg.get("rms_norm_eps", 1e-6)),
        attention=attn,
        rope=_rope_from_hf(cfg, head_dim, interleaved=False),
        activation=ActivationConfig(kind="relu"),
        moe=moe,
        tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
        max_position=int(cfg.get("max_position_embeddings", 4096)),
        rope_layout=None if rope_layout is None else tuple(rope_layout),
        swa_layout=None if swa_layout is None else tuple(swa_layout),
    )


def _mixtral_spec(cfg: dict) -> ModelSpec:
    # Mixtral: softmax over all experts, top-k, renormalize — identical to
    # softmax + norm_topk_prob.
    gate = GateConfig(
        num_experts=int(cfg["num_local_experts"]),
        top_k=int(cfg["num_experts_per_tok"]),
        scoring="softmax",
        norm_topk_prob=True,
    )
    moe = MoESpec(
        num_experts=int(cfg["num_local_experts"]),
        top_k=int(cfg["num_experts_per_tok"]),
        moe_intermediate_size=int(cfg["intermediate_size"]),
        gate=gate,
    )
    return ModelSpec(
        model_type="mixtral",
        vocab_size=int(cfg["vocab_size"]),
        hidden_size=int(cfg["hidden_size"]),
        num_layers=int(cfg["num_hidden_layers"]),
        intermediate_size=int(cfg["intermediate_size"]),
        rms_norm_eps=float(cfg.get("rms_norm_eps", 1e-5)),
        attention=_gqa_attn(cfg),
        rope=_rope_from_hf(
            cfg,
            int(cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"]),
            interleaved=False,
        ),
        moe=moe,
        tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
        max_position=int(cfg.get("max_position_embeddings", 4096)),
    )


def _dense_spec(cfg: dict, model_type: str) -> ModelSpec:
    qk_norm = model_type in ("qwen3",)
    return ModelSpec(
        model_type=model_type,
        vocab_size=int(cfg["vocab_size"]),
        hidden_size=int(cfg["hidden_size"]),
        num_layers=int(cfg["num_hidden_layers"]),
        intermediate_size=int(cfg["intermediate_size"]),
        rms_norm_eps=float(cfg.get("rms_norm_eps", 1e-6)),
        attention=_gqa_attn(cfg, qk_norm=qk_norm),
        rope=_rope_from_hf(
            cfg,
            int(cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"]),
            interleaved=False,
        ),
        moe=None,
        tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
        max_position=int(cfg.get("max_position_embeddings", 4096)),
    )


def _glm4_moe_spec(cfg: dict) -> ModelSpec:
    """GLM4-MoE: GQA attention with half-rotary + optional qk-norm, a
    DeepSeek-V3-style sigmoid/noaux_tc router, dense first_k layers, shared
    experts (ungated)."""
    gate = GateConfig(
        num_experts=int(cfg["n_routed_experts"]),
        top_k=int(cfg["num_experts_per_tok"]),
        scoring="sigmoid",
        group_method="group_top2sum",
        n_group=int(cfg.get("n_group", 1) or 1),
        topk_group=int(cfg.get("topk_group", 1) or 1),
        norm_topk_prob=bool(cfg.get("norm_topk_prob", True)),
        routed_scaling_factor=float(cfg.get("routed_scaling_factor", 1.0)),
        has_correction_bias=True,
    )
    moe = MoESpec(
        num_experts=int(cfg["n_routed_experts"]),
        top_k=int(cfg["num_experts_per_tok"]),
        moe_intermediate_size=int(cfg["moe_intermediate_size"]),
        gate=gate,
        shared_expert_intermediate_size=int(cfg.get("n_shared_experts") or 0)
        * int(cfg["moe_intermediate_size"]),
        first_k_dense=int(cfg.get("first_k_dense_replace", 1)),
    )
    attn = _gqa_attn(cfg, qk_norm=bool(cfg.get("use_qk_norm", False)))
    return ModelSpec(
        model_type="glm4_moe",
        vocab_size=int(cfg["vocab_size"]),
        hidden_size=int(cfg["hidden_size"]),
        num_layers=int(cfg["num_hidden_layers"]),
        intermediate_size=int(cfg["intermediate_size"]),
        rms_norm_eps=float(cfg.get("rms_norm_eps", 1e-5)),
        attention=attn,
        rope=_rope_from_hf(cfg, attn.rotary_dim, interleaved=False),
        moe=moe,
        tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
        max_position=int(cfg.get("max_position_embeddings", 4096)),
    )


_TRANSLATORS = {
    "deepseek_v2": lambda c: _deepseek_spec(c, "deepseek_v2"),
    "deepseek_v3": lambda c: _deepseek_spec(c, "deepseek_v3"),
    "kimi_k2": lambda c: _deepseek_spec(c, "deepseek_v3"),
    "qwen2_moe": lambda c: _qwen_moe_spec(c, "qwen2_moe"),
    "qwen3_moe": lambda c: _qwen_moe_spec(c, "qwen3_moe"),
    "mixtral": _mixtral_spec,
    "qwen3_next": _qwen3_next_spec,
    "smallthinker": _smallthinker_spec,
    "glm4_moe": _glm4_moe_spec,
    "llama": lambda c: _dense_spec(c, "llama"),
    "qwen2": lambda c: _dense_spec(c, "qwen2"),
    "qwen3": lambda c: _dense_spec(c, "qwen3"),
}


def spec_from_hf_config(cfg: Any) -> ModelSpec:
    """Build a ModelSpec from an HF config object or dict."""
    if not isinstance(cfg, dict):
        cfg = cfg.to_dict()
    mt = cfg.get("model_type")
    if mt not in _TRANSLATORS:
        raise ValueError(
            f"unsupported model_type {mt!r}; supported: {sorted(_TRANSLATORS)}"
        )
    return _TRANSLATORS[mt](cfg)


# -- GGUF metadata -> ModelSpec ---------------------------------------------

_GGUF_ARCH_TO_HF = {
    "deepseek2": "deepseek_v2",
    "deepseek3": "deepseek_v3",
    "qwen2moe": "qwen2_moe",
    "qwen3moe": "qwen3_moe",
    "llama": "llama",
    "qwen2": "qwen2",
    "qwen3": "qwen3",
    "glm4moe": "glm4_moe",
}


def spec_from_gguf_fields(fields: dict) -> ModelSpec:
    """Build a ModelSpec from GGUF metadata (llama.cpp key conventions),
    so a bare .gguf file is runnable without the HF config.json
    (reference analog: GGUFLoader's metadata-driven model setup,
    archive/ktransformers/util/custom_gguf.py)."""
    arch = fields.get("general.architecture")
    if arch not in _GGUF_ARCH_TO_HF:
        raise ValueError(
            f"unsupported gguf architecture {arch!r}; provide --config"
        )
    mt = _GGUF_ARCH_TO_HF[arch]
    g = lambda key, default=None: fields.get(f"{arch}.{key}", default)

    heads = int(g("attention.head_count"))
    cfg: dict = {
        "model_type": mt,
        "vocab_size": int(g("vocab_size", 0))
        or len(fields.get("tokenizer.ggml.tokens", [])),
        "hidden_size": int(g("embedding_length")),
        "intermediate_size": int(g("feed_forward_length")),
        "num_hidden_layers": int(g("block_count")),
        "num_attention_heads": heads,
        "num_key_value_heads": int(g("attention.head_count_kv", heads)),
        "rms_norm_eps": float(g("attention.layer_norm_rms_epsilon", 1e-6)),
        "rope_theta": float(g("rope.freq_base", 10000.0)),
        "max_position_embeddings": int(g("context_length", 4096)),
        "tie_word_embeddings": False,
    }
    if g("rope.dimension_count") and heads:
        cfg["head_dim"] = (
            int(g("attention.key_length"))
            if g("attention.key_length")
            else None
        )
    if g("rope.scaling.type") == "yarn":
        cfg["rope_scaling"] = {
            "type": "yarn",
            "factor": float(g("rope.scaling.factor", 1.0)),
            "original_max_position_embeddings": int(
                g("rope.scaling.original_context_length", 4096)
            ),
        }
    if g("expert_count"):
        cfg.update(
            n_routed_experts=int(g("expert_count")),
            num_experts=int(g("expert_count")),
            num_experts_per_tok=int(g("expert_used_count", 2)),
            moe_intermediate_size=int(
                g("expert_feed_forward_length", g("feed_forward_length"))
            ),
            n_shared_experts=int(g("expert_shared_count", 0)),
            shared_expert_intermediate_size=int(
                g("expert_shared_feed_forward_length", 0)
            )
            or int(g("expert_shared_count", 0))
            * int(g("expert_feed_forward_length", 0)),
            routed_scaling_factor=float(g("expert_weights_scale", 1.0)),
            norm_topk_prob=bool(g("expert_weights_norm", False)),
            first_k_dense_replace=int(g("leading_dense_block_count", 0)),
        )
        if g("expert_gating_func") == 2 or mt == "deepseek_v3":
            cfg["scoring_func"] = "sigmoid"
            cfg["topk_method"] = "noaux_tc"
        if mt == "deepseek_v2":
            cfg["topk_method"] = "greedy"
    if mt in ("deepseek_v2", "deepseek_v3"):
        cfg.update(
            kv_lora_rank=int(g("attention.kv_lora_rank")),
            q_lora_rank=int(g("attention.q_lora_rank", 0)) or None,
            qk_rope_head_dim=int(g("rope.dimension_count")),
            qk_nope_head_dim=int(g("attention.key_length"))
            - int(g("rope.dimension_count")),
            v_head_dim=int(g("attention.value_length")),
        )
    return spec_from_hf_config(cfg)
