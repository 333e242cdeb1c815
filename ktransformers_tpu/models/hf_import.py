"""Convert HuggingFace torch model weights to the ktransformers_tpu params
pytree (used for parity tests and as the safetensors name-mapping spec).

Analog of the reference's weight loading (archive/ktransformers/util/
custom_loader.py + per-module .load() after injection), minus torch modules:
pure name translation + the MLA kv_b absorption split (operators/
attention.py:69-75 get_absorbed).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.ops.attention import absorb_kv_b_proj
from ktransformers_tpu.ops.moe import MoEWeights
from ktransformers_tpu.quant.formats import quantize


def _t(w) -> np.ndarray:
    """torch [out, in] -> numpy [in, out] float32."""
    return np.ascontiguousarray(
        np.asarray(w.detach().to("cpu").float()).T
    )


def _v(w) -> np.ndarray:
    return np.asarray(w.detach().to("cpu").float())


def _q(arr: np.ndarray, kind: str, group_size: int):
    return quantize(jnp.asarray(arr), kind, group_size=group_size)


def params_from_hf(
    model, spec: ModelSpec, quant: str = "bf16", moe_quant: str | None = None,
    group_size: int = 128,
):
    """Build params from a transformers *torch* model instance."""
    moe_quant = moe_quant or quant
    sd = dict(model.named_parameters())
    sd.update(dict(model.named_buffers()))
    a = spec.attention
    d = spec.hidden_size

    def get(name):
        return sd[name]

    def maybe(name):
        return sd.get(name)

    layers = []
    for li in range(spec.num_layers):
        pre = f"model.layers.{li}"
        lp = {
            "input_norm": jnp.asarray(_v(get(f"{pre}.input_layernorm.weight"))),
            "post_attn_norm": jnp.asarray(
                _v(get(f"{pre}.post_attention_layernorm.weight"))
            ),
        }
        sa = f"{pre}.self_attn"
        if a.kind == "mla":
            kv_b = _v(get(f"{sa}.kv_b_proj.weight")).T  # [R, H*(nope+v)]
            w_uk, w_uv = absorb_kv_b_proj(
                jnp.asarray(kv_b), a.num_heads, a.qk_nope_head_dim, a.v_head_dim
            )
            absorbed_dtype = jnp.float32 if quant == "f32" else jnp.bfloat16
            attn = {
                "kv_a": _q(_t(get(f"{sa}.kv_a_proj_with_mqa.weight")), quant, group_size),
                "kv_a_norm": jnp.asarray(_v(get(f"{sa}.kv_a_layernorm.weight"))),
                "w_uk": w_uk.astype(absorbed_dtype),
                "w_uv": w_uv.astype(absorbed_dtype),
                "o_proj": _q(_t(get(f"{sa}.o_proj.weight")), quant, group_size),
            }
            if maybe(f"{sa}.kv_a_proj_with_mqa.bias") is not None:
                attn["kv_a_bias"] = jnp.asarray(_v(get(f"{sa}.kv_a_proj_with_mqa.bias")))
            if a.q_lora_rank:
                attn["q_a"] = _q(_t(get(f"{sa}.q_a_proj.weight")), quant, group_size)
                attn["q_a_norm"] = jnp.asarray(_v(get(f"{sa}.q_a_layernorm.weight")))
                attn["q_b"] = _q(_t(get(f"{sa}.q_b_proj.weight")), quant, group_size)
            else:
                attn["q_proj"] = _q(_t(get(f"{sa}.q_proj.weight")), quant, group_size)
        else:
            attn = {
                "q_proj": _q(_t(get(f"{sa}.q_proj.weight")), quant, group_size),
                "k_proj": _q(_t(get(f"{sa}.k_proj.weight")), quant, group_size),
                "v_proj": _q(_t(get(f"{sa}.v_proj.weight")), quant, group_size),
                "o_proj": _q(_t(get(f"{sa}.o_proj.weight")), quant, group_size),
            }
            for nm, key in [("q", "q_bias"), ("k", "k_bias"), ("v", "v_bias")]:
                bias = maybe(f"{sa}.{nm}_proj.bias")
                if bias is not None:
                    attn[key] = jnp.asarray(_v(bias))
            if a.qk_norm:
                attn["q_norm"] = jnp.asarray(_v(get(f"{sa}.q_norm.weight")))
                attn["k_norm"] = jnp.asarray(_v(get(f"{sa}.k_norm.weight")))
        lp["attn"] = attn

        mlp_pre = f"{pre}.mlp"
        if spec.moe is not None and spec.moe.is_moe_layer(li):
            m = spec.moe
            if maybe(f"{mlp_pre}.gate.weight") is not None:
                router_w = _v(get(f"{mlp_pre}.gate.weight"))
            else:  # mixtral block_sparse_moe
                mlp_pre = f"{pre}.block_sparse_moe"
                router_w = _v(get(f"{mlp_pre}.gate.weight"))
            moe = {"router_w": jnp.asarray(router_w)}
            bias = maybe(f"{mlp_pre}.gate.e_score_correction_bias")
            if bias is not None:
                moe["router_bias_corr"] = jnp.asarray(_v(bias))

            gus, dns = [], []
            for e in range(m.num_experts):
                if maybe(f"{mlp_pre}.experts.{e}.gate_proj.weight") is not None:
                    g = _t(get(f"{mlp_pre}.experts.{e}.gate_proj.weight"))
                    u = _t(get(f"{mlp_pre}.experts.{e}.up_proj.weight"))
                    dn = _t(get(f"{mlp_pre}.experts.{e}.down_proj.weight"))
                else:  # mixtral w1/w3/w2
                    g = _t(get(f"{mlp_pre}.experts.{e}.w1.weight"))
                    u = _t(get(f"{mlp_pre}.experts.{e}.w3.weight"))
                    dn = _t(get(f"{mlp_pre}.experts.{e}.w2.weight"))
                gus.append(np.concatenate([g, u], axis=1))
                dns.append(dn)
            moe["experts"] = MoEWeights(
                gate_up=_q(np.stack(gus), moe_quant, group_size),
                down=_q(np.stack(dns), moe_quant, group_size),
            )
            if m.shared_expert_intermediate_size:
                base = (
                    f"{mlp_pre}.shared_experts"
                    if maybe(f"{mlp_pre}.shared_experts.gate_proj.weight") is not None
                    else f"{mlp_pre}.shared_expert"
                )
                g = _t(get(f"{base}.gate_proj.weight"))
                u = _t(get(f"{base}.up_proj.weight"))
                moe["shared"] = {
                    "gate_up": _q(np.concatenate([g, u], 1), quant, group_size),
                    "down": _q(_t(get(f"{base}.down_proj.weight")), quant, group_size),
                }
                if m.shared_expert_gate:
                    moe["shared_gate"] = jnp.asarray(
                        _v(get(f"{mlp_pre}.shared_expert_gate.weight"))
                    )
            lp["moe"] = moe
        else:
            g = _t(get(f"{mlp_pre}.gate_proj.weight"))
            u = _t(get(f"{mlp_pre}.up_proj.weight"))
            lp["mlp"] = {
                "gate_up": _q(np.concatenate([g, u], 1), quant, group_size),
                "down": _q(_t(get(f"{mlp_pre}.down_proj.weight")), quant, group_size),
            }
        layers.append(lp)

    params = {
        "embed": jnp.asarray(_v(get("model.embed_tokens.weight"))),
        "layers": layers,
        "final_norm": jnp.asarray(_v(get("model.norm.weight"))),
    }
    if not spec.tie_word_embeddings:
        params["lm_head"] = _q(_t(get("lm_head.weight")), quant, group_size)
    return params
