"""Provider-driven params construction: one builder, three weight sources.

The torch importer (models/hf_import.py), the safetensors loader, and the
GGUF loader all reduce to a `get(name) -> np.ndarray [out, in]` provider
over HF-style tensor names; this module owns the structure mapping
(reference analog: per-module .load() after injection,
archive/ktransformers/util/custom_loader.py + optimize/optimize.py
load_weights).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.ops.attention import absorb_kv_b_proj
from ktransformers_tpu.ops.moe import MoEWeights
from ktransformers_tpu.quant.formats import quantize


class WeightProvider:
    """get(name) -> np.ndarray in HF layout ([out, in] for linear weights)."""

    def get(self, name: str) -> np.ndarray:
        raise NotImplementedError

    def maybe(self, name: str):
        try:
            return self.get(name)
        except KeyError:
            return None


def _q(arr: np.ndarray, kind: str, group_size: int):
    return quantize(jnp.asarray(arr), kind, group_size=group_size)


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _linear_attn_params(get, pre, la, kind, group_size):
    """GatedDeltaNet layer weights (qwen3-next linear_attn.*). The HF
    checkpoint interleaves in_proj_qkvz/ba output features per key-head
    group ([q|k|v|z] x Hk blocks, modeling_qwen3_next.py
    fix_query_key_value_ordering); columns are permuted HERE into the
    clean [q_all | k_all | v_all | z_all] (and [b_all | a_all]) order the
    runtime op splits contiguously (ops/linear_attention.py)."""
    hk, hv = la.num_k_heads, la.num_v_heads
    dk, dv = la.head_k_dim, la.head_v_dim
    r = hv // hk
    blk = 2 * dk + 2 * r * dv

    def seg(off, width):
        # columns [kh*blk + off, +width) for every key head
        return np.concatenate(
            [np.arange(kh * blk + off, kh * blk + off + width)
             for kh in range(hk)]
        )

    perm_qkvz = np.concatenate([
        seg(0, dk), seg(dk, dk), seg(2 * dk, r * dv),
        seg(2 * dk + r * dv, r * dv),
    ])
    blk_ba = 2 * r
    perm_ba = np.concatenate([
        np.concatenate([np.arange(kh * blk_ba, kh * blk_ba + r)
                        for kh in range(hk)]),
        np.concatenate([np.arange(kh * blk_ba + r, kh * blk_ba + 2 * r)
                        for kh in range(hk)]),
    ])

    qkvz = _t(get(f"{pre}.in_proj_qkvz.weight"))[:, perm_qkvz]
    ba = _t(get(f"{pre}.in_proj_ba.weight"))[:, perm_ba]
    conv = np.asarray(get(f"{pre}.conv1d.weight"), np.float32)  # [C, 1, K]
    return {
        "in_proj_qkvz": _q(qkvz, kind, group_size),
        "in_proj_ba": _q(ba, "bf16", group_size),
        "conv_w": jnp.asarray(conv[:, 0, :]),
        "dt_bias": jnp.asarray(np.asarray(get(f"{pre}.dt_bias"), np.float32)),
        "A_log": jnp.asarray(np.asarray(get(f"{pre}.A_log"), np.float32)),
        "norm_w": jnp.asarray(
            np.asarray(get(f"{pre}.norm.weight"), np.float32)
        ),
        "out_proj": _q(
            _t(get(f"{pre}.out_proj.weight")), kind, group_size
        ),
    }


def build_params(
    p: WeightProvider,
    spec: ModelSpec,
    quant: str = "bf16",
    moe_quant: str | None = None,
    group_size: int = 128,
    placement=None,  # PlacementSpec: per-module quant override
    progress: Callable[[str], None] | None = None,
    exact_gguf: bool = False,
    layer_indices=None,  # iterable of layer indices; None = all. With
    # include_head=False this builds a PARTIAL pytree — the streaming
    # converter's unit of work (models/checkpoint.py stream_convert).
    include_head: bool = True,
):
    """Assemble the full params pytree from a provider.

    `placement` (placement/spec.py) overrides quant per module path — the
    load-time half of the reference's YAML injection rules.

    `exact_gguf`: take the provider's lossless repack (GGUF codes + block
    scales carried verbatim into the framework's group formats,
    quant/gguf_repack.py) instead of decode->requantize, so compute matches
    the reference's direct-on-GGUF kernels at the same bit-width."""
    moe_quant = moe_quant or quant
    a = spec.attention
    get, maybe = p.get, p.maybe
    can_exact = exact_gguf and hasattr(p, "get_exact")
    if layer_indices is None:
        layer_indices = range(spec.num_layers)

    def pick(path: str, default_kind: str):
        if placement is None:
            return default_kind, group_size
        return placement.quant_for(path)

    def _exact(name: str):
        if not can_exact:
            return None
        try:
            return p.get_exact(name)
        except KeyError:
            return None

    def qx(name: str, path: str, default_kind: str):
        qt = _exact(name)
        if qt is not None:
            return qt
        return _q(_t(get(name)), *pick(path, default_kind))

    def qx_fused(gname: str, uname: str, fused_name: str, path: str,
                 default_kind: str):
        qt = _exact(fused_name)
        if qt is not None:
            return qt
        g, u = _t(get(gname)), _t(get(uname))
        return _q(np.concatenate([g, u], 1), *pick(path, default_kind))

    def vec(name):
        return jnp.asarray(np.asarray(get(name), np.float32))

    # qwen3-next stores RMSNorm weights zero-centered (output = normed *
    # (1 + w), transformers#29402); fold the +1 in at load so the runtime
    # norm op stays universal
    norm_off = 1.0 if spec.model_type == "qwen3_next" else 0.0

    def nvec(name):
        return vec(name) + norm_off

    layers = []
    for li in layer_indices:
        if progress:
            progress(f"layer {li}/{spec.num_layers}")
        pre = f"model.layers.{li}"
        lp = {
            "input_norm": nvec(f"{pre}.input_layernorm.weight"),
            "post_attn_norm": nvec(f"{pre}.post_attention_layernorm.weight"),
        }
        sa = f"{pre}.self_attn"
        if spec.layer_kind(li) == "linear":
            attn = _linear_attn_params(
                get, f"{pre}.linear_attn", spec.linear_attn,
                *pick(f"layers.{li}.attn", quant),
            )
        elif a.kind == "mla":
            kv_b = _t(get(f"{sa}.kv_b_proj.weight"))  # [R, H*(nope+v)]
            w_uk, w_uv = absorb_kv_b_proj(
                jnp.asarray(kv_b), a.num_heads, a.qk_nope_head_dim, a.v_head_dim
            )
            absorbed_dtype = jnp.float32 if quant == "f32" else jnp.bfloat16
            attn = {
                "kv_a": qx(
                    f"{sa}.kv_a_proj_with_mqa.weight",
                    f"layers.{li}.attn.kv_a", quant,
                ),
                "kv_a_norm": vec(f"{sa}.kv_a_layernorm.weight"),
                "w_uk": w_uk.astype(absorbed_dtype),
                "w_uv": w_uv.astype(absorbed_dtype),
                "o_proj": qx(
                    f"{sa}.o_proj.weight", f"layers.{li}.attn.o_proj", quant
                ),
            }
            if maybe(f"{sa}.kv_a_proj_with_mqa.bias") is not None:
                attn["kv_a_bias"] = vec(f"{sa}.kv_a_proj_with_mqa.bias")
            if a.q_lora_rank:
                attn["q_a"] = qx(
                    f"{sa}.q_a_proj.weight", f"layers.{li}.attn.q_a", quant
                )
                attn["q_a_norm"] = vec(f"{sa}.q_a_layernorm.weight")
                attn["q_b"] = qx(
                    f"{sa}.q_b_proj.weight", f"layers.{li}.attn.q_b", quant
                )
            else:
                attn["q_proj"] = qx(
                    f"{sa}.q_proj.weight", f"layers.{li}.attn.q_proj", quant
                )
        else:
            attn = {}
            for nm in ("q", "k", "v", "o"):
                attn[f"{nm}_proj"] = qx(
                    f"{sa}.{nm}_proj.weight",
                    f"layers.{li}.attn.{nm}_proj", quant,
                )
                bias = maybe(f"{sa}.{nm}_proj.bias")
                if bias is not None and nm != "o":
                    attn[f"{nm}_bias"] = jnp.asarray(np.asarray(bias, np.float32))
            if a.qk_norm:
                attn["q_norm"] = nvec(f"{sa}.q_norm.weight")
                attn["k_norm"] = nvec(f"{sa}.k_norm.weight")
        lp["attn"] = attn

        mlp_pre = f"{pre}.mlp"
        if spec.moe is not None and spec.moe.is_moe_layer(li):
            m = spec.moe
            if maybe(f"{mlp_pre}.gate.weight") is None:
                mlp_pre = f"{pre}.block_sparse_moe"  # mixtral/smallthinker
            router_name = (
                f"{mlp_pre}.primary_router.weight"  # smallthinker
                if maybe(f"{mlp_pre}.gate.weight") is None
                else f"{mlp_pre}.gate.weight"
            )
            moe = {
                "router_w": jnp.asarray(
                    np.asarray(get(router_name), np.float32)
                )
            }
            bias = maybe(f"{mlp_pre}.gate.e_score_correction_bias")
            if bias is not None:
                moe["router_bias_corr"] = jnp.asarray(np.asarray(bias, np.float32))

            exact_gu = _exact(f"{mlp_pre}.experts.gate_up_proj")
            exact_dn = _exact(f"{mlp_pre}.experts.down_proj")
            if exact_gu is not None and exact_dn is not None:
                moe["experts"] = MoEWeights(gate_up=exact_gu, down=exact_dn)
                gus = dns = None
            elif (stacked_gu := maybe(f"{mlp_pre}.experts.gate_up_proj")) is not None:
                # pre-stacked [E, in, 2*out] / down [E, inter, in]
                gus = np.asarray(stacked_gu, np.float32)
                dns = np.asarray(get(f"{mlp_pre}.experts.down_proj"), np.float32)
            else:
                gus_list, dns_list = [], []
                for e in range(m.num_experts):
                    base = f"{mlp_pre}.experts.{e}"
                    if maybe(f"{base}.gate_proj.weight") is not None:
                        g = _t(get(f"{base}.gate_proj.weight"))
                        u = _t(get(f"{base}.up_proj.weight"))
                        dn = _t(get(f"{base}.down_proj.weight"))
                    elif maybe(f"{base}.w1.weight") is not None:
                        # mixtral w1/w3/w2
                        g = _t(get(f"{base}.w1.weight"))
                        u = _t(get(f"{base}.w3.weight"))
                        dn = _t(get(f"{base}.w2.weight"))
                    else:  # smallthinker gate/up/down
                        g = _t(get(f"{base}.gate.weight"))
                        u = _t(get(f"{base}.up.weight"))
                        dn = _t(get(f"{base}.down.weight"))
                    gus_list.append(np.concatenate([g, u], axis=1))
                    dns_list.append(dn)
                gus = np.stack(gus_list)
                dns = np.stack(dns_list)
            if gus is not None:
                ek, eg = pick(f"layers.{li}.moe.experts", moe_quant)
                moe["experts"] = MoEWeights(
                    gate_up=_q(gus, ek, eg),
                    down=_q(dns, ek, eg),
                )
            if m.shared_expert_intermediate_size:
                base = (
                    f"{mlp_pre}.shared_experts"
                    if maybe(f"{mlp_pre}.shared_experts.gate_proj.weight")
                    is not None
                    else f"{mlp_pre}.shared_expert"
                )
                # shared experts use the dense kind (int4 shared measured
                # 274.9 -> 205.8 tok/s through the dense W4A8 path;
                # models/init.py note)
                moe["shared"] = {
                    "gate_up": qx_fused(
                        f"{base}.gate_proj.weight", f"{base}.up_proj.weight",
                        f"{base}.gate_up_proj",
                        f"layers.{li}.moe.shared", quant,
                    ),
                    "down": qx(
                        f"{base}.down_proj.weight",
                        f"layers.{li}.moe.shared", quant,
                    ),
                }
                if m.shared_expert_gate:
                    moe["shared_gate"] = jnp.asarray(
                        np.asarray(
                            get(f"{mlp_pre}.shared_expert_gate.weight"), np.float32
                        )
                    )
            lp["moe"] = moe
        else:
            if (
                maybe(f"{mlp_pre}.gate_proj.weight") is None
                and maybe(f"{pre}.block_sparse_moe.gate.weight") is not None
            ):
                # smallthinker dense layers live under block_sparse_moe
                bsm = f"{pre}.block_sparse_moe"
                gk, gg = pick(f"layers.{li}.mlp", quant)
                lp["mlp"] = {
                    "gate_up": _q(
                        np.concatenate(
                            [_t(get(f"{bsm}.gate.weight")),
                             _t(get(f"{bsm}.up.weight"))], 1,
                        ), gk, gg,
                    ),
                    "down": qx(
                        f"{bsm}.down.weight", f"layers.{li}.mlp", quant
                    ),
                }
            else:
                lp["mlp"] = {
                    "gate_up": qx_fused(
                        f"{mlp_pre}.gate_proj.weight",
                        f"{mlp_pre}.up_proj.weight",
                        f"{mlp_pre}.gate_up_proj", f"layers.{li}.mlp", quant,
                    ),
                    "down": qx(
                        f"{mlp_pre}.down_proj.weight", f"layers.{li}.mlp",
                        quant,
                    ),
                }
        layers.append(lp)

    params = {
        "embed": None if not include_head else jnp.asarray(
            np.asarray(get("model.embed_tokens.weight"), np.float32)
        ),
        "layers": layers,
        "final_norm": None if not include_head else jnp.asarray(
            np.asarray(get("model.norm.weight"), np.float32) + norm_off
        ),
    }
    if include_head and not spec.tie_word_embeddings:
        params["lm_head"] = qx("lm_head.weight", "lm_head", quant)
    return params
