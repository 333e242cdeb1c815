"""Random parameter initialization at any quant format (tests, benches)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.ops.moe import MoEWeights
from ktransformers_tpu.quant.formats import quantize


def _rand(rng: np.random.Generator, shape, scale=None):
    scale = scale if scale is not None else (1.0 / np.sqrt(shape[0]))
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


def _q(rng, shape, kind, group_size, scale=None):
    return quantize(_rand(rng, shape, scale), kind, group_size=group_size)


def init_params_synthetic(
    spec: ModelSpec,
    seed: int = 0,
    quant: str = "int8",
    moe_quant: str | None = None,
    group_size: int = 128,
    dtype=jnp.bfloat16,
    skip_experts: bool = False,
    placement=None,  # PlacementSpec: per-layer quant kinds resolved from
    # representative module paths (the load-time analog lives in
    # models/loading.build_params) — lets `kt tune`/benchmarks materialize
    # a shipped placement file at model scale without a checkpoint
):
    """Device-side synthetic init for *benchmarks at real model scale*:
    quantized tensors are created directly as random codes + constant scales
    (no float source), so a multi-GB model initializes in seconds without
    host RAM. Distributionally equivalent to quantizing random weights.

    Jitted per layer *type* (dense / MoE / head): identical layers reuse one
    compiled program, so a 27-layer model costs ~3 compiles instead of ~700
    eager dispatches over the device tunnel."""
    moe_quant = moe_quant or quant

    def factories(skey):
        counter = [0]

        def nk():
            counter[0] += 1
            return jax.random.fold_in(skey, counter[0])

        def q(shape, kind):
            from ktransformers_tpu.quant.formats import QTensor

            k_dim, n = shape[-2], shape[-1]
            lead = shape[:-2]
            scale = 1.0 / np.sqrt(k_dim) / 7.0
            if kind == "bf16":
                return QTensor(
                    jax.random.normal(nk(), shape, dtype) / np.sqrt(k_dim),
                    None, None, kind="bf16", group_size=0,
                )
            if kind == "int8":
                data = jax.random.randint(nk(), shape, -127, 128, jnp.int8)
                scales = jnp.full((*lead, 1, n), scale / 18.0, jnp.float32)
                return QTensor(data, scales, None, kind="int8", group_size=0)
            if kind == "int4":
                data = jax.random.randint(
                    nk(), (*lead, k_dim // 2, n), 0, 256, jnp.uint8
                )
                scales = jnp.full((*lead, 1, n), scale, jnp.float32)
                return QTensor(data, scales, None, kind="int4", group_size=0)
            if kind == "int4_g":
                from ktransformers_tpu.quant.formats import (
                    effective_group_size,
                )

                g = effective_group_size(k_dim, group_size)
                data = jax.random.randint(
                    nk(), (*lead, k_dim // 2, n), 0, 256, jnp.uint8
                )
                scales = jnp.full(
                    (*lead, k_dim // g, n), scale, jnp.float32
                )
                return QTensor(
                    data, scales, None, kind="int4_g", group_size=g
                )
            if kind == "fp8":
                data = (
                    jax.random.normal(nk(), shape, jnp.float32) * 57.0
                ).astype(jnp.float8_e4m3fn)
                scales = jnp.full((*lead, 1, n), scale / 57.0, jnp.float32)
                return QTensor(data, scales, None, kind="fp8", group_size=0)
            if kind in ("mxfp4", "mxfp8"):
                from ktransformers_tpu.quant.formats import (
                    effective_group_size,
                )

                g = effective_group_size(k_dim, 32)
                # ue8m0 exponents: 2^(e-127); pick e so |w| ~ scale
                # (e2m1 mean |v| ~ 1.3, e4m3 random ~ O(10))
                import math

                e_val = int(
                    np.clip(127 + round(math.log2(max(scale, 1e-6) / 1.3)),
                            1, 254)
                )
                scales = jnp.full(
                    (*lead, k_dim // g, n), e_val, jnp.uint8
                )
                if kind == "mxfp4":
                    data = jax.random.randint(
                        nk(), (*lead, k_dim // 2, n), 0, 256, jnp.uint8
                    )
                else:
                    data = (
                        jax.random.normal(nk(), shape, jnp.float32) * 1.3
                    ).astype(jnp.float8_e4m3fn)
                return QTensor(
                    data, scales, None, kind=kind, group_size=g
                )
            raise ValueError(kind)

        def rand(shape, sc=0.02):
            return jax.random.normal(nk(), shape, jnp.float32) * sc

        return q, rand

    compiled = {}

    def layer_kinds(li):
        if placement is None:
            return quant, moe_quant
        aq, _ = placement.quant_for(f"layers.{li}.attn.q_proj")
        mq, _ = placement.quant_for(f"layers.{li}.moe.experts")
        return aq, mq

    def build_layer(li):
        is_moe = spec.moe is not None and spec.moe.is_moe_layer(li)
        lq, lmq = layer_kinds(li)
        key = (is_moe, lq, lmq)
        if key not in compiled:

            def fn(skey, lq=lq, lmq=lmq):
                q, rand = factories(skey)
                return _layer_params(
                    spec, li, q, rand, lq, lmq,
                    skip_experts=skip_experts,
                )

            compiled[key] = jax.jit(fn)
        return compiled[key](jax.random.PRNGKey(seed * 100003 + li))

    layers = [build_layer(li) for li in range(spec.num_layers)]

    def head_fn(skey):
        q, rand = factories(skey)
        head = {
            "embed": rand((spec.vocab_size, spec.hidden_size), 0.02),
            "final_norm": jnp.ones((spec.hidden_size,), jnp.float32),
        }
        if not spec.tie_word_embeddings:
            hq = quant
            if placement is not None:
                hq, _ = placement.quant_for("lm_head")
            head["lm_head"] = q((spec.hidden_size, spec.vocab_size), hq)
        return head

    head = jax.jit(head_fn)(jax.random.PRNGKey(seed))
    return {**head, "layers": layers}


def _layer_params(spec: ModelSpec, li: int, q, rand, quant: str,
                  moe_quant: str, skip_experts: bool = False):
    """One decoder layer's params: q(shape, kind) makes a QTensor,
    rand(shape, scale) a float array. skip_experts: leave routed experts
    out (host-offload builds: offload/host_engine.py)."""
    a = spec.attention
    d = spec.hidden_size
    lp = {
        "input_norm": jnp.ones((d,), jnp.float32),
        "post_attn_norm": jnp.ones((d,), jnp.float32),
    }
    if spec.layer_kind(li) == "linear":
        la = spec.linear_attn
        lp["attn"] = {
            "in_proj_qkvz": q((d, 2 * la.key_dim + 2 * la.value_dim), quant),
            "in_proj_ba": q((d, 2 * la.num_v_heads), "bf16"),
            "conv_w": rand((la.conv_dim, la.conv_kernel), 0.3),
            "dt_bias": rand((la.num_v_heads,), 0.5),
            "A_log": rand((la.num_v_heads,), 0.5),
            "norm_w": jnp.ones((la.head_v_dim,), jnp.float32),
            "out_proj": q((la.value_dim, d), quant),
        }
        lp.update(_mlp_or_moe(spec, li, q, rand, quant, moe_quant,
                              skip_experts))
        return lp
    if a.kind == "mla":
        nope, dr, r, v = (
            a.qk_nope_head_dim,
            a.qk_rope_head_dim,
            a.kv_lora_rank,
            a.v_head_dim,
        )
        h = a.num_heads
        attn = {
            "kv_a": q((d, r + dr), quant),
            "kv_a_norm": jnp.ones((r,), jnp.float32),
            "w_uk": rand((h, nope, r), 1.0 / np.sqrt(nope)),
            "w_uv": rand((h, r, v), 1.0 / np.sqrt(r)),
            "o_proj": q((h * v, d), quant),
        }
        if a.q_lora_rank:
            attn["q_a"] = q((d, a.q_lora_rank), quant)
            attn["q_a_norm"] = jnp.ones((a.q_lora_rank,), jnp.float32)
            attn["q_b"] = q((a.q_lora_rank, h * (nope + dr)), quant)
        else:
            attn["q_proj"] = q((d, h * (nope + dr)), quant)
    else:
        h, hkv, hd = a.num_heads, a.num_kv_heads, a.head_dim
        attn = {
            "q_proj": q((d, h * hd * (2 if a.gated_output else 1)), quant),
            "k_proj": q((d, hkv * hd), quant),
            "v_proj": q((d, hkv * hd), quant),
            "o_proj": q((h * hd, d), quant),
        }
        if a.attention_bias:
            attn["q_bias"] = rand((h * hd,), 0.01)
            attn["k_bias"] = rand((hkv * hd,), 0.01)
            attn["v_bias"] = rand((hkv * hd,), 0.01)
        if a.qk_norm:
            attn["q_norm"] = jnp.ones((hd,), jnp.float32)
            attn["k_norm"] = jnp.ones((hd,), jnp.float32)
    lp["attn"] = attn
    lp.update(_mlp_or_moe(spec, li, q, rand, quant, moe_quant, skip_experts))
    return lp


def _mlp_or_moe(spec, li, q, rand, quant, moe_quant, skip_experts=False):
    d = spec.hidden_size
    lp = {}
    if spec.moe is not None and spec.moe.is_moe_layer(li):
        m = spec.moe
        f = m.moe_intermediate_size
        moe = {
            "router_w": rand((m.num_experts, d), 1.0 / np.sqrt(d)),
        }
        if not skip_experts:
            moe["experts"] = MoEWeights(
                gate_up=q((m.num_experts, d, 2 * f), moe_quant),
                down=q((m.num_experts, f, d), moe_quant),
            )
        if m.gate.has_correction_bias:
            moe["router_bias_corr"] = jnp.zeros((m.num_experts,), jnp.float32)
        if m.shared_expert_intermediate_size:
            fs = m.shared_expert_intermediate_size
            # shared experts use the DENSE kind. NEGATIVE RESULT (r2): at
            # moe_quant=int4_g they route through the dense W4A8 kernels,
            # which lose to int8 streams at decode M (274.9 -> 205.8
            # tok/s on the bench model), and at 2x routed-expert size the
            # fused FFN kernel's VMEM budget excludes them.
            moe["shared"] = {
                "gate_up": q((d, 2 * fs), quant),
                "down": q((fs, d), quant),
            }
            if m.shared_expert_gate:
                moe["shared_gate"] = rand((1, d), 1.0 / np.sqrt(d))
        lp["moe"] = moe
    else:
        f = spec.intermediate_size
        lp["mlp"] = {
            "gate_up": q((d, 2 * f), quant),
            "down": q((f, d), quant),
        }
    return lp


def init_params(
    spec: ModelSpec,
    seed: int = 0,
    quant: str = "bf16",
    moe_quant: str | None = None,
    group_size: int = 128,
):
    """Build a full random params pytree. `quant` applies to attention/dense
    weights, `moe_quant` (default = quant) to routed experts — mirroring the
    reference's split of GPU-dense vs CPU-expert formats."""
    rng = np.random.default_rng(seed)
    moe_quant = moe_quant or quant
    a = spec.attention
    d = spec.hidden_size

    layers = []
    for li in range(spec.num_layers):
        lp = {
            "input_norm": jnp.ones((d,), jnp.float32),
            "post_attn_norm": jnp.ones((d,), jnp.float32),
        }
        if spec.layer_kind(li) == "linear":
            la = spec.linear_attn
            attn = {
                "in_proj_qkvz": _q(
                    rng, (d, 2 * la.key_dim + 2 * la.value_dim), quant,
                    group_size,
                ),
                "in_proj_ba": _q(
                    rng, (d, 2 * la.num_v_heads), "bf16", group_size
                ),
                "conv_w": _rand(rng, (la.conv_dim, la.conv_kernel), 0.3),
                "dt_bias": _rand(rng, (la.num_v_heads,), 0.5),
                "A_log": _rand(rng, (la.num_v_heads,), 0.5),
                "norm_w": jnp.ones((la.head_v_dim,), jnp.float32),
                "out_proj": _q(rng, (la.value_dim, d), quant, group_size),
            }
        elif a.kind == "mla":
            nope, dr, r, v = (
                a.qk_nope_head_dim,
                a.qk_rope_head_dim,
                a.kv_lora_rank,
                a.v_head_dim,
            )
            h = a.num_heads
            attn = {
                "kv_a": _q(rng, (d, r + dr), quant, group_size),
                "kv_a_norm": jnp.ones((r,), jnp.float32),
                "w_uk": _rand(rng, (h, nope, r), scale=1.0 / np.sqrt(nope)),
                "w_uv": _rand(rng, (h, r, v), scale=1.0 / np.sqrt(r)),
                "o_proj": _q(rng, (h * v, d), quant, group_size),
            }
            if a.q_lora_rank:
                attn["q_a"] = _q(rng, (d, a.q_lora_rank), quant, group_size)
                attn["q_a_norm"] = jnp.ones((a.q_lora_rank,), jnp.float32)
                attn["q_b"] = _q(
                    rng, (a.q_lora_rank, h * (nope + dr)), quant, group_size
                )
            else:
                attn["q_proj"] = _q(rng, (d, h * (nope + dr)), quant, group_size)
        else:
            h, hkv, hd = a.num_heads, a.num_kv_heads, a.head_dim
            attn = {
                "q_proj": _q(
                    rng, (d, h * hd * (2 if a.gated_output else 1)),
                    quant, group_size,
                ),
                "k_proj": _q(rng, (d, hkv * hd), quant, group_size),
                "v_proj": _q(rng, (d, hkv * hd), quant, group_size),
                "o_proj": _q(rng, (h * hd, d), quant, group_size),
            }
            if a.attention_bias:
                attn["q_bias"] = _rand(rng, (h * hd,), 0.01)
                attn["k_bias"] = _rand(rng, (hkv * hd,), 0.01)
                attn["v_bias"] = _rand(rng, (hkv * hd,), 0.01)
            if a.qk_norm:
                attn["q_norm"] = jnp.ones((hd,), jnp.float32)
                attn["k_norm"] = jnp.ones((hd,), jnp.float32)
        lp["attn"] = attn

        if spec.moe is not None and spec.moe.is_moe_layer(li):
            m = spec.moe
            f = m.moe_intermediate_size
            moe = {
                "router_w": _rand(rng, (m.num_experts, d)),
                "experts": MoEWeights(
                    gate_up=_q(rng, (m.num_experts, d, 2 * f), moe_quant, group_size),
                    down=_q(rng, (m.num_experts, f, d), moe_quant, group_size),
                ),
            }
            if m.gate.has_correction_bias:
                moe["router_bias_corr"] = jnp.zeros((m.num_experts,), jnp.float32)
            if m.shared_expert_intermediate_size:
                fs = m.shared_expert_intermediate_size
                # dense kind for shared experts (see init_params note)
                moe["shared"] = {
                    "gate_up": _q(rng, (d, 2 * fs), quant, group_size),
                    "down": _q(rng, (fs, d), quant, group_size),
                }
                if m.shared_expert_gate:
                    moe["shared_gate"] = _rand(rng, (1, d))
            lp["moe"] = moe
        else:
            f = spec.intermediate_size
            lp["mlp"] = {
                "gate_up": _q(rng, (d, 2 * f), quant, group_size),
                "down": _q(rng, (f, d), quant, group_size),
            }
        layers.append(lp)

    params = {
        "embed": _rand(rng, (spec.vocab_size, d), scale=0.02),
        "layers": layers,
        "final_norm": jnp.ones((d,), jnp.float32),
    }
    if not spec.tie_word_embeddings:
        params["lm_head"] = _q(rng, (d, spec.vocab_size), quant, group_size)
    return params
