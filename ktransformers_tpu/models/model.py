"""The unified functional decoder: embeddings -> N layers (MLA/GQA attention +
dense/MoE MLP) -> norm -> lm_head, with a static-shape KV cache.

Re-designs the reference's flattened serving models
(archive/ktransformers/models/custom_modeling_deepseek_v3.py
KDeepseekV3ForCausalLM, custom_modeling_qwen2/3_moe) as one parameterized
pure function over a params pytree. MLA runs *absorbed* everywhere
(reference: operators/attention.py:69-196) so the cache holds only
(kv_lora_rank + rope_dim) per token; the cache layout matches the
reference's compressed paged cache (models/custom_cache.py KDeepSeekV3Cache:
ckv + k_pe) minus the paging, which the serving layer adds.

Params are nested dicts of `QTensor`s / arrays; weights may be quantized
per-module via the placement spec (placement/).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.ops.activations import glu_activate
from ktransformers_tpu.ops.attention import (
    BLOCKWISE_KV_THRESHOLD,
    mha,
    mha_blockwise,
    mla_absorbed,
    mla_absorbed_blockwise,
    mla_decode,
)
from ktransformers_tpu.ops.gate import route
from ktransformers_tpu.ops.linear import linear
from ktransformers_tpu.ops.moe import MoEConfig, MoEWeights, moe_forward
from ktransformers_tpu.ops.norm import rms_norm
from ktransformers_tpu.ops.rope import (
    apply_rope,
    precompute_rope_tables,
    rope_attention_scale,
)
from ktransformers_tpu.quant.formats import QTensor, dequantize, quantize

NEG_INF = -1e30


def plinear(p: dict, key: str, x, bias=None):
    """linear() through params dict with optional LoRA sibling
    "<key>_lora" = {"a": [K, r], "b": [r, N]} (alpha/r folded into b).
    The SFT path trains only these adapters (reference: kt_adapt_peft_lora,
    python/sft/lora.py)."""
    y = linear(x, p[key], bias)
    lora = p.get(key + "_lora")
    if lora is not None:
        xf = x.astype(jnp.float32)
        delta = (xf @ lora["a"].astype(jnp.float32)) @ lora["b"].astype(
            jnp.float32
        )
        y = y + delta.astype(y.dtype)
    return y



@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Static-shape KV cache, one buffer pair per layer.

    MLA: bufs_a[l] = ckv [B, S, R];       bufs_b[l] = k_pe [B, S, Dr]
    GQA: bufs_a[l] = k   [B, S, Hkv, D];  bufs_b[l] = v    [B, S, Hkv, D]
    lengths: [B] int32 — tokens already cached per sequence.

    Per-layer buffers (not one stacked [L, ...] array) so a jitted step with
    donated cache updates each layer in place instead of re-stacking.
    """

    lengths: jnp.ndarray
    bufs_a: list
    bufs_b: list

    @property
    def max_len(self) -> int:
        # hybrid models keep O(1) conv/recurrent state in linear layers'
        # slots; the KV length lives in any full-attention buffer
        return max(a.shape[1] for a in self.bufs_a)

    @property
    def batch(self) -> int:
        return self.bufs_a[0].shape[0]

    @staticmethod
    def create(
        spec: ModelSpec, batch: int, max_len: int, dtype=jnp.bfloat16
    ) -> "KVCache":
        a = spec.attention
        lengths = jnp.zeros((batch,), jnp.int32)
        if a.kind == "mla":
            sa = (batch, max_len, a.kv_lora_rank)
            sb = (batch, max_len, a.qk_rope_head_dim)
        else:
            sa = sb = (batch, max_len, a.num_kv_heads, a.head_dim)
        bufs_a, bufs_b = [], []
        for li in range(spec.num_layers):
            if spec.layer_kind(li) == "linear":
                # GatedDeltaNet layers keep O(1) state: the conv tail
                # [B, K, conv_dim] and the recurrent matrix
                # [B, Hv, dk, dv] (f32 — the delta rule accumulates)
                la = spec.linear_attn
                bufs_a.append(
                    jnp.zeros((batch, la.conv_kernel, la.conv_dim), dtype)
                )
                bufs_b.append(
                    jnp.zeros(
                        (batch, la.num_v_heads, la.head_k_dim,
                         la.head_v_dim),
                        jnp.float32,
                    )
                )
            else:
                bufs_a.append(jnp.zeros(sa, dtype))
                bufs_b.append(jnp.zeros(sb, dtype))
        return KVCache(lengths=lengths, bufs_a=bufs_a, bufs_b=bufs_b)

    def bytes_per_token_per_layer(self, spec: ModelSpec) -> int:
        a = spec.attention
        itemsize = jnp.dtype(self.bufs_a[0].dtype).itemsize
        if a.kind == "mla":
            return (a.kv_lora_rank + a.qk_rope_head_dim) * itemsize
        return 2 * a.num_kv_heads * a.head_dim * itemsize


def _attn_mask(pos_offset: jnp.ndarray, q_len: int, kv_len: int,
               window: int = 0) -> jnp.ndarray:
    """Additive causal mask [B, q_len, kv_len] from per-seq offsets [B].
    window > 0: sliding-window attention — keys older than window are
    masked (smallthinker swa_layout layers)."""
    qpos = pos_offset[:, None, None] + jnp.arange(q_len)[None, :, None]
    kpos = jnp.arange(kv_len)[None, None, :]
    ok = kpos <= qpos
    if window:
        ok = ok & (kpos > qpos - window)
    return jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)


def _write_cache(buf: jnp.ndarray, new: jnp.ndarray, offset: jnp.ndarray):
    """Write new [B, S, ...] into buf [B, Smax, ...] at per-seq offset [B].

    B=1 uses a plain dynamic_update_slice: the vmapped per-row DUS lowers
    to a scatter, which XLA:TPU neither aliases nor updates in place —
    lab13 (r5) measured the 54 per-layer cache writes at ~1.0 ms/step of
    the 16B decode program (~18 us per 1.2 MB write); the direct DUS is
    aliasable and effectively free."""
    if buf.shape[0] == 1:
        return jax.lax.dynamic_update_slice(
            buf, new.astype(buf.dtype),
            (jnp.zeros((), offset.dtype), offset.reshape(-1)[0])
            + (jnp.zeros((), offset.dtype),) * (buf.ndim - 2),
        )

    def one(b, n, off):
        return jax.lax.dynamic_update_slice(
            b, n.astype(b.dtype), (off,) + (0,) * (b.ndim - 1)
        )

    return jax.vmap(one)(buf, new, offset)


def _assert_no_orphan_lora(p, legacy_names, fused_key):
    """A LoRA adapter attached AFTER qkv fusion under an unfused key (e.g.
    'q_proj_lora') would silently never apply — plinear only consults
    '<fused_key>_lora'. Fail loudly instead (ADVICE r2)."""
    orphans = [n + "_lora" for n in legacy_names if (n + "_lora") in p]
    if orphans:
        raise ValueError(
            f"LoRA adapters {orphans} are attached under pre-fusion keys but "
            f"the layer uses the fused '{fused_key}' projection; attach the "
            f"adapter as '{fused_key}_lora' or disable KT_FUSE_QKV"
        )


def mla_qkv_proj(p, spec: ModelSpec, x):
    """MLA q/kv projections; consumes the fused "qkv_a" weight when the
    engine-init pass merged q(_a) + kv_a into one matmul (one kernel launch
    + one shared activation-quant instead of two; utils/device_prep.py
    fuse_qkv_projections). Returns (q [B,S,H*(nope+dr)], ckv_kpe [B,S,R+Dr])."""
    a = spec.attention
    if "qkv_a" in p:
        _assert_no_orphan_lora(p, ("q_a", "q_proj", "kv_a"), "qkv_a")
        qw = a.q_lora_rank or a.num_heads * (
            a.qk_nope_head_dim + a.qk_rope_head_dim
        )
        both = plinear(p, "qkv_a", x, p.get("qkv_a_bias"))
        # explicit end bound: the fused weight may carry lane-alignment
        # padding columns (utils/device_prep._pad_out_cols)
        rw = a.kv_lora_rank + a.qk_rope_head_dim
        q, ckv_kpe = both[..., :qw], both[..., qw : qw + rw]
    else:
        if a.q_lora_rank:
            q = plinear(p, "q_a", x, p.get("q_a_bias"))
        else:
            q = plinear(p, "q_proj", x)
        ckv_kpe = plinear(p, "kv_a", x, p.get("kv_a_bias"))
    if a.q_lora_rank:
        q = rms_norm(q, p["q_a_norm"], spec.rms_norm_eps)
        q = plinear(p, "q_b", q)
    return q, ckv_kpe


def gqa_qkv_proj(p, spec: ModelSpec, x):
    """GQA q/k/v projections, fused-"qkv"-aware (see mla_qkv_proj).
    Returns flat (q [B,S,Hq*D or Hq*2D], k [B,S,Hkv*D], v [B,S,Hkv*D])."""
    a = spec.attention
    h, hkv, d = a.num_heads, a.num_kv_heads, a.head_dim
    qw = h * (2 * d if a.gated_output else d)
    kw = hkv * d
    if "qkv" in p:
        _assert_no_orphan_lora(p, ("q_proj", "k_proj", "v_proj"), "qkv")
        qkv = plinear(p, "qkv", x, p.get("qkv_bias"))
        vw = hkv * a.v_head_dim if a.v_head_dim else kw
        # explicit end bound: the fused weight may carry lane-alignment
        # padding columns (utils/device_prep._pad_out_cols)
        return (
            qkv[..., :qw],
            qkv[..., qw : qw + kw],
            qkv[..., qw + kw : qw + kw + vw],
        )
    return (
        plinear(p, "q_proj", x, p.get("q_bias")),
        plinear(p, "k_proj", x, p.get("k_bias")),
        plinear(p, "v_proj", x, p.get("v_bias")),
    )


def _mla_attention(p, spec: ModelSpec, x, layer_cache, pos_offset, rope_cs,
                   rope_rot=None):
    a = spec.attention
    b, s, _ = x.shape
    h = a.num_heads
    nope, dr, r = a.qk_nope_head_dim, a.qk_rope_head_dim, a.kv_lora_rank

    q, ckv_kpe = mla_qkv_proj(p, spec, x)

    from ktransformers_tpu.ops.attention import mla_fused_hook

    fused = mla_fused_hook()
    if s == 1 and rope_rot is not None and fused is not None:
        # fused decode attention: kv norm + both ropes (rotation matmul) +
        # flash over the cache + the current token in one launch; the
        # cache write overlaps (independent of the attention output)
        scale = a.softmax_scale or (
            (nope + dr) ** -0.5 * rope_attention_scale(spec.rope)
        )
        qh = q.reshape(b, h, nope + dr)
        qn_eff = jnp.einsum(
            "bhn,hnr->bhr",
            qh[..., :nope].astype(jnp.float32),
            p["w_uk"].astype(jnp.float32),
        ).astype(x.dtype)
        ctx, ckv_new, kpe_new = fused(
            qn_eff,
            qh[..., nope:],
            ckv_kpe,
            p["kv_a_norm"],
            rope_rot,
            layer_cache[0],
            layer_cache[1],
            pos_offset,
            scale,
            spec.rms_norm_eps,
        )
        ckv_buf = _write_cache(layer_cache[0], ckv_new, pos_offset)
        kpe_buf = _write_cache(layer_cache[1], kpe_new, pos_offset)
        out = jnp.einsum(
            "bhr,hrv->bhv",
            ctx.astype(jnp.float32),
            p["w_uv"].astype(jnp.float32),
        ).astype(x.dtype)
        out = out.reshape(b, 1, h * a.v_head_dim)
        return plinear(p, "o_proj", out, p.get("o_bias")), (ckv_buf, kpe_buf)
    q = q.reshape(b, s, h, nope + dr)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    ckv = rms_norm(ckv_kpe[..., :r], p["kv_a_norm"], spec.rms_norm_eps)
    k_pe = ckv_kpe[..., r:]

    # rope (interleaved, deepseek layout)
    cos, sin = rope_cs  # [B, S, dr/2]
    q_pe = q_pe.transpose(0, 2, 1, 3)  # [B,H,S,Dr]
    q_pe = apply_rope(q_pe, cos[:, None], sin[:, None], interleaved=a_interleaved(spec))
    k_pe = apply_rope(k_pe, cos, sin, interleaved=a_interleaved(spec))

    # absorbed query: [B,H,S,R]
    w_uk = p["w_uk"]  # [H, nope, R]
    q_nope_eff = jnp.einsum(
        "bshn,hnr->bhsr",
        q_nope.astype(jnp.float32),
        w_uk.astype(jnp.float32),
    ).astype(x.dtype)

    ckv_buf = _write_cache(layer_cache[0], ckv, pos_offset)
    kpe_buf = _write_cache(layer_cache[1], k_pe, pos_offset)

    scale = a.softmax_scale or (
        (nope + dr) ** -0.5 * rope_attention_scale(spec.rope)
    )
    if s == 1:
        attn = mla_decode(
            q_nope_eff, q_pe, ckv_buf, kpe_buf, pos_offset + 1, scale=scale
        )
    elif ckv_buf.shape[1] >= BLOCKWISE_KV_THRESHOLD:
        qpos = pos_offset[:, None] + jnp.arange(s)[None, :]
        attn = mla_absorbed_blockwise(
            q_nope_eff, q_pe, ckv_buf, kpe_buf, qpos, scale=scale
        )
    else:
        mask = _attn_mask(pos_offset, s, ckv_buf.shape[1])
        attn = mla_absorbed(
            q_nope_eff, q_pe, ckv_buf, kpe_buf, scale=scale, mask=mask
        )  # [B,H,S,R]

    w_uv = p["w_uv"]  # [H, R, v]
    out = jnp.einsum(
        "bhsr,hrv->bshv", attn.astype(jnp.float32), w_uv.astype(jnp.float32)
    ).astype(x.dtype)
    out = out.reshape(b, s, h * a.v_head_dim)
    return plinear(p, "o_proj", out, p.get("o_bias")), (ckv_buf, kpe_buf)


def a_interleaved(spec: ModelSpec) -> bool:
    return spec.rope.interleaved


def _gqa_attention(p, spec: ModelSpec, x, layer_cache, pos_offset, rope_cs,
                   use_rope: bool = True, window: int = 0):
    a = spec.attention
    b, s, _ = x.shape
    h, hkv, d = a.num_heads, a.num_kv_heads, a.head_dim

    gate = None
    q_flat, k_flat, v_flat = gqa_qkv_proj(p, spec, x)
    if a.gated_output:
        # qwen3-next: q_proj emits [q | gate] interleaved per head
        qg = q_flat.reshape(b, s, h, 2 * d)
        q, gate = qg[..., :d], qg[..., d:].reshape(b, s, h * d)
    else:
        q = q_flat.reshape(b, s, h, d)
    k = k_flat.reshape(b, s, hkv, d)
    v = v_flat.reshape(b, s, hkv, d)

    if a.qk_norm:
        q = rms_norm(q, p["q_norm"], spec.rms_norm_eps)
        k = rms_norm(k, p["k_norm"], spec.rms_norm_eps)

    cos, sin = rope_cs  # [B, S, rot/2]
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    rot = a.rotary_dim
    if not use_rope:
        pass  # smallthinker nope layers: positions only via the mask
    elif rot and rot < d:
        q = jnp.concatenate(
            [apply_rope(q[..., :rot], cos[:, None], sin[:, None]), q[..., rot:]],
            axis=-1,
        )
        k = jnp.concatenate(
            [apply_rope(k[..., :rot], cos[:, None], sin[:, None]), k[..., rot:]],
            axis=-1,
        )
    else:
        q = apply_rope(q, cos[:, None], sin[:, None])
        k = apply_rope(k, cos[:, None], sin[:, None])
    k = k.transpose(0, 2, 1, 3)  # back to [B,S,Hkv,D]

    k_buf = _write_cache(layer_cache[0], k, pos_offset)
    v_buf = _write_cache(layer_cache[1], v, pos_offset)

    scale = a.softmax_scale or d**-0.5
    if window == 0 and k_buf.shape[1] >= BLOCKWISE_KV_THRESHOLD:
        qpos = pos_offset[:, None] + jnp.arange(s)[None, :]
        out = mha_blockwise(
            q,
            k_buf.transpose(0, 2, 1, 3),
            v_buf.transpose(0, 2, 1, 3),
            qpos,
            scale=scale,
        )
    else:
        mask = _attn_mask(pos_offset, s, k_buf.shape[1], window)
        out = mha(
            q,
            k_buf.transpose(0, 2, 1, 3),
            v_buf.transpose(0, 2, 1, 3),
            scale=scale,
            mask=mask,
        )  # [B,H,S,D]
    out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    if gate is not None:
        out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(out.dtype)
    return plinear(p, "o_proj", out, p.get("o_bias")), (k_buf, v_buf)


def _dense_mlp(p, spec: ModelSpec, x):
    # act_quant int4 GLU pairs (e.g. shared experts at the expert kind)
    # ride the fused expert-FFN kernel as a 1-expert gather: one launch
    # streaming the int4 bytes instead of two dense W4A8 launches, whose
    # per-call group overhead at decode M is SLOWER than int8 streams
    # (measured 274.9 -> 205.8 tok/s when shared went int4 via the dense
    # path; the fused route recovers it)
    from ktransformers_tpu.ops import moe as _moe

    gu, dn = p["gate_up"], p["down"]
    if (
        _moe._PALLAS_DENSE_FFN is not None
        and "gate_up_lora" not in p
        and isinstance(gu, QTensor)
        and isinstance(dn, QTensor)
    ):
        # inter-chunked fused FFN: one launch streaming gate/up/down for
        # any FFN size (the shared experts of every MoE layer exceed the
        # whole-expert kernel's VMEM budget; round-3 decode profile showed
        # their two dense launches + GLU glue at ~25 us vs ~11 us SOL)
        lead = x.shape[:-1]
        rows = x.reshape(-1, x.shape[-1])
        y = _moe._PALLAS_DENSE_FFN(rows, gu, dn, spec.activation)
        if y is not None:
            return y.reshape(*lead, -1)
    if (
        _moe._PALLAS_FFN is not None
        and "gate_up_lora" not in p
        and isinstance(gu, QTensor)
        and isinstance(dn, QTensor)
        and getattr(gu, "act_quant", False)
        and getattr(dn, "act_quant", False)
    ):
        lead = x.shape[:-1]
        rows = x.reshape(-1, x.shape[-1])
        lift = lambda qt: dataclasses.replace(  # noqa: E731
            qt,
            data=qt.data[None],
            scales=None if qt.scales is None else qt.scales[None],
            zeros=None if qt.zeros is None else qt.zeros[None],
        )
        y = _moe._PALLAS_FFN(
            rows, lift(gu), lift(dn),
            jnp.zeros((rows.shape[0],), jnp.int32), spec.activation,
        )
        if y is not None:
            return y.reshape(*lead, -1)
    h = plinear(p, "gate_up", x)
    f = h.shape[-1] // 2
    act = glu_activate(h[..., :f], h[..., f:], spec.activation)
    return plinear(p, "down", act)


def _moe_mlp(p, spec: ModelSpec, x, aux: list | None = None,
             router_x=None):
    """aux (optional, trace-time list): appends this layer's routed
    topk_idx [B*S, k] — the serving engine's routing-statistics tap for
    dynamic expert re-placement (reference:
    --kt-enable-dynamic-expert-update, kt-kernel/README.md:548-559)."""
    b, s, d = x.shape
    flat = x.reshape(b * s, d)
    rflat = flat if router_x is None else router_x.reshape(b * s, d)
    logits = rflat.astype(jnp.float32) @ p["router_w"].astype(jnp.float32).T
    topk_idx, topk_w = route(
        logits, spec.moe.gate, p.get("router_bias_corr")
    )
    if aux is not None:
        aux.append(topk_idx)
    cfg = MoEConfig(activation=spec.activation)

    n_fused = getattr(p["experts"], "n_shared_fused", 0)
    if n_fused:
        # shared experts ride the gathered kernel as always-selected rows
        # (ops/fuse_shared.py); weight 1.0, or the qwen2-style sigmoid
        # gate value when present
        e_routed = p["experts"].num_experts - n_fused
        t = topk_idx.shape[0]
        sh_ids = jnp.broadcast_to(
            jnp.arange(e_routed, e_routed + n_fused, dtype=topk_idx.dtype),
            (t, n_fused),
        )
        if p.get("shared_gate") is not None:
            g = jax.nn.sigmoid(
                flat.astype(jnp.float32)
                @ p["shared_gate"].astype(jnp.float32).T
            )
            sh_w = jnp.broadcast_to(g, (t, n_fused))
        else:
            sh_w = jnp.ones((t, n_fused), topk_w.dtype)
        topk_idx = jnp.concatenate([topk_idx, sh_ids], -1)
        topk_w = jnp.concatenate([topk_w, sh_w.astype(topk_w.dtype)], -1)

    from ktransformers_tpu.parallel.context import get_parallel_context

    ctx = get_parallel_context()
    if ctx is not None and ctx.use_ep and ctx.ep_size > 1:
        from ktransformers_tpu.parallel.ep import (
            moe_forward_ep,
            moe_forward_ep_a2a,
        )

        if ctx.ep_impl == "a2a" and flat.shape[0] % ctx.ep_size == 0:
            y = moe_forward_ep_a2a(
                flat, p["experts"], topk_idx, topk_w, cfg, ctx.mesh,
                pipeline_chunks=ctx.ep_pipeline_chunks,
            )
        else:
            y = moe_forward_ep(
                flat, p["experts"], topk_idx, topk_w, cfg, ctx.mesh
            )
    else:
        y = moe_forward(flat, p["experts"], topk_idx, topk_w, cfg)
    if not n_fused and "shared" in p and p["shared"] is not None:
        y_sh = _dense_mlp(p["shared"], spec, flat)
        if spec.moe.shared_expert_gate:
            g = jax.nn.sigmoid(
                flat.astype(jnp.float32) @ p["shared_gate"].astype(jnp.float32).T
            )
            y_sh = y_sh * g.astype(y_sh.dtype)
        y = y + y_sh
    return y.reshape(b, s, d)


def decoder_layer(lp, spec: ModelSpec, x, layer_cache, lengths, rope_cs,
                  kind: str = "full", use_rope: bool = True,
                  window: int = 0, aux: list | None = None,
                  rope_rot=None):
    """One decoder layer (attention + MLP/MoE with residuals); returns
    (x, new_buf_a, new_buf_b). Module-level so both the sequential
    forward() and the pipeline-parallel executor (parallel/pp.py) run the
    identical layer math."""
    mla = spec.attention.kind == "mla"
    early = spec.moe is not None and spec.moe.early_router
    res = x
    router_x = x if early else None  # pre-norm layer input
    xn = rms_norm(x, lp["input_norm"], spec.rms_norm_eps)
    if kind == "linear":
        from ktransformers_tpu.ops.linear_attention import (
            gated_delta_net,
        )

        attn_out, buf_a, buf_b = gated_delta_net(
            lp["attn"], spec.linear_attn, xn, layer_cache[0],
            layer_cache[1], spec.rms_norm_eps,
        )
    else:
        attn_out, (buf_a, buf_b) = (
            _mla_attention(
                lp["attn"], spec, xn, layer_cache, lengths, rope_cs,
                rope_rot,
            )
            if mla
            else _gqa_attention(
                lp["attn"], spec, xn, layer_cache, lengths, rope_cs,
                use_rope, window,
            )
        )
    x = res + attn_out
    res = x
    xn = rms_norm(x, lp["post_attn_norm"], spec.rms_norm_eps)
    if "moe" in lp:
        x = res + _moe_mlp(lp["moe"], spec, xn, aux=aux, router_x=router_x)
    else:
        x = res + _dense_mlp(lp["mlp"], spec, xn)
    return x, buf_a, buf_b


def forward(
    params,
    spec: ModelSpec,
    tokens: jnp.ndarray,  # [B, S] int32
    cache: KVCache,
    rope_tables=None,  # (cos, sin) full tables; precomputed if None
    compute_dtype=jnp.bfloat16,
    return_hidden: bool = False,  # also return the pre-final-norm hidden
    # states [B, S, H] (MTP draft heads consume them, engine/mtp.py)
    remat: bool = False,  # gradient-checkpoint each decoder layer: the
    # SFT path's memory/FLOPs trade (activations rematerialized in the
    # backward; reference ForwardCache role, sft_moe.hpp:249-278)
    logits_last_only: bool = False,  # prefill chunks only need the final
    # position's logits; skipping the other rows saves the lm_head matmul
    # on S-1 positions (~1.3 ms at S=512 on the bench model) and the
    # [S, V] logits materialization. Returns [B, 1, V].
):
    """One forward pass over S new tokens per sequence; returns
    (logits [B, S, V], updated cache[, hidden]). Positions are
    cache.lengths + arange(S).
    """
    b, s = tokens.shape
    x = params["embed"][tokens].astype(compute_dtype)

    if rope_tables is None:
        rope_tables = precompute_rope_tables(spec.rope)
    cos_t, sin_t = rope_tables
    pos = cache.lengths[:, None] + jnp.arange(s)[None, :]  # [B,S]
    rope_cs = (cos_t[pos], sin_t[pos])

    # decode-only: one rope rotation matrix per step, shared by every
    # layer's fused attention kernel (ops/rope.rope_rotation_matrix)
    rope_rot = None
    if s == 1 and spec.attention.kind == "mla":
        from ktransformers_tpu.ops.attention import mla_fused_hook

        if mla_fused_hook() is not None:
            from ktransformers_tpu.ops.rope import rope_rotation_matrix

            rope_rot = rope_rotation_matrix(
                rope_cs[0][:, 0], rope_cs[1][:, 0], spec.rope.interleaved
            )

    new_a = []
    new_b = []

    def layer_body(lp, x, layer_cache, lengths, rope_cs, kind="full",
                   use_rope=True, window=0, rope_rot=None):
        return decoder_layer(
            lp, spec, x, layer_cache, lengths, rope_cs, kind, use_rope,
            window, rope_rot=rope_rot,
        )

    for li, lp in enumerate(params["layers"]):
        kind = spec.layer_kind(li)
        fn = (
            jax.checkpoint(layer_body, static_argnums=(5, 6, 7))
            if remat else layer_body
        )
        x, buf_a, buf_b = fn(
            lp, x, (cache.bufs_a[li], cache.bufs_b[li]), cache.lengths,
            rope_cs, kind, spec.layer_uses_rope(li), spec.layer_window(li),
            rope_rot,
        )
        new_a.append(buf_a)
        new_b.append(buf_b)

    hidden = x
    x = rms_norm(x, params["final_norm"], spec.rms_norm_eps)
    if logits_last_only:
        x = x[:, -1:, :]
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = x @ params["embed"].astype(x.dtype).T
    else:
        logits = linear(x, lm_head)

    new_cache = KVCache(
        lengths=cache.lengths + s, bufs_a=new_a, bufs_b=new_b
    )
    if return_hidden:
        return logits, new_cache, hidden
    return logits, new_cache
