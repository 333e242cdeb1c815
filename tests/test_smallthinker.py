"""SmallThinker family: per-layer rope/sliding-window layouts, early
(pre-attention) router, ReLU-GLU experts, sigmoid top-k weighting —
checked against an INDEPENDENT torch oracle written from the documented
config semantics (reference: archive/ktransformers/models/
configuration_smallthinker.py:25-54, modeling_smallthinker.py roles; no
reference code imported or copied)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.quant.formats import dequantize

CFG = dict(
    model_type="smallthinker",
    vocab_size=96,
    hidden_size=48,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=12,
    rope_theta=1e6,
    rms_norm_eps=1e-6,
    rope_layout=[1, 0, 1],
    sliding_window_layout=[0, 1, 1],
    sliding_window_size=6,
    moe_layer_layout=[1, 0, 1],
    moe_num_primary_experts=8,
    moe_num_active_primary_experts=2,
    moe_ffn_hidden_size=64,
    dense_ffn_hidden_size=96,
    moe_enable_early_router=True,
    moe_primary_router_apply_softmax=False,
    moe_enable_secondary_experts=False,
    max_position_embeddings=128,
)


def _rope_rotate(x, pos, dim, theta):
    """NEOX split-half rope: x [B, H, S, D]."""
    half = dim // 2
    inv = theta ** (-np.arange(half) / half)
    ang = pos[:, None] * inv[None]  # [S, half]
    cos, sin = np.cos(ang), np.sin(ang)
    x1, x2 = x[..., :half], x[..., half:dim]
    out = np.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin, x[..., dim:]], -1
    )
    return out


def _oracle_forward(params, spec, tokens):
    """Plain numpy forward implementing the smallthinker semantics."""
    cfg = CFG

    def deq(qt):
        return np.asarray(dequantize(qt, jnp.float32))

    def rms(x, w):
        v = np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6)
        return x / v * np.asarray(w)

    b, s = tokens.shape
    h, hkv, d = 4, 2, 12
    x = np.asarray(params["embed"])[tokens]
    pos = np.arange(s)
    for li in range(len(params["layers"])):
        lp = params["layers"][li]
        res = x
        router_x = x  # early router input: pre-norm layer input
        xn = rms(x, lp["input_norm"])
        ap = lp["attn"]
        q = (xn @ deq(ap["q_proj"])).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = (xn @ deq(ap["k_proj"])).reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
        v = (xn @ deq(ap["v_proj"])).reshape(b, s, hkv, d).transpose(0, 2, 1, 3)
        if cfg["rope_layout"][li]:
            q = _rope_rotate(q, pos, d, cfg["rope_theta"])
            k = _rope_rotate(k, pos, d, cfg["rope_theta"])
        k = np.repeat(k, h // hkv, 1)
        v = np.repeat(v, h // hkv, 1)
        scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        qpos, kpos = pos[:, None], pos[None, :]
        ok = kpos <= qpos
        if cfg["sliding_window_layout"][li]:
            ok = ok & (kpos > qpos - cfg["sliding_window_size"])
        scores = np.where(ok[None, None], scores, -1e30)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        attn = np.einsum("bhqk,bhkd->bhqd", p, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        x = res + attn @ deq(ap["o_proj"])

        res = x
        xn = rms(x, lp["post_attn_norm"])
        if "moe" in lp:
            mp = lp["moe"]
            logits = router_x.reshape(-1, 48) @ np.asarray(mp["router_w"]).T
            order = np.argsort(-logits, -1)[:, :2]
            w = 1 / (1 + np.exp(-np.take_along_axis(logits, order, -1)))
            gu = deq(mp["experts"].gate_up)  # [E, K, 2N]
            dn = deq(mp["experts"].down)
            flat = xn.reshape(-1, 48)
            y = np.zeros_like(flat)
            for t in range(flat.shape[0]):
                for slot in range(2):
                    e = order[t, slot]
                    hgu = flat[t] @ gu[e]
                    act = np.maximum(hgu[:64], 0) * hgu[64:]
                    y[t] += w[t, slot] * (act @ dn[e])
            x = res + y.reshape(b, s, 48)
        else:
            g = deq(lp["mlp"]["gate_up"])
            hgu = xn @ g
            act = np.maximum(hgu[..., :96], 0) * hgu[..., 96:]
            x = res + act @ deq(lp["mlp"]["down"])

    x = rms(x, params["final_norm"])
    return x @ deq(params["lm_head"])


def test_smallthinker_matches_oracle():
    spec = spec_from_hf_config(dict(CFG))
    assert spec.moe.mlp_only_layers == (1,)
    assert spec.layer_window(0) == 0 and spec.layer_window(1) == 6
    assert spec.layer_uses_rope(1) is False

    params = init_params(spec, seed=0, quant="f32")
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, (2, 10))

    ref = _oracle_forward(params, spec, tokens)
    cache = KVCache.create(spec, 2, 16, dtype=jnp.float32)
    logits, _ = forward(
        params, spec, jnp.asarray(tokens, jnp.int32), cache,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref, rtol=2e-4, atol=2e-4
    )


def test_smallthinker_decode_consistency():
    """Chunked prefill + decode equals one-shot forward (cache/window
    interaction for swa layers)."""
    spec = spec_from_hf_config(dict(CFG))
    params = init_params(spec, seed=1, quant="f32")
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 96, (1, 12)), jnp.int32)

    cache = KVCache.create(spec, 1, 16, dtype=jnp.float32)
    full, _ = forward(params, spec, tokens, cache, compute_dtype=jnp.float32)

    cache2 = KVCache.create(spec, 1, 16, dtype=jnp.float32)
    _, cache2 = forward(
        params, spec, tokens[:, :11], cache2, compute_dtype=jnp.float32
    )
    last, _ = forward(
        params, spec, tokens[:, 11:], cache2, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(last[:, -1]), np.asarray(full[:, -1]),
        rtol=2e-4, atol=2e-4,
    )


def test_smallthinker_paged_serving_matches_single_user():
    """SmallThinker through the paged serving stack (per-layer SWA +
    nope layers + early router in forward_paged) == single-user
    Generator — the balance_serve coverage the reference has for this
    family (archive/ktransformers/operators/balance_serve_attention.py)."""
    import jax.numpy as jnp

    from ktransformers_tpu.engine.generate import GenerateConfig, Generator
    from ktransformers_tpu.serving.engine import ServeEngine
    from ktransformers_tpu.serving.scheduler import SchedulerConfig

    spec = spec_from_hf_config(dict(CFG))
    params = init_params(spec, seed=0, quant="f32")
    gen = Generator(params, spec, max_len=64, batch=1,
                    cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    prompts = [list(range(9)), list(range(30, 42))]
    expected = [
        gen.generate([p], GenerateConfig(max_new_tokens=6))[0]
        for p in prompts
    ]
    eng = ServeEngine(
        params, spec,
        SchedulerConfig(max_batch_size=2, prefill_chunk=8, page_size=4,
                        max_pages_per_query=16),
        num_pages=64, cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    queries = [eng.submit(p, max_new_tokens=6) for p in prompts]
    for _ in range(300):
        if not eng.step() and all(q.state == "done" for q in queries):
            break
    got = [list(q.output_ids) for q in queries]
    assert got == expected, (got, expected)
