"""Norm / rope / activation parity vs torch references."""

import jax.numpy as jnp
import numpy as np
import torch

from ktransformers_tpu.ops.norm import layer_norm, rms_norm
from ktransformers_tpu.ops.rope import (
    RopeConfig,
    apply_rope,
    gather_rope,
    precompute_rope_tables,
    rope_attention_scale,
    yarn_get_mscale,
)


def test_rms_norm_parity(rng):
    x = rng.standard_normal((4, 17, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    tx = torch.from_numpy(x)
    ref = tx * torch.rsqrt(tx.pow(2).mean(-1, keepdim=True) + 1e-6)
    ref = (ref * torch.from_numpy(w)).numpy()
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_layer_norm_parity(rng):
    x = rng.standard_normal((3, 8, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b)
    ).numpy()
    out = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_rope_interleaved_matches_complex(rng):
    """Deepseek HF applies rope as complex multiply over interleaved pairs
    (modeling_deepseek_v2.apply_rotary_emb)."""
    b, h, s, d = 2, 3, 5, 16
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    cfg = RopeConfig(dim=d, base=10000.0, max_position=32)
    cos, sin = precompute_rope_tables(cfg)
    pos = jnp.arange(s)
    c, sn = gather_rope(cos, sin, pos)
    out = np.asarray(apply_rope(jnp.asarray(q), c, sn, interleaved=True))

    # torch complex reference
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    freqs = np.outer(np.arange(s), inv_freq)
    freqs_cis = torch.polar(torch.ones(s, d // 2), torch.from_numpy(freqs).float())
    xq = torch.view_as_complex(torch.from_numpy(q).reshape(b, h, s, d // 2, 2))
    ref = torch.view_as_real(xq * freqs_cis[None, None]).flatten(3).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_rope_half_rotation(rng):
    """llama-style rotate_half layout."""
    s, d = 7, 8
    x = rng.standard_normal((1, s, d)).astype(np.float32)
    cfg = RopeConfig(dim=d, max_position=16)
    cos, sin = precompute_rope_tables(cfg)
    c, sn = gather_rope(cos, sin, jnp.arange(s))
    out = np.asarray(apply_rope(jnp.asarray(x), c, sn, interleaved=False))

    inv_freq = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    freqs = np.outer(np.arange(s), inv_freq)
    emb_cos = np.cos(np.concatenate([freqs, freqs], -1))
    emb_sin = np.sin(np.concatenate([freqs, freqs], -1))
    rot = np.concatenate([-x[..., d // 2:], x[..., : d // 2]], -1)
    ref = x * emb_cos + rot * emb_sin
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_yarn_mscale():
    assert yarn_get_mscale(1.0) == 1.0
    assert yarn_get_mscale(40.0, 1.0) > 1.0
    cfg = RopeConfig(
        dim=64,
        scaling_type="yarn",
        scaling_factor=40.0,
        mscale=1.0,
        mscale_all_dim=1.0,
    )
    # mscale == mscale_all_dim -> tables unscaled, attention scale folds to 1.
    assert abs(rope_attention_scale(cfg) - 1.0) < 1e-9


def test_yarn_tables_change_low_freqs():
    base = RopeConfig(dim=32, max_position=64)
    yarn = RopeConfig(
        dim=32,
        max_position=64,
        scaling_type="yarn",
        scaling_factor=8.0,
        original_max_position=8,
    )
    c0, _ = precompute_rope_tables(base)
    c1, _ = precompute_rope_tables(yarn)
    assert not np.allclose(np.asarray(c0), np.asarray(c1))
