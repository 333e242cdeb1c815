"""Blockwise (flash-style) attention == dense attention, incl. the
long-context threshold path through the full model."""

import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.ops.attention import (
    causal_mask,
    mha,
    mha_blockwise,
    mla_absorbed,
    mla_absorbed_blockwise,
)

from tests.test_generate import TINY_DS


def test_mla_blockwise_matches_dense(rng):
    b, h, sq, r, dr, skv = 2, 4, 5, 32, 16, 300  # non-multiple of block
    qn = jnp.asarray(rng.standard_normal((b, h, sq, r)).astype(np.float32))
    qp = jnp.asarray(rng.standard_normal((b, h, sq, dr)).astype(np.float32))
    ckv = jnp.asarray(rng.standard_normal((b, skv, r)).astype(np.float32))
    kpe = jnp.asarray(rng.standard_normal((b, skv, dr)).astype(np.float32))
    offs = jnp.asarray([100, 250], jnp.int32)
    qpos = offs[:, None] + jnp.arange(sq)[None, :]

    mask = jnp.stack(
        [causal_mask(sq, skv, offs[i]) for i in range(b)]
    )
    ref = mla_absorbed(qn, qp, ckv, kpe, scale=0.11, mask=mask)
    out = mla_absorbed_blockwise(
        qn, qp, ckv, kpe, qpos, scale=0.11, block_size=64
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_gqa_blockwise_matches_dense(rng):
    b, h, hkv, sq, d, skv = 2, 8, 2, 3, 16, 200
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, hkv, skv, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, hkv, skv, d)).astype(np.float32))
    offs = jnp.asarray([50, 180], jnp.int32)
    qpos = offs[:, None] + jnp.arange(sq)[None, :]
    mask = jnp.stack([causal_mask(sq, skv, offs[i]) for i in range(b)])
    ref = mha(q, k, v, scale=0.25, mask=mask)
    out = mha_blockwise(q, k, v, qpos, scale=0.25, block_size=64)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_model_long_context_threshold(monkeypatch):
    """Force the blockwise path in the full model and check logits match the
    dense path on identical inputs."""
    import ktransformers_tpu.models.model as mm
    import ktransformers_tpu.ops.attention as att

    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 96, (1, 24)), jnp.int32)

    cache = KVCache.create(spec, 1, 64, dtype=jnp.float32)
    ref, _ = forward(params, spec, tokens, cache, compute_dtype=jnp.float32)

    monkeypatch.setattr(mm, "BLOCKWISE_KV_THRESHOLD", 32)
    cache = KVCache.create(spec, 1, 64, dtype=jnp.float32)
    out, _ = forward(params, spec, tokens, cache, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
