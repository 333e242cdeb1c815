"""QKV projection fusion (utils/device_prep.fuse_qkv_projections):
fused q(+k+v / +kv_a) single-matmul params must reproduce the unfused
forward exactly on both the contiguous and paged model paths.

The fusion is the decode-launch-overhead fix measured in
scripts/profile_decode3.py; the reference packs projections the same way
at load time (packed gate_up_proj, kt-kernel/python/utils/loader.py:679).
"""

import copy

import jax.numpy as jnp
import numpy as np
import pytest

from ktransformers_tpu.cache.paged import PagedKVCache
from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.paged import forward_paged
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.utils.device_prep import fuse_qkv_projections

from tests.test_generate import TINY_DS
from tests.test_serving import TINY_GQA

TINY_DS_QLORA = dict(TINY_DS, q_lora_rank=24)


def _logits(spec, params, tokens):
    cache = KVCache.create(spec, 1, 64, dtype=jnp.float32)
    logits, _ = forward(params, spec, tokens, cache,
                        compute_dtype=jnp.float32)
    return np.asarray(logits, np.float32)


@pytest.mark.parametrize(
    "cfg,quant",
    [
        (TINY_DS, "int8"),
        (TINY_DS, "bf16"),
        (TINY_DS_QLORA, "int8"),
        (TINY_GQA, "int8"),  # attention_bias=True: fused-bias path
        (TINY_GQA, "int4_g"),
    ],
    ids=["mla-int8", "mla-bf16", "mla-qlora-int8", "gqa-bias-int8",
         "gqa-bias-int4g"],
)
def test_fused_matches_unfused(cfg, quant):
    spec = spec_from_hf_config(dict(cfg))
    params = init_params(spec, seed=0, quant=quant)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 96, (1, 12)), jnp.int32)

    ref = _logits(spec, params, tokens)
    fused = fuse_qkv_projections(copy.deepcopy(params), spec)

    fkey = "qkv_a" if spec.attention.kind == "mla" else "qkv"
    attn = fused["layers"][0]["attn"]
    assert fkey in attn and "kv_a" not in attn and "k_proj" not in attn
    got = _logits(spec, fused, tokens)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fused_paged_forward():
    spec = spec_from_hf_config(dict(TINY_GQA))
    params = fuse_qkv_projections(
        init_params(spec, seed=0, quant="int8"), spec
    )
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, 96, (1, 16)), jnp.int32)

    ref = _logits(spec, params, tokens)[:, -1]

    kv = PagedKVCache.create(spec, num_pages=16, page_size=8,
                             dtype=jnp.float32)
    pt = jnp.asarray(np.arange(8, dtype=np.int32))[None]
    logits, kv = forward_paged(
        params, spec, tokens, kv, pt, jnp.asarray([0], jnp.int32),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(logits[:, -1], np.float32), ref, rtol=2e-5, atol=2e-5
    )


def test_lora_blocks_fusion():
    """A projection carrying a LoRA adapter must be left unfused (the
    adapter key would silently stop applying otherwise)."""
    spec = spec_from_hf_config(dict(TINY_GQA))
    params = init_params(spec, seed=0, quant="int8")
    attn = params["layers"][0]["attn"]
    attn["q_proj_lora"] = {
        "a": jnp.zeros((32, 2), jnp.float32),
        "b": jnp.zeros((2, attn["q_proj"].out_features), jnp.float32),
    }
    fused = fuse_qkv_projections(params, spec)
    a0 = fused["layers"][0]["attn"]
    assert "qkv" not in a0 and "q_proj" in a0
    # the clean layer still fuses
    assert "qkv" in fused["layers"][1]["attn"]
