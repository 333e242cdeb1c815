"""Host-resident expert offload (offload/host_engine.py + csrc/host_moe.cpp):
the bigger-than-HBM serving path. Offloaded must equal resident — same
integer codes, same group scales, compute on host vs device (VERDICT r1
item 1: 'CPU-mesh test proving offloaded == resident logits')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.offload import host_moe

pytestmark = pytest.mark.skipif(
    not host_moe.available(), reason="libhost_moe.so unavailable"
)

TINY_DS = dict(
    model_type="deepseek_v2",
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    moe_intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,
    n_routed_experts=8,
    num_experts_per_tok=2,
    n_shared_experts=1,
    first_k_dense_replace=1,
    kv_lora_rank=32,
    q_lora_rank=None,
    qk_rope_head_dim=16,
    qk_nope_head_dim=16,
    v_head_dim=16,
    max_position_embeddings=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    norm_topk_prob=True,
    moe_layer_freq=1,
    topk_method="greedy",
    n_group=1,
    topk_group=1,
    routed_scaling_factor=1.0,
    scoring_func="softmax",
    hidden_act="silu",
)


def _setup():
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16", moe_quant="int4_g",
                         group_size=32)
    return spec, params


def test_host_moe_matches_device_moe(rng):
    """The C++ host FFN bit-follows the XLA gathered math (same codes +
    scales, f32 accumulation on both sides)."""
    from ktransformers_tpu.ops.activations import ActivationConfig
    from ktransformers_tpu.ops.moe import MoEConfig, MoEWeights, moe_forward
    from ktransformers_tpu.quant.formats import quantize

    E, K, N, T, topk = 8, 64, 32, 5, 2
    gu = quantize(
        jnp.asarray(rng.standard_normal((E, K, 2 * N)), jnp.float32) * 0.1,
        "int4_g", group_size=32,
    )
    dn = quantize(
        jnp.asarray(rng.standard_normal((E, N, K)), jnp.float32) * 0.1,
        "int4_g", group_size=32,
    )
    x = rng.standard_normal((T, K)).astype(np.float32)
    ids = rng.integers(0, E, (T, topk)).astype(np.int32)
    w = rng.random((T, topk)).astype(np.float32)

    ref = moe_forward(
        jnp.asarray(x), MoEWeights(gate_up=gu, down=dn),
        jnp.asarray(ids), jnp.asarray(w), MoEConfig(activation=ActivationConfig("silu")),
    )

    hl = host_moe.HostMoELayer.from_qtensors(gu, dn, "silu")
    got = hl.forward(x, ids, w)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_offloaded_generation_matches_resident():
    """Full-model: greedy generation with host experts == device experts."""
    from ktransformers_tpu.engine.generate import GenerateConfig, Generator
    from ktransformers_tpu.offload.host_engine import (
        HostOffloadGenerator,
        split_params_for_offload,
    )

    spec, params = _setup()
    prompts = [list(range(5, 13)), list(range(40, 48))]

    gen = Generator(params, spec, max_len=64, batch=2,
                    cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    expected = gen.generate(prompts, GenerateConfig(max_new_tokens=8))

    dev_params, host_layers = split_params_for_offload(params, spec)
    off = HostOffloadGenerator(
        dev_params, spec, host_layers, max_len=64, batch=2,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    got = off.generate(prompts, max_new_tokens=8, prefill_chunk=8)
    assert got == expected


def test_offloaded_logits_match_forward():
    """Single forward chunk: offloaded logits == reference forward logits."""
    from ktransformers_tpu.offload.host_engine import (
        HostOffloadGenerator,
        split_params_for_offload,
    )

    spec, params = _setup()
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, (2, 12)).astype(np.int32)

    cache = KVCache.create(spec, 2, 64, dtype=jnp.float32)
    ref_logits, _ = forward(
        params, spec, jnp.asarray(tokens), cache, compute_dtype=jnp.float32
    )

    dev_params, host_layers = split_params_for_offload(params, spec)
    off = HostOffloadGenerator(
        dev_params, spec, host_layers, max_len=64, batch=2,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    _, logits, _ = off.forward_chunk(tokens, off.new_cache())
    np.testing.assert_allclose(
        np.asarray(logits),
        np.asarray(ref_logits[:, -1].astype(jnp.float32)),
        rtol=1e-4, atol=1e-4,
    )


def test_offload_microbatch_pipeline_matches():
    """microbatches=2 (host GEMM of one half overlapped with the other
    half's device segments) must reproduce the unpipelined outputs —
    the pipeline is a pure schedule change."""
    from ktransformers_tpu.offload.host_engine import (
        HostOffloadGenerator,
        split_params_for_offload,
    )

    spec, params = _setup()
    prompts = [list(range(3, 13)), list(range(40, 50))]
    dev_params, host_layers = split_params_for_offload(params, spec)
    off = HostOffloadGenerator(
        dev_params, spec, host_layers, max_len=64, batch=2,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    want = off.generate(prompts, max_new_tokens=6, prefill_chunk=8)
    got = off.generate(prompts, max_new_tokens=6, prefill_chunk=8,
                       microbatches=2)
    assert got == want


def test_offloaded_varlen_prompts_match_single(rng):
    """UNEQUAL prompt lengths in one offloaded batch (r4: the equal-length
    restriction is lifted via a teacher-forced tail): each row's greedy
    output must equal its own single-prompt run."""
    from ktransformers_tpu.engine.generate import GenerateConfig, Generator
    from ktransformers_tpu.offload.host_engine import (
        HostOffloadGenerator,
        split_params_for_offload,
    )

    spec, params = _setup()
    prompts = [list(range(5, 13)), list(range(40, 52))]  # lens 8 and 12

    gen = Generator(params, spec, max_len=64, batch=1,
                    cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    expected = [
        gen.generate([p], GenerateConfig(max_new_tokens=6))[0]
        for p in prompts
    ]

    dev_params, host_layers = split_params_for_offload(params, spec)
    off = HostOffloadGenerator(
        dev_params, spec, host_layers, max_len=64, batch=2,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    got = off.generate(prompts, max_new_tokens=6, prefill_chunk=8)
    assert got == expected
