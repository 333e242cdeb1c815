"""Generation engine tests: greedy determinism, chunked-prefill equivalence,
sampler behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.engine.sampler import SamplingConfig, sample
from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config

TINY_DS = dict(
    model_type="deepseek_v2",
    vocab_size=96,
    hidden_size=32,
    intermediate_size=64,
    moe_intermediate_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=2,
    n_shared_experts=1,
    n_routed_experts=4,
    num_experts_per_tok=2,
    first_k_dense_replace=1,
    moe_layer_freq=1,
    topk_method="greedy",
    norm_topk_prob=False,
    routed_scaling_factor=1.0,
    kv_lora_rank=16,
    q_lora_rank=None,
    qk_rope_head_dim=8,
    qk_nope_head_dim=16,
    v_head_dim=16,
    max_position_embeddings=128,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
)


def _gen(max_len=96, batch=1, quant="bf16"):
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant=quant)
    return Generator(params, spec, max_len=max_len, batch=batch,
                     cache_dtype=jnp.float32, compute_dtype=jnp.float32)


def test_greedy_deterministic():
    gen = _gen()
    prompt = list(range(10))
    cfg = GenerateConfig(max_new_tokens=12)
    out1 = gen.generate([prompt], cfg)
    out2 = gen.generate([prompt], cfg)
    assert out1 == out2
    assert len(out1[0]) == 12


def test_chunked_prefill_equals_single_shot():
    """Different chunk sizes must not change greedy output (reference
    chunk_size invariant, util/utils.py:496)."""
    prompt = list(range(33))
    outs = []
    for chunk in (8, 16, 64):
        gen = _gen()
        cfg = GenerateConfig(max_new_tokens=8, prefill_chunk=chunk)
        outs.append(gen.generate([prompt], cfg))
    assert outs[0] == outs[1] == outs[2]


def test_batched_generate():
    gen = _gen(batch=2)
    cfg = GenerateConfig(max_new_tokens=6)
    out = gen.generate([list(range(8)), list(range(8, 16))], cfg)
    assert len(out) == 2 and all(len(o) == 6 for o in out)
    # Different prompts should (almost surely) diverge.
    assert out[0] != out[1]


def test_eos_stops():
    gen = _gen()
    cfg = GenerateConfig(max_new_tokens=20)
    free = gen.generate([list(range(8))], cfg)[0]
    eos = free[2]  # pretend the 3rd generated token is EOS
    cfg2 = GenerateConfig(max_new_tokens=20, eos_token_id=eos)
    out = gen.generate([list(range(8))], cfg2)[0]
    assert out[: 3] == free[: 3]
    assert len(out) <= len(free)
    assert out[-1] == eos


def test_sampler_topk_topp():
    logits = jnp.asarray(
        np.log(np.array([[0.5, 0.25, 0.125, 0.0625, 0.0625]], np.float32))
    )
    key = jax.random.PRNGKey(0)
    # top_k=1 == greedy even at temperature
    cfg = SamplingConfig(temperature=1.0, top_k=1)
    for i in range(5):
        tok = sample(logits, jax.random.fold_in(key, i), cfg)
        assert int(tok[0]) == 0
    # top_p=0.5 keeps only token 0
    cfg = SamplingConfig(temperature=1.0, top_p=0.49)
    for i in range(5):
        tok = sample(logits, jax.random.fold_in(key, i), cfg)
        assert int(tok[0]) == 0


def test_repetition_penalty():
    from ktransformers_tpu.engine.sampler import apply_repetition_penalty

    logits = jnp.asarray([[2.0, -1.0, 3.0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    out = np.asarray(apply_repetition_penalty(logits, mask, 2.0))
    np.testing.assert_allclose(out, [[1.0, -2.0, 3.0]])


def test_presence_frequency_penalties():
    from ktransformers_tpu.engine.sampler import (
        apply_presence_frequency_penalties,
    )

    logits = jnp.asarray([[1.0, 2.0, 3.0]])
    counts = jnp.asarray([[0.0, 1.0, 3.0]])
    out = np.asarray(
        apply_presence_frequency_penalties(logits, counts, 0.5, 0.25)
    )
    np.testing.assert_allclose(out, [[1.0, 2.0 - 0.5 - 0.25, 3.0 - 0.5 - 0.75]])
