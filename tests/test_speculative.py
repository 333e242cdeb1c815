"""Speculative decoding must reproduce the target's greedy output exactly,
for any draft model (the exactness property of greedy speculation)."""

import jax.numpy as jnp

from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.engine.speculative import speculative_generate
from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config

from tests.test_generate import TINY_DS


def _gen(seed, max_len=96):
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=seed, quant="bf16")
    return Generator(params, spec, max_len=max_len, batch=1,
                     cache_dtype=jnp.float32, compute_dtype=jnp.float32)


def test_spec_same_model_full_acceptance():
    target = _gen(0)
    draft = _gen(0)  # identical model -> always accepts
    prompt = list(range(10))
    cfg = GenerateConfig(max_new_tokens=12)
    ref = target.generate([prompt], cfg)[0]
    out, stats = speculative_generate(target, draft, prompt, cfg, k=3)
    assert out == ref
    assert stats.acceptance_rate > 0.99


def test_spec_different_draft_exact():
    target = _gen(0)
    draft = _gen(123)  # unrelated model -> low acceptance, still exact
    prompt = list(range(5))
    cfg = GenerateConfig(max_new_tokens=10)
    ref = target.generate([prompt], cfg)[0]
    out, stats = speculative_generate(target, draft, prompt, cfg, k=4)
    assert out == ref
    assert stats.rounds >= 1


def test_spec_eos_stop():
    target = _gen(0)
    draft = _gen(0)
    prompt = list(range(8))
    free = target.generate([prompt], GenerateConfig(max_new_tokens=10))[0]
    k, eos = next((i, t) for i, t in enumerate(free) if t not in free[:i])
    cfg = GenerateConfig(max_new_tokens=10, eos_token_id=eos)
    out, _ = speculative_generate(target, draft, prompt, cfg, k=3)
    assert out == free[: k + 1] and out[-1] == eos
