"""MTP self-speculation (engine/mtp.py): greedy-exactness — the output
must equal plain greedy generation for ANY head weights (the verify step
is the target model), with acceptance statistics reported. Also checks
that a head distilled trivially from the target (here: random) still
produces a well-formed KV/frontier protocol over many rounds."""

import numpy as np
import pytest

import jax.numpy as jnp

from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.engine.mtp import init_mtp_synthetic, mtp_generate
from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config

from tests.test_serving import TINY_GQA
from tests.test_generate import TINY_DS


@pytest.mark.parametrize("cfg", [TINY_DS, TINY_GQA], ids=["mla", "gqa"])
@pytest.mark.parametrize("k", [1, 3])
def test_mtp_greedy_exact(cfg, k):
    spec = spec_from_hf_config(dict(cfg))
    params = init_params(spec, seed=0, quant="bf16")
    gen = Generator(
        params, spec, max_len=96, batch=1,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    prompt = list(range(3, 11))
    expected = gen.generate([prompt], GenerateConfig(max_new_tokens=12))[0]

    mtp = init_mtp_synthetic(spec, seed=7, quant="bf16")
    got, stats = mtp_generate(
        gen, mtp, prompt, GenerateConfig(max_new_tokens=12), k=k
    )
    assert got == expected, (got, expected)
    assert stats.rounds > 0 and stats.drafted == stats.rounds * k
    assert 0.0 <= stats.acceptance_rate <= 1.0


@pytest.mark.parametrize("cfg", [TINY_DS, TINY_GQA], ids=["mla", "gqa"])
@pytest.mark.parametrize("k", [1, 3])
def test_mtp_fused_round_greedy_exact(cfg, k):
    """The single-dispatch fused round (draft + verify + accept + catch-up
    on device, engine/mtp.mtp_generate_fused) must equal plain greedy."""
    from ktransformers_tpu.engine.mtp import mtp_generate_fused

    spec = spec_from_hf_config(dict(cfg))
    params = init_params(spec, seed=0, quant="bf16")
    gen = Generator(
        params, spec, max_len=96, batch=1,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    prompt = list(range(3, 11))
    expected = gen.generate([prompt], GenerateConfig(max_new_tokens=12))[0]

    mtp = init_mtp_synthetic(spec, seed=7, quant="bf16")
    got, stats = mtp_generate_fused(
        gen, mtp, prompt, GenerateConfig(max_new_tokens=12), k=k
    )
    assert got == expected, (got, expected)
    assert stats.rounds > 0 and stats.drafted == stats.rounds * k


def test_mtp_fused_nonzero_acceptance():
    """Exercise the accept-length > 0 paths end-to-end (VERDICT r2 weak
    item 9): with a dominant lm_head column, target greedy and the head's
    drafts frequently pick the same token, so rounds accept > 0 drafts and
    the cache/frontier protocol advances by a+1 per round."""
    from ktransformers_tpu.engine.mtp import mtp_generate_fused
    from ktransformers_tpu.quant.formats import quantize

    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    d, v = spec.hidden_size, spec.vocab_size
    w = np.zeros((d, v), np.float32)
    w[:, 5] = 1.0  # token 5 dominates every argmax
    params["lm_head"] = quantize(jnp.asarray(w), "bf16")
    gen = Generator(
        params, spec, max_len=128, batch=1,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    mtp = init_mtp_synthetic(spec, seed=7, quant="bf16")
    prompt = list(range(3, 11))
    expected = gen.generate([prompt], GenerateConfig(max_new_tokens=24))[0]
    got, stats = mtp_generate_fused(
        gen, mtp, prompt, GenerateConfig(max_new_tokens=24), k=2
    )
    assert got == expected
    assert stats.accepted > 0, stats  # accept-length > 0 paths exercised
    # multi-token rounds: fewer rounds than emitted tokens
    assert stats.rounds < 24


@pytest.mark.parametrize("cfg", [TINY_DS, TINY_GQA], ids=["mla", "gqa"])
@pytest.mark.parametrize("k", [1, 3])
def test_mtp_single_program_round_greedy_exact(cfg, k):
    """The ONE-program round (catchup + drafts + verify + accept in a
    single jit, engine/mtp.mtp_generate_single — r4's measured-fastest
    round structure) must equal plain greedy."""
    from ktransformers_tpu.engine.mtp import mtp_generate_single

    spec = spec_from_hf_config(dict(cfg))
    params = init_params(spec, seed=0, quant="bf16")
    gen = Generator(
        params, spec, max_len=96, batch=1,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    prompt = list(range(3, 11))
    expected = gen.generate([prompt], GenerateConfig(max_new_tokens=12))[0]

    mtp = init_mtp_synthetic(spec, seed=7, quant="bf16")
    got, stats = mtp_generate_single(
        gen, mtp, prompt, GenerateConfig(max_new_tokens=12), k=k
    )
    assert got == expected, (got, expected)
    assert stats.rounds > 0 and stats.drafted == stats.rounds * k


def test_mtp_single_program_nonzero_acceptance():
    from ktransformers_tpu.engine.mtp import mtp_generate_single
    from ktransformers_tpu.quant.formats import quantize

    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    d, v = spec.hidden_size, spec.vocab_size
    w = np.zeros((d, v), np.float32)
    w[:, 5] = 1.0
    params["lm_head"] = quantize(jnp.asarray(w), "bf16")
    gen = Generator(
        params, spec, max_len=128, batch=1,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    mtp = init_mtp_synthetic(spec, seed=7, quant="bf16")
    prompt = list(range(3, 11))
    expected = gen.generate([prompt], GenerateConfig(max_new_tokens=24))[0]
    got, stats = mtp_generate_single(
        gen, mtp, prompt, GenerateConfig(max_new_tokens=24), k=2
    )
    assert got == expected
    assert stats.accepted > 0
