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
