"""Separate-draft-model speculation (engine/draft_spec.py): greedy-exact
regardless of draft quality; perfect drafts accept everything.
Reference: --speculative_model (archive/ktransformers/server/args.py:31)."""

import numpy as np
import pytest

from ktransformers_tpu.engine.draft_spec import draft_generate
from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config

from tests.test_generate import TINY_DS


def _target():
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    return Generator(params, spec, max_len=128, batch=1,
                     cache_dtype=np.float32, compute_dtype=np.float32)


def _greedy_reference(gen, prompt, n):
    out = gen.generate([list(prompt)], GenerateConfig(max_new_tokens=n))
    return out[0]


@pytest.mark.fast
def test_draft_equals_target_accepts_everything():
    """Draft == target weights -> every draft accepted, output == greedy."""
    tgt = _target()
    spec = spec_from_hf_config(dict(TINY_DS))
    drf = Generator(tgt.params, spec, max_len=128, batch=1,
                    cache_dtype=np.float32, compute_dtype=np.float32)
    prompt = list(range(3, 11))
    ref = _greedy_reference(tgt, prompt, 12)
    out, stats = draft_generate(
        tgt, drf, prompt, GenerateConfig(max_new_tokens=12), k=3
    )
    assert out == ref
    assert stats.accepted == stats.drafted  # perfect drafter


@pytest.mark.fast
def test_bad_draft_still_greedy_exact():
    """A differently-seeded draft model: output must STILL equal the
    target's own greedy continuation (speed-only degradation)."""
    tgt = _target()
    spec = spec_from_hf_config(dict(TINY_DS))
    drf_params = init_params(spec, seed=7, quant="bf16")
    drf = Generator(drf_params, spec, max_len=128, batch=1,
                    cache_dtype=np.float32, compute_dtype=np.float32)
    prompt = list(range(20, 30))
    ref = _greedy_reference(tgt, prompt, 10)
    out, stats = draft_generate(
        tgt, drf, prompt, GenerateConfig(max_new_tokens=10), k=3
    )
    assert out == ref
    assert stats.rounds >= 1
