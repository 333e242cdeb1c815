"""Hybrid (GatedDeltaNet + full attention) models through the paged
serving stack: qwen3-next's linear layers keep O(1) per-slot recurrent
state instead of KV pages (models/paged.py linear branch; reference
coverage: archive/ktransformers/operators/balance_serve_attention.py +
custom_modeling_qwen3_next.py)."""

import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.serving.engine import ServeEngine
from ktransformers_tpu.serving.scheduler import SchedulerConfig

TINY_NEXT = dict(
    model_type="qwen3_next",
    vocab_size=96,
    hidden_size=64,
    intermediate_size=128,
    moe_intermediate_size=48,
    shared_expert_intermediate_size=48,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    linear_num_value_heads=4,
    linear_num_key_heads=2,
    linear_key_head_dim=16,
    linear_value_head_dim=16,
    linear_conv_kernel_dim=4,
    num_experts=8,
    num_experts_per_tok=2,
    norm_topk_prob=True,
    decoder_sparse_step=1,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=128,
    layer_types=[
        "linear_attention", "linear_attention", "linear_attention",
        "full_attention",
    ],
)


def _setup():
    spec = spec_from_hf_config(dict(TINY_NEXT))
    params = init_params(spec, seed=0, quant="bf16")
    return spec, params


def _engine(params, spec, max_batch=2):
    return ServeEngine(
        params, spec,
        SchedulerConfig(max_batch_size=max_batch, prefill_chunk=8,
                        page_size=8, max_pages_per_query=8),
        num_pages=64, cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )


def test_hybrid_serving_matches_single_user():
    """Greedy serving == Generator for a 3-linear + 1-full hybrid,
    including a prompt long enough to exercise multi-chunk prefill with
    bucket padding (the state-valid masking)."""
    spec, params = _setup()
    gen = Generator(params, spec, max_len=64, batch=1,
                    cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    prompts = [list(range(9)), list(range(20, 41))]  # 9 and 21 tokens
    expected = [
        gen.generate([p], GenerateConfig(max_new_tokens=6))[0]
        for p in prompts
    ]
    eng = _engine(params, spec)
    assert eng.prefix is None  # state is not page-reconstructible
    queries = [eng.submit(p, max_new_tokens=6) for p in prompts]
    for _ in range(400):
        if not eng.step() and all(q.state == "done" for q in queries):
            break
    got = [list(q.output_ids) for q in queries]
    assert got == expected, (got, expected)


def test_hybrid_slot_reuse_resets_state():
    """A finished query's slot must start clean for the next query —
    stale delta-rule state would silently corrupt outputs."""
    spec, params = _setup()
    gen = Generator(params, spec, max_len=64, batch=1,
                    cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    p1, p2 = list(range(12)), list(range(50, 60))
    want2 = gen.generate([p2], GenerateConfig(max_new_tokens=5))[0]

    eng = _engine(params, spec, max_batch=1)  # forces slot 0 reuse
    eng.generate_sync(p1, max_new_tokens=5)
    got2 = eng.generate_sync(p2, max_new_tokens=5)
    assert got2 == want2


def test_hybrid_decode_does_not_corrupt_prefilling_slot():
    """While query A decodes and query B prefills in mixed steps, A's
    decode rows (including B's padding row) must not advance B's state."""
    spec, params = _setup()
    gen = Generator(params, spec, max_len=64, batch=1,
                    cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    p1, p2 = list(range(7)), list(range(30, 51))  # long second prompt
    want1 = gen.generate([p1], GenerateConfig(max_new_tokens=10))[0]
    want2 = gen.generate([p2], GenerateConfig(max_new_tokens=6))[0]

    eng = _engine(params, spec)
    q1 = eng.submit(p1, max_new_tokens=10)
    while len(q1.output_ids) < 2:
        eng.step()
    q2 = eng.submit(p2, max_new_tokens=6)  # prefills while q1 decodes
    for _ in range(400):
        if not eng.step() and q1.state == "done" and q2.state == "done":
            break
    assert list(q1.output_ids) == want1
    assert list(q2.output_ids) == want2
