"""Fused mixed step (forward_paged_mixed): decode batch + prefill chunk in
ONE model invocation must match the separate decode-then-prefill programs
(VERDICT r3 item 4; reference: balance_serve combined ForwardBatchInput,
archive/.../inference/forward_batch.py:18-816)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ktransformers_tpu.cache.paged import PagedKVCache
from ktransformers_tpu.models import paged as paged_model
from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.paged import forward_paged, forward_paged_mixed
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.ops.pallas.paged_attention import (
    gqa_paged_decode,
    gqa_paged_prefill,
    mla_paged_decode,
    mla_paged_prefill,
)

from tests.test_generate import TINY_DS
from tests.test_serving import TINY_GQA


@pytest.fixture
def paged_kernels_interpret():
    paged_model.set_pallas_paged_decode(
        lambda qn, qp, ckv, kpe, pt, lens, scale: mla_paged_decode(
            qn, qp, ckv, kpe, pt, lens, scale, interpret=True
        ),
        lambda q, k, v, pt, lens, scale, window=0: gqa_paged_decode(
            q, k, v, pt, lens, scale, window=window, interpret=True
        ),
    )
    paged_model.set_pallas_paged_prefill(
        lambda qn, qp, ckv, kpe, pt, lens, valid, scale: mla_paged_prefill(
            qn, qp, ckv, kpe, pt, lens, valid, scale, interpret=True
        ),
        lambda q, k, v, pt, lens, valid, scale, window: gqa_paged_prefill(
            q, k, v, pt, lens, valid, scale, window=window, interpret=True
        ),
    )
    yield
    paged_model.set_pallas_paged_decode(None, None)
    paged_model.set_pallas_paged_prefill(None, None)


@pytest.mark.parametrize("cfg", [TINY_DS, TINY_GQA], ids=["mla", "gqa"])
def test_mixed_equals_separate(cfg, paged_kernels_interpret, rng):
    spec = spec_from_hf_config(dict(cfg))
    params = init_params(spec, seed=0, quant="bf16")
    v = cfg["vocab_size"]
    page, pmax = 8, 4
    b_dec, ctx = 2, 11  # decode rows with 11 cached tokens each
    s_chunk = 8

    def fresh_kv():
        return PagedKVCache.create(
            spec, num_pages=1 + (b_dec + 1) * pmax, page_size=page,
            dtype=jnp.float32,
        )

    # page tables: decode rows own pages 1..pmax, pmax+1..2pmax; the
    # prefill query owns the next block
    tables = np.arange(1, 1 + (b_dec + 1) * pmax, dtype=np.int32).reshape(
        b_dec + 1, pmax
    )
    dec_tables = jnp.asarray(tables[:b_dec])
    pre_table = jnp.asarray(tables[b_dec:])

    # build the decode rows' KV by prefilling ctx tokens each
    prompts = jnp.asarray(rng.integers(0, v, (b_dec, ctx)), jnp.int32)
    kv = fresh_kv()
    _, kv = forward_paged(
        params, spec, prompts, kv, dec_tables,
        jnp.zeros((b_dec,), jnp.int32), compute_dtype=jnp.float32,
    )

    dec_tokens = jnp.asarray(rng.integers(0, v, (b_dec,)), jnp.int32)
    dec_lengths = jnp.full((b_dec,), ctx, jnp.int32)
    pre_tokens = jnp.asarray(rng.integers(0, v, (s_chunk,)), jnp.int32)
    pre_valid = jnp.asarray([6], jnp.int32)  # padded chunk: 6 live tokens

    # --- reference: separate decode then prefill programs ---
    import jax

    kv_ref = jax.tree.map(lambda x: x, kv)  # copy references
    dec_logits_ref, kv_ref = forward_paged(
        params, spec, dec_tokens[:, None], kv_ref, dec_tables, dec_lengths,
        compute_dtype=jnp.float32,
    )
    pre_logits_ref, kv_ref = forward_paged(
        params, spec, pre_tokens[None], kv_ref, pre_table,
        jnp.zeros((1,), jnp.int32), compute_dtype=jnp.float32,
        valid=pre_valid,
    )

    # --- fused ---
    dec_logits, pre_logits, kv_mix = forward_paged_mixed(
        params, spec, dec_tokens, pre_tokens, kv, dec_tables, dec_lengths,
        pre_table, jnp.zeros((1,), jnp.int32), pre_valid,
        compute_dtype=jnp.float32,
    )

    np.testing.assert_allclose(
        np.asarray(dec_logits), np.asarray(dec_logits_ref[:, -1]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(pre_logits_ref[:, -1]),
        rtol=2e-4, atol=2e-4,
    )
    for a, b in zip(kv_mix.bufs_a, kv_ref.bufs_a):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )
    for a, b in zip(kv_mix.bufs_b, kv_ref.bufs_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("cfg", [TINY_DS, TINY_GQA], ids=["mla", "gqa"])
def test_serving_fused_mixed_matches_unfused(cfg, paged_kernels_interpret,
                                             monkeypatch):
    """Engine-level: staggered submissions force mixed steps; fused output
    must equal the unfused engine token-for-token."""
    from ktransformers_tpu.serving.engine import ServeEngine
    from ktransformers_tpu.serving.scheduler import SchedulerConfig

    spec = spec_from_hf_config(dict(cfg))
    params = init_params(spec, seed=0, quant="bf16")
    scfg = dict(max_batch_size=2, prefill_chunk=8, page_size=8,
                max_pages_per_query=8)

    def run(fused: bool):
        monkeypatch.setenv("KT_FUSED_MIXED", "1" if fused else "0")
        eng = ServeEngine(
            params, spec, SchedulerConfig(**scfg), num_pages=32,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            enable_prefix_cache=False,
        )
        q1 = eng.submit(list(range(4, 14)), max_new_tokens=10)
        # step until q1 decodes, then submit q2 -> its prefill chunks ride
        # along with q1's decode steps (mixed batches)
        for _ in range(20):
            eng.step()
            if q1.state == "decode":
                break
        q2 = eng.submit(list(range(20, 37)), max_new_tokens=6)
        while q1.state != "done" or q2.state != "done":
            if not eng.step():
                break
        return list(q1.output_ids), list(q2.output_ids)

    assert run(True) == run(False)


@pytest.mark.parametrize("cfg", [TINY_DS, TINY_GQA], ids=["mla", "gqa"])
def test_mixed_multi_chunk_equals_separate(cfg, paged_kernels_interpret,
                                           rng):
    """C=2 prefill chunks (distinct queries) fused with the decode batch
    in one program == three separate programs (VERDICT r4 item 5)."""
    import jax

    spec = spec_from_hf_config(dict(cfg))
    params = init_params(spec, seed=0, quant="bf16")
    v = cfg["vocab_size"]
    page, pmax = 8, 4
    b_dec, ctx = 2, 11
    s_chunk, c_pre = 8, 2

    kv = PagedKVCache.create(
        spec, num_pages=1 + (b_dec + c_pre) * pmax, page_size=page,
        dtype=jnp.float32,
    )
    tables = np.arange(
        1, 1 + (b_dec + c_pre) * pmax, dtype=np.int32
    ).reshape(b_dec + c_pre, pmax)
    dec_tables = jnp.asarray(tables[:b_dec])
    pre_tables = jnp.asarray(tables[b_dec:])

    prompts = jnp.asarray(rng.integers(0, v, (b_dec, ctx)), jnp.int32)
    _, kv = forward_paged(
        params, spec, prompts, kv, dec_tables,
        jnp.zeros((b_dec,), jnp.int32), compute_dtype=jnp.float32,
    )

    dec_tokens = jnp.asarray(rng.integers(0, v, (b_dec,)), jnp.int32)
    dec_lengths = jnp.full((b_dec,), ctx, jnp.int32)
    pre_tokens = jnp.asarray(
        rng.integers(0, v, (c_pre, s_chunk)), jnp.int32
    )
    pre_valids = jnp.asarray([6, 8], jnp.int32)  # one padded, one full
    pre_lengths = jnp.zeros((c_pre,), jnp.int32)

    kv_ref = jax.tree.map(lambda x: x, kv)
    dec_logits_ref, kv_ref = forward_paged(
        params, spec, dec_tokens[:, None], kv_ref, dec_tables, dec_lengths,
        compute_dtype=jnp.float32,
    )
    pre_refs = []
    for i in range(c_pre):
        pl_ref, kv_ref = forward_paged(
            params, spec, pre_tokens[i][None], kv_ref,
            pre_tables[i][None], pre_lengths[i][None],
            compute_dtype=jnp.float32, valid=pre_valids[i][None],
        )
        pre_refs.append(np.asarray(pl_ref[:, -1]))

    dec_logits, pre_logits, kv_mix = forward_paged_mixed(
        params, spec, dec_tokens, pre_tokens, kv, dec_tables, dec_lengths,
        pre_tables, pre_lengths, pre_valids, compute_dtype=jnp.float32,
    )

    np.testing.assert_allclose(
        np.asarray(dec_logits), np.asarray(dec_logits_ref[:, -1]),
        rtol=2e-4, atol=2e-4,
    )
    assert pre_logits.shape[0] == c_pre
    for i in range(c_pre):
        np.testing.assert_allclose(
            np.asarray(pre_logits[i : i + 1]), pre_refs[i],
            rtol=2e-4, atol=2e-4,
        )
    for a, b in zip(kv_mix.bufs_a, kv_ref.bufs_a):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("cfg", [TINY_DS], ids=["mla"])
def test_serving_fused_two_chunks_matches_unfused(cfg,
                                                  paged_kernels_interpret,
                                                  monkeypatch):
    """Two queries prefilling simultaneously ride ONE fused mixed step
    (KT_MIXED_MAX_CHUNKS=2); tokens must match the unfused engine."""
    from ktransformers_tpu.serving.engine import ServeEngine
    from ktransformers_tpu.serving.scheduler import SchedulerConfig

    spec = spec_from_hf_config(dict(cfg))
    params = init_params(spec, seed=0, quant="bf16")
    scfg = dict(max_batch_size=3, prefill_chunk=8, page_size=8,
                max_pages_per_query=8, max_prefills_per_step=2)

    def run(fused: bool):
        monkeypatch.setenv("KT_FUSED_MIXED", "1" if fused else "0")
        monkeypatch.setenv("KT_MIXED_MAX_CHUNKS", "2")
        eng = ServeEngine(
            params, spec, SchedulerConfig(**scfg), num_pages=48,
            cache_dtype=jnp.float32, compute_dtype=jnp.float32,
            enable_prefix_cache=False,
        )
        q1 = eng.submit(list(range(4, 14)), max_new_tokens=12)
        for _ in range(20):
            eng.step()
            if q1.state == "decode":
                break
        # two fresh queries with different prompt lengths -> their chunks
        # share mixed steps with q1's decode
        q2 = eng.submit(list(range(20, 37)), max_new_tokens=6)
        q3 = eng.submit(list(range(40, 51)), max_new_tokens=6)
        while any(q.state != "done" for q in (q1, q2, q3)):
            if not eng.step():
                break
        return (list(q1.output_ids), list(q2.output_ids),
                list(q3.output_ids))

    assert run(True) == run(False)
