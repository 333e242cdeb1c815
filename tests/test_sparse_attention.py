"""Quest-style sparse decode (ops/sparse_attention.py): with a budget
covering every live page the sparse path must equal the dense paged
decode exactly; with a partial budget it must still include the pages a
concentrated query actually attends (VERDICT r1 item 8: 'sparse==dense
logits test at small scale'). Reference:
kt-kernel/operators/kvcache/kvcache.h:52-99 (block anchors + top-k)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ktransformers_tpu.cache.paged import PagedKVCache
from ktransformers_tpu.models.paged import forward_paged
from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config

from tests.test_generate import TINY_DS
from tests.test_serving import TINY_GQA


def _prefill_then_decode(cfg, sparse_budget, num_ctx=40):
    spec = spec_from_hf_config(dict(cfg))
    params = init_params(spec, seed=0, quant="bf16")
    rng = np.random.default_rng(0)
    v = cfg["vocab_size"]
    tokens = jnp.asarray(rng.integers(0, v, (1, num_ctx)), jnp.int32)
    page = 8
    npages = num_ctx // page + 2

    def run(budget, summaries):
        kv = PagedKVCache.create(
            spec, num_pages=npages + 1, page_size=page,
            dtype=jnp.float32, summaries=summaries,
        )
        pt = jnp.asarray(1 + np.arange(npages, dtype=np.int32))[None]
        _, kv = forward_paged(
            params, spec, tokens, kv, pt,
            jnp.asarray([0], jnp.int32), compute_dtype=jnp.float32,
        )
        # one decode step
        tok = jnp.asarray([[7]], jnp.int32)
        logits, _ = forward_paged(
            params, spec, tok, kv, pt,
            jnp.asarray([num_ctx], jnp.int32), compute_dtype=jnp.float32,
            sparse_budget=budget,
        )
        return np.asarray(logits[0, -1])

    dense = run(None, False)
    sparse = run(sparse_budget, True)
    return dense, sparse


@pytest.mark.parametrize("cfg", [TINY_DS, TINY_GQA], ids=["mla", "gqa"])
def test_full_budget_sparse_equals_dense(cfg):
    """Budget >= live pages: identical attention set, logits match."""
    dense, sparse = _prefill_then_decode(cfg, sparse_budget=7, num_ctx=40)
    np.testing.assert_allclose(sparse, dense, rtol=2e-4, atol=2e-4)


def test_partial_budget_finds_needle_mla(rng):
    """Attention mass planted in 2 of 8 pages: a budget of 3 (needles +
    forced newest page) reproduces dense attention to fp tolerance —
    the bound provably ranks the hot pages on top."""
    import jax

    from ktransformers_tpu.ops.sparse_attention import (
        sparse_mla_decode,
        update_page_summaries,
    )

    b, h, r, dr, page, npages = 1, 4, 16, 8, 8, 8
    ctx = page * npages
    ckv = rng.standard_normal((npages, page, r)).astype(np.float32) * 0.05
    kpe = rng.standard_normal((npages, page, dr)).astype(np.float32) * 0.05
    # identical queries across heads so one needle dominates every head
    q1 = rng.standard_normal((b, 1, r)).astype(np.float32)
    q_abs = np.broadcast_to(q1, (b, h, r)).copy()
    qp1 = rng.standard_normal((b, 1, dr)).astype(np.float32)
    q_pe = np.broadcast_to(qp1, (b, h, dr)).copy()
    # needles: pages 2 and 5 contain keys strongly aligned with the query
    # (softmax mass outside them is ~e^-16, far below tolerance)
    for pg in (2, 5):
        ckv[pg, 3] = q_abs[0, 0] * 8.0
        kpe[pg, 3] = q_pe[0, 0] * 8.0
    smin = jnp.full((npages, r + dr), jnp.inf)
    smax = jnp.full((npages, r + dr), -jnp.inf)
    kcat = jnp.asarray(np.concatenate([ckv, kpe], -1))[None].reshape(
        1, npages * page, r + dr
    )
    pid = jnp.repeat(jnp.arange(npages), page)[None]
    smin, smax = update_page_summaries(smin, smax, kcat, pid)

    pt = jnp.arange(npages, dtype=jnp.int32)[None]
    lengths = jnp.asarray([ctx], jnp.int32)

    def dense_ref():
        scores = np.einsum("bhr,pqr->bhpq", q_abs, ckv) + np.einsum(
            "bhd,pqd->bhpq", q_pe, kpe
        )
        a = jax.nn.softmax(
            jnp.asarray(scores.reshape(b, h, -1) * 0.125), -1
        )
        return np.einsum(
            "bhx,xr->bhr", np.asarray(a), ckv.reshape(-1, r)
        )

    out = sparse_mla_decode(
        jnp.asarray(q_abs), jnp.asarray(q_pe),
        jnp.asarray(ckv), jnp.asarray(kpe), smin, smax,
        pt, lengths, page, 3, 0.125,
    )
    np.testing.assert_allclose(
        np.asarray(out), dense_ref(), rtol=2e-3, atol=2e-3
    )


def test_summary_update_and_reset(rng):
    from ktransformers_tpu.ops.sparse_attention import (
        update_page_summaries,
    )

    smin = jnp.full((4, 3), jnp.inf)
    smax = jnp.full((4, 3), -jnp.inf)
    k = jnp.asarray(rng.standard_normal((1, 5, 3)), jnp.float32)
    pid = jnp.asarray([[1, 1, 2, 2, 2]])
    smin, smax = update_page_summaries(smin, smax, k, pid)
    np.testing.assert_allclose(
        np.asarray(smax[1]), np.asarray(k[0, :2].max(0)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(smin[2]), np.asarray(k[0, 2:].min(0)), rtol=1e-6
    )
    # untouched pages stay +-inf
    assert np.isinf(np.asarray(smin[0])).all()

    cache = PagedKVCache(
        bufs_a=[jnp.zeros((4, 2, 3))], bufs_b=[jnp.zeros((4, 2, 3))],
        smin=[smin], smax=[smax], page_size=2,
    )
    cache = cache.reset_page_summaries([1])
    assert np.isinf(np.asarray(cache.smin[0][1])).all()
    assert not np.isinf(np.asarray(cache.smin[0][2])).any()


def test_serving_sparse_budget_full_equals_dense():
    """ServeEngine(sparse_budget=max_pages_per_query) — budget covers the
    whole table, so continuous-batching output matches the dense engine
    exactly, while summaries update + recycled-page resets run live."""
    from ktransformers_tpu.serving.engine import ServeEngine
    from ktransformers_tpu.serving.scheduler import SchedulerConfig

    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    cfg = dict(max_batch_size=2, prefill_chunk=8, page_size=8,
               max_pages_per_query=8)
    prompts = [list(range(4, 16)), list(range(30, 40))]

    dense = ServeEngine(params, spec, SchedulerConfig(**cfg), num_pages=32,
                        cache_dtype=jnp.float32, compute_dtype=jnp.float32)
    expected = [dense.generate_sync(p, max_new_tokens=6) for p in prompts]

    sp = ServeEngine(params, spec, SchedulerConfig(**cfg), num_pages=32,
                     cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                     sparse_budget=8)
    got = [sp.generate_sync(p, max_new_tokens=6) for p in prompts]
    assert got == expected


@pytest.mark.fast
def test_sparse_fused_mixed_matches_unfused(monkeypatch):
    """Sparse serving through the FUSED mixed step (r5: the last
    _can_fuse_mixed exclusion): staggered submissions force mixed
    decode+prefill programs with sparse_budget set; tokens must match the
    unfused sparse engine exactly (budget covers the whole table)."""
    from ktransformers_tpu.models import paged as paged_model
    from ktransformers_tpu.ops.pallas.paged_attention import (
        gqa_paged_decode,
        gqa_paged_prefill,
        mla_paged_decode,
        mla_paged_prefill,
    )
    from ktransformers_tpu.serving.engine import ServeEngine
    from ktransformers_tpu.serving.scheduler import SchedulerConfig

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
    try:
        spec = spec_from_hf_config(dict(TINY_DS))
        params = init_params(spec, seed=0, quant="bf16")
        cfg = dict(max_batch_size=2, prefill_chunk=8, page_size=8,
                   max_pages_per_query=8)

        def run(fused):
            monkeypatch.setenv("KT_FUSED_MIXED", "1" if fused else "0")
            eng = ServeEngine(
                params, spec, SchedulerConfig(**cfg), num_pages=32,
                cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                sparse_budget=8, enable_prefix_cache=False,
            )
            q1 = eng.submit(list(range(4, 14)), max_new_tokens=10)
            for _ in range(20):
                eng.step()
                if q1.state == "decode":
                    break
            q2 = eng.submit(list(range(20, 37)), max_new_tokens=6)
            while q1.state != "done" or q2.state != "done":
                if not eng.step():
                    break
            return list(q1.output_ids), list(q2.output_ids)

        fused_out = run(True)
        unfused_out = run(False)
        assert fused_out == unfused_out
    finally:
        paged_model.set_pallas_paged_decode(None, None)
        paged_model.set_pallas_paged_prefill(None, None)
