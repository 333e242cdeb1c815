"""Paged decode attention kernels (interpret mode) vs the XLA gather path:
the kernel must produce identical attention outputs while consuming the
page pool directly through the page table (reference analog:
flashinfer_wrapper.py paged MLA decode, triton_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ktransformers_tpu.ops.pallas.paged_attention import (
    gqa_paged_decode,
    mla_paged_decode,
)


def _mla_reference(qn, qp, ckv_all, kpe_all, lengths, scale):
    """Dense masked softmax over the gathered [B, Smax, R] cache."""
    scores = (
        jnp.einsum("bhr,bsr->bhs", qn.astype(jnp.float32),
                   ckv_all.astype(jnp.float32))
        + jnp.einsum("bhd,bsd->bhs", qp.astype(jnp.float32),
                     kpe_all.astype(jnp.float32))
    ) * scale
    mask = (
        jnp.arange(ckv_all.shape[1])[None, None, :] < lengths[:, None, None]
    )
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhs,bsr->bhr", p, ckv_all.astype(jnp.float32))


def _gather(buf, tables):
    g = buf[tables]
    b, pmax, page = g.shape[:3]
    return g.reshape(b, pmax * page, *g.shape[3:])


@pytest.mark.parametrize("page_size,pmax", [(8, 4), (16, 8), (128, 2)])
def test_mla_paged_decode_matches_reference(rng, page_size, pmax):
    b, h, r, dr = 3, 8, 64, 16
    num_pages = b * pmax + 1
    qn = jnp.asarray(rng.standard_normal((b, h, r)).astype(np.float32))
    qp = jnp.asarray(rng.standard_normal((b, h, dr)).astype(np.float32))
    ckv = jnp.asarray(
        rng.standard_normal((num_pages, page_size, r)).astype(np.float32)
    )
    kpe = jnp.asarray(
        rng.standard_normal((num_pages, page_size, dr)).astype(np.float32)
    )
    # shuffled non-trivial page tables; lengths straddle page boundaries
    perm = rng.permutation(num_pages - 1)[: b * pmax] + 1
    tables = jnp.asarray(perm.reshape(b, pmax).astype(np.int32))
    lengths = jnp.asarray([1, page_size + 3, pmax * page_size], jnp.int32)

    out = mla_paged_decode(
        qn, qp, ckv, kpe, tables, lengths, scale=0.2, interpret=True
    )
    ref = _mla_reference(
        qn, qp, _gather(ckv, tables), _gather(kpe, tables), lengths, 0.2
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("h,hkv", [(8, 8), (8, 2), (4, 1)])
def test_gqa_paged_decode_matches_reference(rng, h, hkv):
    b, d, page_size, pmax = 2, 32, 8, 6
    num_pages = b * pmax + 1
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    kp = jnp.asarray(
        rng.standard_normal((num_pages, page_size, hkv, d)).astype(np.float32)
    )
    vp = jnp.asarray(
        rng.standard_normal((num_pages, page_size, hkv, d)).astype(np.float32)
    )
    perm = rng.permutation(num_pages - 1)[: b * pmax] + 1
    tables = jnp.asarray(perm.reshape(b, pmax).astype(np.int32))
    lengths = jnp.asarray([5, pmax * page_size - 3], jnp.int32)

    out = gqa_paged_decode(
        q, kp, vp, tables, lengths, scale=d**-0.5, interpret=True
    )

    k_all = _gather(kp, tables)  # [B, S, Hkv, D]
    v_all = _gather(vp, tables)
    g = h // hkv
    qg = q.reshape(b, hkv, g, d).astype(jnp.float32)
    scores = jnp.einsum(
        "bkgd,bskd->bkgs", qg, k_all.astype(jnp.float32)
    ) * (d**-0.5)
    mask = (
        jnp.arange(k_all.shape[1])[None, None, None, :]
        < lengths[:, None, None, None]
    )
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("bkgs,bskd->bkgd", p, v_all.astype(jnp.float32))
    ref = ref.reshape(b, h, d)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_serving_decode_uses_paged_kernel_end_to_end():
    """Force-enable the paged kernels (interpret mode) inside the serving
    engine on CPU and check continuous-batching output is unchanged."""
    from ktransformers_tpu.models import paged as paged_model
    from ktransformers_tpu.models.init import init_params
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.serving.engine import ServeEngine
    from ktransformers_tpu.serving.scheduler import SchedulerConfig

    from tests.test_serving import TINY_GQA, _spec_params
    from tests.test_generate import TINY_DS

    for cfg in (TINY_DS, TINY_GQA):
        spec, params = _spec_params(cfg)

        def mk():
            return ServeEngine(
                params, spec,
                SchedulerConfig(max_batch_size=2, prefill_chunk=8,
                                page_size=8, max_pages_per_query=8),
                num_pages=32, cache_dtype=jnp.float32,
                compute_dtype=jnp.float32, enable_prefix_cache=False,
            )

        prompt = list(range(8))
        ref = mk().generate_sync(prompt, max_new_tokens=6)

        paged_model.set_pallas_paged_decode(
            lambda qn, qp, ckv, kpe, pt, lens, scale: mla_paged_decode(
                qn, qp, ckv, kpe, pt, lens, scale, interpret=True
            ),
            lambda q, k, v, pt, lens, scale: gqa_paged_decode(
                q, k, v, pt, lens, scale, interpret=True
            ),
        )
        try:
            out = mk().generate_sync(prompt, max_new_tokens=6)
        finally:
            paged_model.set_pallas_paged_decode(None, None)
        assert out == ref, (cfg["model_type"], out, ref)
