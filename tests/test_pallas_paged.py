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


@pytest.mark.parametrize("window", [8, 20])
def test_gqa_paged_decode_windowed(rng, window):
    """Sliding-window decode through the paged kernel == masked reference
    (r3 weak item 9: windowed layers used to fall back to the full-KV
    gather path)."""
    b, h, hkv, d, page_size, pmax = 2, 8, 2, 32, 8, 6
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
    lengths = jnp.asarray([13, pmax * page_size - 3], jnp.int32)

    out = gqa_paged_decode(
        q, kp, vp, tables, lengths, scale=d**-0.5, window=window,
        interpret=True,
    )

    k_all = _gather(kp, tables)
    v_all = _gather(vp, tables)
    g = h // hkv
    qg = q.reshape(b, hkv, g, d).astype(jnp.float32)
    scores = jnp.einsum(
        "bkgd,bskd->bkgs", qg, k_all.astype(jnp.float32)
    ) * (d**-0.5)
    kpos = jnp.arange(k_all.shape[1])[None, None, None, :]
    L = lengths[:, None, None, None]
    mask = (kpos < L) & (kpos > L - 1 - window)
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("bkgs,bskd->bkgd", p, v_all.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.reshape(b, h, d)),
        rtol=2e-5, atol=2e-5,
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
            lambda q, k, v, pt, lens, scale, window=0: gqa_paged_decode(
                q, k, v, pt, lens, scale, window=window, interpret=True
            ),
        )
        try:
            out = mk().generate_sync(prompt, max_new_tokens=6)
        finally:
            paged_model.set_pallas_paged_decode(None, None)
        assert out == ref, (cfg["model_type"], out, ref)


def _causal_ref(scores, lengths, s_chunk, page_total, window=0):
    """Mask helper for prefill refs: scores [B, H, S, Stot]."""
    b = scores.shape[0]
    qpos = lengths[:, None] + jnp.arange(s_chunk)[None, :]  # [B, S]
    kpos = jnp.arange(scores.shape[-1])[None, None, None, :]
    ok = kpos <= qpos[:, None, :, None]
    if window:
        ok = ok & (kpos > qpos[:, None, :, None] - window)
    return jnp.where(ok, scores, -1e30)


@pytest.mark.parametrize("page_size,pmax,s_chunk", [(8, 8, 16), (16, 4, 8)])
def test_mla_paged_prefill_matches_reference(rng, page_size, pmax, s_chunk):
    from ktransformers_tpu.ops.pallas.paged_attention import (
        mla_paged_prefill,
    )

    b, h, r, dr = 2, 4, 64, 16
    num_pages = b * pmax + 1
    qn = jnp.asarray(
        rng.standard_normal((b, h, s_chunk, r)).astype(np.float32)
    )
    qp = jnp.asarray(
        rng.standard_normal((b, h, s_chunk, dr)).astype(np.float32)
    )
    ckv = jnp.asarray(
        rng.standard_normal((num_pages, page_size, r)).astype(np.float32)
    )
    kpe = jnp.asarray(
        rng.standard_normal((num_pages, page_size, dr)).astype(np.float32)
    )
    perm = rng.permutation(num_pages - 1)[: b * pmax] + 1
    tables = jnp.asarray(perm.reshape(b, pmax).astype(np.int32))
    # seq 0: fresh prefill of a partial chunk; seq 1: continuation chunk
    lengths = jnp.asarray([0, 2 * page_size + 3], jnp.int32)
    valid = jnp.asarray([s_chunk - 3, s_chunk], jnp.int32)

    out = mla_paged_prefill(
        qn, qp, ckv, kpe, tables, lengths, valid, scale=0.2,
        block_q=32, interpret=True,
    )

    ckv_all = _gather(ckv, tables)
    kpe_all = _gather(kpe, tables)
    scores = (
        jnp.einsum("bhsr,btr->bhst", qn, ckv_all)
        + jnp.einsum("bhsd,btd->bhst", qp, kpe_all)
    ) * 0.2
    # rows past valid[b] are padding: only compare valid rows
    scores = _causal_ref(scores, lengths, s_chunk, ckv_all.shape[1])
    total = lengths + valid
    kmask = jnp.arange(ckv_all.shape[1])[None, None, None, :] < total[
        :, None, None, None
    ]
    scores = jnp.where(kmask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("bhst,btr->bhsr", p, ckv_all)
    for bi in range(b):
        nv = int(valid[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :nv]), np.asarray(ref[bi, :, :nv]),
            rtol=2e-3, atol=2e-3,
        )


@pytest.mark.parametrize("window", [0, 12])
def test_gqa_paged_prefill_matches_reference(rng, window):
    from ktransformers_tpu.ops.pallas.paged_attention import (
        gqa_paged_prefill,
    )

    b, h, hkv, d, s_chunk = 2, 8, 2, 32, 8
    page_size, pmax = 8, 6
    num_pages = b * pmax + 1
    q = jnp.asarray(
        rng.standard_normal((b, h, s_chunk, d)).astype(np.float32)
    )
    k = jnp.asarray(
        rng.standard_normal((num_pages, page_size, hkv, d)).astype(np.float32)
    )
    v = jnp.asarray(
        rng.standard_normal((num_pages, page_size, hkv, d)).astype(np.float32)
    )
    perm = rng.permutation(num_pages - 1)[: b * pmax] + 1
    tables = jnp.asarray(perm.reshape(b, pmax).astype(np.int32))
    lengths = jnp.asarray([0, page_size + 5], jnp.int32)
    valid = jnp.asarray([s_chunk, s_chunk - 2], jnp.int32)

    out = gqa_paged_prefill(
        q, k, v, tables, lengths, valid, scale=0.3, window=window,
        block_q=16, interpret=True,
    )

    k_all = _gather(k, tables)  # [B, Stot, Hkv, D]
    v_all = _gather(v, tables)
    g = h // hkv
    # expand kv heads to query heads (kv-head-major query order)
    k_exp = jnp.repeat(k_all.transpose(0, 2, 1, 3), g, axis=1)
    v_exp = jnp.repeat(v_all.transpose(0, 2, 1, 3), g, axis=1)
    # query head order in gqa_paged_prefill is (kh, g) groups — same as
    # repeat over kv-head-major; the model passes q already head-major
    # grouped [h = kh*g + gi]? NOTE: gqa_paged_prefill reshapes
    # [B,H,S,D] -> [B,hkv,g,S,D], i.e. assumes h index = kh*g + gi,
    # matching jnp.repeat ordering here.
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k_exp) * 0.3
    scores = _causal_ref(scores, lengths, s_chunk, k_all.shape[1], window)
    total = lengths + valid
    kmask = jnp.arange(k_all.shape[1])[None, None, None, :] < total[
        :, None, None, None
    ]
    scores = jnp.where(kmask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("bhst,bhtd->bhsd", p, v_exp)
    for bi in range(b):
        nv = int(valid[bi])
        np.testing.assert_allclose(
            np.asarray(out[bi, :, :nv]), np.asarray(ref[bi, :, :nv]),
            rtol=2e-3, atol=2e-3,
        )
