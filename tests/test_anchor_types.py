"""Anchor-type generality for sparse decode (VERDICT r3 item 5): the
reference's AnchorType {FIXED, DYNAMIC, QUEST, BLOCK_MAX, BLOCK_MEAN} x
RetrievalType {LAYER, KVHEAD, QHEAD} families
(kt-kernel/operators/kvcache/kvcache.h:52-99) re-designed as page-summary
planes + top-K page retrieval (ops/sparse_attention.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.ops.sparse_attention import (
    preselect_pages,
    select_pages,
    set_dynamic_anchors,
    snapkv_page_scores,
    sparse_gqa_decode,
    sparse_mla_decode,
    update_page_summaries_cfg,
)

from tests.test_generate import TINY_DS
from tests.test_serving import TINY_GQA

ANCHORS = ["quest", "block_max", "block_mean", "fixed", "dynamic"]


def _mla_setup(rng, npages=8, page=8, h=4, r=16, dr=8):
    ckv = rng.standard_normal((npages, page, r)).astype(np.float32) * 0.05
    kpe = rng.standard_normal((npages, page, dr)).astype(np.float32) * 0.05
    planes = {
        "smin": jnp.full((npages, r + dr), jnp.inf),
        "smax": jnp.full((npages, r + dr), -jnp.inf),
        "ssum": jnp.zeros((npages, r + dr)),
        "sfix": jnp.zeros((npages, r + dr)),
        "sdyn": jnp.zeros((npages, r + dr)),
    }
    return ckv, kpe, planes


def _update_planes(planes, ckv, kpe, page):
    npages = ckv.shape[0]
    kcat = jnp.asarray(np.concatenate([ckv, kpe], -1)).reshape(
        1, npages * page, -1
    )
    pid = jnp.repeat(jnp.arange(npages), page)[None]
    pos = jnp.arange(npages * page)[None]
    return update_page_summaries_cfg(planes, kcat, pid, pos, page)


@pytest.mark.parametrize("anchor", ANCHORS)
def test_full_budget_all_anchors_match_dense_mla(rng, anchor):
    """Any anchor kind with a budget covering every live page attends the
    full context — output equals dense attention."""
    b, h, r, dr, page, npages = 1, 4, 16, 8, 8, 8
    ckv, kpe, planes = _mla_setup(rng, npages, page, h, r, dr)
    planes = _update_planes(planes, ckv, kpe, page)
    q_abs = rng.standard_normal((b, h, r)).astype(np.float32)
    q_pe = rng.standard_normal((b, h, dr)).astype(np.float32)
    pt = jnp.arange(npages, dtype=jnp.int32)[None]
    lengths = jnp.asarray([npages * page], jnp.int32)

    scores = np.einsum("bhr,pqr->bhpq", q_abs, ckv) + np.einsum(
        "bhd,pqd->bhpq", q_pe, kpe
    )
    a = jax.nn.softmax(jnp.asarray(scores.reshape(b, h, -1) * 0.125), -1)
    dense = np.einsum("bhx,xr->bhr", np.asarray(a), ckv.reshape(-1, r))

    out = sparse_mla_decode(
        jnp.asarray(q_abs), jnp.asarray(q_pe),
        jnp.asarray(ckv), jnp.asarray(kpe),
        planes["smin"], planes["smax"],
        pt, lengths, page, npages, 0.125,
        anchor=anchor, planes=planes,
    )
    np.testing.assert_allclose(np.asarray(out), dense, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("anchor", ["block_max", "block_mean", "fixed"])
def test_partial_budget_anchor_finds_needle_mla(rng, anchor):
    """Each dot-product anchor must rank a page whose content aligns with
    the query above background pages. The needle placement matches the
    anchor semantics: fixed -> first slot; block_mean -> whole page;
    block_max -> one strong key."""
    b, h, r, dr, page, npages = 1, 4, 16, 8, 8, 8
    ckv, kpe, planes = _mla_setup(rng, npages, page, h, r, dr)
    q1 = rng.standard_normal((b, 1, r)).astype(np.float32)
    q_abs = np.broadcast_to(q1, (b, h, r)).copy()
    qp1 = rng.standard_normal((b, 1, dr)).astype(np.float32)
    q_pe = np.broadcast_to(qp1, (b, h, dr)).copy()
    needle = 3
    if anchor == "fixed":
        ckv[needle, 0] = q_abs[0, 0] * 8.0
        kpe[needle, 0] = q_pe[0, 0] * 8.0
    elif anchor == "block_mean":
        ckv[needle, :] = q_abs[0, 0] * 4.0
        kpe[needle, :] = q_pe[0, 0] * 4.0
    else:  # block_max
        ckv[needle, 5] = q_abs[0, 0] * 8.0
        kpe[needle, 5] = q_pe[0, 0] * 8.0
    planes = _update_planes(planes, ckv, kpe, page)
    pt = jnp.arange(npages, dtype=jnp.int32)[None]
    lengths = jnp.asarray([npages * page], jnp.int32)
    q_cat = jnp.asarray(np.concatenate([q_abs, q_pe], -1))
    sel = select_pages(
        q_cat, planes, pt, lengths, page, 2, anchor=anchor
    )
    assert needle in np.asarray(sel[0]), (anchor, np.asarray(sel))


def test_qhead_retrieval_mla(rng):
    """Per-qhead retrieval: heads with needles in different pages each
    find their own page at budget 2 and match dense attention."""
    b, h, r, dr, page, npages = 1, 2, 16, 8, 8, 8
    ckv, kpe, planes = _mla_setup(rng, npages, page, h, r, dr)
    q_abs = rng.standard_normal((b, h, r)).astype(np.float32)
    q_pe = rng.standard_normal((b, h, dr)).astype(np.float32)
    # head 0's needle in page 1, head 1's in page 5
    ckv[1, 3] = q_abs[0, 0] * 8.0
    kpe[1, 3] = q_pe[0, 0] * 8.0
    ckv[5, 4] = q_abs[0, 1] * 8.0
    kpe[5, 4] = q_pe[0, 1] * 8.0
    planes = _update_planes(planes, ckv, kpe, page)
    pt = jnp.arange(npages, dtype=jnp.int32)[None]
    lengths = jnp.asarray([npages * page], jnp.int32)

    scores = np.einsum("bhr,pqr->bhpq", q_abs, ckv) + np.einsum(
        "bhd,pqd->bhpq", q_pe, kpe
    )
    a = jax.nn.softmax(jnp.asarray(scores.reshape(b, h, -1) * 0.125), -1)
    dense = np.einsum("bhx,xr->bhr", np.asarray(a), ckv.reshape(-1, r))

    out = sparse_mla_decode(
        jnp.asarray(q_abs), jnp.asarray(q_pe),
        jnp.asarray(ckv), jnp.asarray(kpe),
        planes["smin"], planes["smax"],
        pt, lengths, page, 2, 0.125,
        anchor="quest", retrieval="qhead", planes=planes,
    )
    np.testing.assert_allclose(np.asarray(out), dense, rtol=2e-3, atol=2e-3)


def test_kvhead_retrieval_gqa(rng):
    """Per-kvhead retrieval (GQA): kv heads with needles in different
    pages each retrieve their own page at budget 2 and match dense."""
    b, hkv, g, d, page, npages = 1, 2, 2, 8, 8, 8
    h = hkv * g
    k = rng.standard_normal((npages, page, hkv, d)).astype(np.float32) * 0.05
    v = rng.standard_normal((npages, page, hkv, d)).astype(np.float32) * 0.05
    # identical queries within each kv-head group so the needle dominates
    # every group member (the per-KVHEAD page set is shared by the group)
    q1 = rng.standard_normal((b, hkv, 1, d)).astype(np.float32)
    q = np.broadcast_to(q1, (b, hkv, g, d)).reshape(b, h, d).copy()
    qg = q.reshape(b, hkv, g, d)
    # kv head 0's needle in page 2, kv head 1's in page 6 (strong enough
    # that the 64 background tokens' softmax mass is ~e^-30)
    k[2, 3, 0] = qg[0, 0, 0] * 40.0
    k[6, 4, 1] = qg[0, 1, 0] * 40.0
    planes = {
        "smin": jnp.full((npages, hkv, d), jnp.inf),
        "smax": jnp.full((npages, hkv, d), -jnp.inf),
    }
    kf = jnp.asarray(k).reshape(1, npages * page, hkv, d)
    pid = jnp.repeat(jnp.arange(npages), page)[None]
    pos = jnp.arange(npages * page)[None]
    planes = update_page_summaries_cfg(planes, kf, pid, pos, page)
    pt = jnp.arange(npages, dtype=jnp.int32)[None]
    lengths = jnp.asarray([npages * page], jnp.int32)

    scores = np.einsum("bkgd,pqkd->bkgpq", qg, k) * 0.125
    a = jax.nn.softmax(
        jnp.asarray(scores.reshape(b, hkv, g, -1)), -1
    ).reshape(scores.shape)
    dense = np.einsum("bkgpq,pqkd->bkgd", np.asarray(a), v).reshape(b, h, d)

    out = sparse_gqa_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        planes["smin"], planes["smax"],
        pt, lengths, page, 2, 0.125,
        anchor="quest", retrieval="kvhead", planes=planes,
    )
    np.testing.assert_allclose(np.asarray(out), dense, rtol=2e-3, atol=2e-3)


def test_snapkv_preselect_and_dynamic_anchors(rng):
    """The observation pass ranks the pages the question actually attends;
    preselect keeps them (plus recent); dynamic anchors derived from the
    same pass later retrieve the needle page."""
    b, h, r, dr, page, npages = 1, 4, 16, 8, 8, 8
    ckv, kpe, planes = _mla_setup(rng, npages, page, h, r, dr)
    qw = rng.standard_normal((b, 3, h, r + dr)).astype(np.float32)
    # the observation window strongly attends tokens in pages 2 and 4
    ckv[2, 1] = qw[0, 0, 0, :r] * 6.0
    kpe[2, 1] = qw[0, 0, 0, r:] * 6.0
    ckv[4, 6] = qw[0, 1, 1, :r] * 6.0
    kpe[4, 6] = qw[0, 1, 1, r:] * 6.0
    planes = _update_planes(planes, ckv, kpe, page)
    pt = jnp.arange(npages, dtype=jnp.int32)[None]
    lengths = jnp.asarray([npages * page], jnp.int32)

    page_mass, token_mass = snapkv_page_scores(
        jnp.asarray(qw), jnp.asarray(ckv), jnp.asarray(kpe),
        pt, lengths, page, 0.125, is_mla=True,
    )
    mask = preselect_pages(page_mass, lengths, page, keep=4, recent=1)
    m = np.asarray(mask[0])
    assert m[2] and m[4] and m[7]  # needles + forced recent page
    assert m.sum() == 4

    # dynamic anchors: needle pages' anchors become the hot keys
    kcat = jnp.asarray(np.concatenate([ckv, kpe], -1))
    planes = set_dynamic_anchors(
        planes, kcat, pt, token_mass, lengths, page
    )
    sdyn = np.asarray(planes["sdyn"])
    np.testing.assert_allclose(
        sdyn[2], np.concatenate([ckv[2, 1], kpe[2, 1]]), rtol=1e-5
    )
    # selection via dynamic anchors finds page 2 for the observation query
    sel = select_pages(
        jnp.asarray(qw[:, 0]), planes, pt, lengths, page, 3,
        anchor="dynamic",
    )
    assert 2 in np.asarray(sel[0])


@pytest.mark.parametrize("anchor", ["block_mean", "fixed"])
def test_serving_engine_anchor_full_budget(anchor):
    """ServeEngine with non-quest anchors: full budget == dense output
    (exercises plane creation, per-step updates, and threading)."""
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
                     sparse_budget=8, sparse_anchor=anchor)
    got = [sp.generate_sync(p, max_new_tokens=6) for p in prompts]
    assert got == expected
