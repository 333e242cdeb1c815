"""Paged decode attention (Pallas): page-table-indexed block fetches.

The TPU analog of the reference's paged decode attention
(custom_flashinfer BatchMLAPagedAttentionWrapper,
archive/ktransformers/operators/flashinfer_wrapper.py:78-221, and the
Triton 2-stage grouped decode kernel, triton_attention.py:16-358): one
query token per sequence attends over a *paged* KV pool. Unlike the
r1 gather path (models/paged.py _gather_pages), no contiguous copy of the
KV is ever materialized — each grid step DMA-fetches the next page(s) of
the sequence straight from the page pool via a scalar-prefetched page
table, so HBM traffic is exactly the bytes of the sequence's live KV.

Two kernels:
- `mla_paged_decode`: absorbed-MLA decode (compressed ckv + k_pe pages).
- `gqa_paged_decode`: grouped-query attention decode (k/v pages).

Both fetch `pages_per_block = max(1, 128 // page_size)` pages per grid
step (multiple in_specs aliasing the same pool at consecutive page-table
slots) so the score matmul's lane dimension stays MXU-friendly even with
small pages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _last_valid_slot(length, page: int):
    """Index of the last page-table slot holding valid tokens (>= 0)."""
    return jnp.maximum((length + page - 1) // page - 1, 0)


# ---------------------------------------------------------------------------
# MLA (compressed ckv + k_pe pages)
# ---------------------------------------------------------------------------


def _mla_kernel(
    pt_ref,  # scalar prefetch: page tables flat [B * Pmax]
    lens_ref,  # scalar prefetch: [B]
    qn_ref,  # (1, H, R)
    qp_ref,  # (1, H, Dr)
    *page_refs,  # ppb x ckv (1, page, R), ppb x kpe (1, page, Dr), then
    # o_ref (1, H, R), scratches m/l/acc
    scale: float,
    page: int,
    ppb: int,
    n_s: int,
):
    o_ref = page_refs[2 * ppb]
    m_sc, l_sc, acc_sc = page_refs[2 * ppb + 1 :]
    ckv_refs = page_refs[:ppb]
    kpe_refs = page_refs[ppb : 2 * ppb]

    b = pl.program_id(0)
    s = pl.program_id(1)
    length = lens_ref[b]

    @pl.when(s == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    @pl.when(s * ppb * page < length)
    def _():
        qn = qn_ref[0].astype(jnp.float32)  # [H, R]
        qp = qp_ref[0].astype(jnp.float32)  # [H, Dr]
        ckv = jnp.concatenate(
            [r[0] for r in ckv_refs], axis=0
        ).astype(jnp.float32)  # [ppb*page, R]
        kpe = jnp.concatenate(
            [r[0] for r in kpe_refs], axis=0
        ).astype(jnp.float32)  # [ppb*page, Dr]
        base = s * ppb * page
        row_pos = base + jax.lax.broadcasted_iota(
            jnp.int32, (ckv.shape[0], 1), 0
        )
        # zero rows past the valid length: boundary pages may hold garbage,
        # and 0 * NaN would poison the accumulator
        row_valid = row_pos < length
        ckv = jnp.where(row_valid, ckv, 0.0)
        kpe = jnp.where(row_valid, kpe, 0.0)
        scores = (
            jax.lax.dot_general(
                qn, ckv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                qp, kpe, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ) * scale  # [H, ppb*page]
        kpos = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(kpos < length, scores, NEG_INF)

        m_prev = m_sc[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_sc[:, :1] = l_sc[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_sc[:] = acc_sc[:] * corr + jnp.dot(
            p, ckv, preferred_element_type=jnp.float32
        )
        m_sc[:, :1] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[0] = (
            acc_sc[:] / jnp.maximum(l_sc[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret")
)
def mla_paged_decode(
    q_nope_eff: jnp.ndarray,  # [B, H, R]
    q_pe: jnp.ndarray,  # [B, H, Dr]
    ckv_pages: jnp.ndarray,  # [P, page, R]
    kpe_pages: jnp.ndarray,  # [P, page, Dr]
    page_tables: jnp.ndarray,  # [B, Pmax] int32
    lengths: jnp.ndarray,  # [B] valid kv length (incl. current token)
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, R] attention output in the compressed space."""
    b, h, r = q_nope_eff.shape
    dr = q_pe.shape[-1]
    page = ckv_pages.shape[1]
    pmax = page_tables.shape[1]
    ppb = max(1, min(128 // page, pmax))
    while pmax % ppb:
        ppb -= 1
    n_s = pmax // ppb

    def page_spec(pool_last_dim, slot):
        # fetch the page at table slot s*ppb + slot, clamped to the last
        # valid slot so out-of-range steps re-fetch an already-resident page
        def index_map(i, s, pt, lens):
            j = jnp.minimum(s * ppb + slot, _last_valid_slot(lens[i], page))
            return (pt[i * pmax + j], 0, 0)

        return pl.BlockSpec((1, page, pool_last_dim), index_map)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec((1, h, r), lambda i, s, pt, lens: (i, 0, 0)),
            pl.BlockSpec((1, h, dr), lambda i, s, pt, lens: (i, 0, 0)),
            *[page_spec(r, j) for j in range(ppb)],
            *[page_spec(dr, j) for j in range(ppb)],
        ],
        out_specs=pl.BlockSpec((1, h, r), lambda i, s, pt, lens: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, r), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _mla_kernel, scale=scale, page=page, ppb=ppb, n_s=n_s
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, r), q_nope_eff.dtype),
        interpret=interpret,
    )(
        page_tables.reshape(-1).astype(jnp.int32),
        lengths.astype(jnp.int32),
        q_nope_eff,
        q_pe,
        *([ckv_pages] * ppb),
        *([kpe_pages] * ppb),
    )


# ---------------------------------------------------------------------------
# GQA (k/v pages, grouped query heads)
# ---------------------------------------------------------------------------


def _gqa_kernel(
    pt_ref,
    lens_ref,
    q_ref,  # (1, H, D)
    *page_refs,  # ppb x k (1, page, Hkv, D), ppb x v, o_ref, scratches
    scale: float,
    page: int,
    ppb: int,
    n_s: int,
    hkv: int,
    window: int = 0,
):
    # one grid step processes ALL kv heads of a page block (static loop):
    # Mosaic requires the trailing block dims to be full array dims, and
    # per-head page blocks would re-fetch every page hkv times anyway
    o_ref = page_refs[2 * ppb]
    m_sc, l_sc, acc_sc = page_refs[2 * ppb + 1 :]
    k_refs = page_refs[:ppb]
    v_refs = page_refs[ppb : 2 * ppb]

    b = pl.program_id(0)
    s = pl.program_id(1)
    length = lens_ref[b]
    h = q_ref.shape[1]
    g = h // hkv

    @pl.when(s == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    live = s * ppb * page < length
    if window:
        # sliding-window layers (smallthinker swa_layout): the decode
        # token at position length-1 attends keys kpos > length-1-window;
        # page blocks entirely older than the window are skipped (their
        # prefetch is clamped into the window, see gqa_paged_decode)
        live = live & ((s + 1) * ppb * page > length - 1 - window)

    @pl.when(live)
    def _():
        k = jnp.concatenate(
            [r[0] for r in k_refs], axis=0
        ).astype(jnp.float32)  # [ppb*page, Hkv, D]
        v = jnp.concatenate(
            [r[0] for r in v_refs], axis=0
        ).astype(jnp.float32)
        base = s * ppb * page
        row_pos = base + jax.lax.broadcasted_iota(
            jnp.int32, (k.shape[0], 1, 1), 0
        )
        k = jnp.where(row_pos < length, k, 0.0)
        v = jnp.where(row_pos < length, v, 0.0)
        for kh in range(hkv):
            rows = slice(kh * g, (kh + 1) * g)
            q = q_ref[0, rows].astype(jnp.float32)  # [G, D]
            scores = (
                jax.lax.dot_general(
                    q, k[:, kh], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # [G, ppb*page]
            kpos = base + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1
            )
            ok = kpos < length
            if window:
                ok = ok & (kpos > length - 1 - window)
            scores = jnp.where(ok, scores, NEG_INF)

            m_prev = m_sc[rows, :1]
            m_new = jnp.maximum(
                m_prev, jnp.max(scores, axis=-1, keepdims=True)
            )
            p = jnp.exp(scores - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_sc[rows, :1] = l_sc[rows, :1] * corr + jnp.sum(
                p, axis=-1, keepdims=True
            )
            acc_sc[rows, :] = acc_sc[rows, :] * corr + jnp.dot(
                p, v[:, kh], preferred_element_type=jnp.float32
            )
            m_sc[rows, :1] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[0] = (
            acc_sc[:] / jnp.maximum(l_sc[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "window")
)
def gqa_paged_decode(
    q: jnp.ndarray,  # [B, H, D]
    k_pages: jnp.ndarray,  # [P, page, Hkv, D]
    v_pages: jnp.ndarray,  # [P, page, Hkv, D]
    page_tables: jnp.ndarray,  # [B, Pmax] int32
    lengths: jnp.ndarray,  # [B]
    scale: float,
    window: int = 0,  # sliding-window layers: keys older than `window`
    # positions are outside the attention set (and their pages' DMA is
    # redirected to an in-window page)
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, D]."""
    b, h, d = q.shape
    page, hkv = k_pages.shape[1], k_pages.shape[2]
    g = h // hkv
    pmax = page_tables.shape[1]
    ppb = max(1, min(128 // page, pmax))
    while pmax % ppb:
        ppb -= 1
    n_s = pmax // ppb
    # q rows grouped kv-head-major so head kh's queries are rows
    # [kh*g, (kh+1)*g)
    qg = q.reshape(b, hkv, g, d).reshape(b, h, d)

    def page_spec(slot):
        def index_map(i, s, pt, lens):
            j = s * ppb + slot
            if window:
                first = jnp.maximum(lens[i] - window, 0) // page
                j = jnp.maximum(j, first)
            j = jnp.minimum(j, _last_valid_slot(lens[i], page))
            return (pt[i * pmax + j], 0, 0, 0)

        return pl.BlockSpec((1, page, hkv, d), index_map)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i, s, pt, lens: (i, 0, 0)),
            *[page_spec(j) for j in range(ppb)],
            *[page_spec(j) for j in range(ppb)],
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda i, s, pt, lens: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _gqa_kernel, scale=scale, page=page, ppb=ppb, n_s=n_s, hkv=hkv,
        window=window,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        interpret=interpret,
    )(
        page_tables.reshape(-1).astype(jnp.int32),
        lengths.astype(jnp.int32),
        qg,
        *([k_pages] * ppb),
        *([v_pages] * ppb),
    )
    return out.reshape(b, hkv, g, d).reshape(b, h, d)


# ---------------------------------------------------------------------------
# Paged PREFILL attention: q-chunk x page-block flash loop over the page
# table. Replaces the serving path's _gather_pages full-KV materialization
# (VERDICT r2 item 3; reference:
# archive/ktransformers/operators/flashinfer_batch_prefill_wrapper.py).
# ---------------------------------------------------------------------------


def _mla_prefill_kernel(
    pt_ref,     # scalar prefetch: page tables flat [B * Pmax]
    lens_ref,   # scalar prefetch: [B] OLD cached length (chunk excluded)
    valid_ref,  # scalar prefetch: [B] valid new tokens in this chunk
    qn_ref,     # (1, bq, R) flattened (head, pos) query rows
    qp_ref,     # (1, bq, Dr)
    *page_refs,  # ppb x ckv (1, page, R), ppb x kpe (1, page, Dr),
    # o_ref (1, bq, R), scratches m/l/acc
    scale: float,
    page: int,
    ppb: int,
    n_s: int,
    s_chunk: int,  # S: query positions per head (static)
):
    o_ref = page_refs[2 * ppb]
    m_sc, l_sc, acc_sc = page_refs[2 * ppb + 1 :]
    ckv_refs = page_refs[:ppb]
    kpe_refs = page_refs[ppb : 2 * ppb]

    b = pl.program_id(0)
    qb = pl.program_id(1)
    s = pl.program_id(2)
    length = lens_ref[b] + valid_ref[b]  # total live kv incl. this chunk

    @pl.when(s == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    @pl.when(s * ppb * page < length)
    def _():
        qn = qn_ref[0].astype(jnp.float32)  # [bq, R]
        qp = qp_ref[0].astype(jnp.float32)  # [bq, Dr]
        ckv = jnp.concatenate(
            [r[0] for r in ckv_refs], axis=0
        ).astype(jnp.float32)  # [ppb*page, R]
        kpe = jnp.concatenate(
            [r[0] for r in kpe_refs], axis=0
        ).astype(jnp.float32)
        base = s * ppb * page
        row_pos = base + jax.lax.broadcasted_iota(
            jnp.int32, (ckv.shape[0], 1), 0
        )
        row_ok = row_pos < length
        ckv = jnp.where(row_ok, ckv, 0.0)
        kpe = jnp.where(row_ok, kpe, 0.0)
        scores = (
            jax.lax.dot_general(
                qn, ckv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                qp, kpe, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ) * scale  # [bq, kvblk]
        # causal mask: query row i is (head, qs) with qs = (qb*bq + i) % S;
        # its absolute position is lens[b] + qs
        bq = scores.shape[0]
        qs = jnp.mod(
            qb * bq + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0),
            s_chunk,
        )
        qpos = lens_ref[b] + qs
        kpos = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        ok = (kpos <= qpos) & (kpos < length)
        scores = jnp.where(ok, scores, NEG_INF)

        m_prev = m_sc[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_sc[:, :1] = l_sc[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_sc[:] = acc_sc[:] * corr + jnp.dot(
            p, ckv, preferred_element_type=jnp.float32
        )
        m_sc[:, :1] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[0] = (
            acc_sc[:] / jnp.maximum(l_sc[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "block_q")
)
def mla_paged_prefill(
    q_nope_eff: jnp.ndarray,  # [B, H, S, R] absorbed queries
    q_pe: jnp.ndarray,        # [B, H, S, Dr]
    ckv_pages: jnp.ndarray,   # [P, page, R] — chunk kv ALREADY written
    kpe_pages: jnp.ndarray,   # [P, page, Dr]
    page_tables: jnp.ndarray,  # [B, Pmax] int32
    lengths: jnp.ndarray,     # [B] OLD cached length (this chunk excluded)
    valid: jnp.ndarray,       # [B] valid new tokens in this chunk (<= S)
    scale: float,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Chunked-prefill attention straight off the page pool: queries are
    flattened (head, pos) rows; each grid step DMA-fetches the next page
    block via the scalar-prefetched table and runs one flash update. No
    contiguous KV copy is ever materialized (the r2 serving prefill
    gathered the FULL padded KV per layer per chunk). Returns [B, H, S, R].
    """
    b, h, s_chunk, r = q_nope_eff.shape
    dr = q_pe.shape[-1]
    page = ckv_pages.shape[1]
    pmax = page_tables.shape[1]
    ppb = max(1, min(128 // page, pmax))
    while pmax % ppb:
        ppb -= 1
    n_s = pmax // ppb

    rows = h * s_chunk
    bq = min(block_q, rows)
    while rows % bq:
        bq //= 2
    n_q = rows // bq
    q2n = q_nope_eff.reshape(b, rows, r)
    q2p = q_pe.reshape(b, rows, dr)

    def page_spec(last_dim, slot):
        def index_map(i, qb, s, pt, lens, valid):
            total = lens[i] + valid[i]
            j = jnp.minimum(s * ppb + slot, _last_valid_slot(total, page))
            return (pt[i * pmax + j], 0, 0)

        return pl.BlockSpec((1, page, last_dim), index_map)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, n_q, n_s),
        in_specs=[
            pl.BlockSpec((1, bq, r), lambda i, qb, s, pt, L, V: (i, qb, 0)),
            pl.BlockSpec((1, bq, dr), lambda i, qb, s, pt, L, V: (i, qb, 0)),
            *[page_spec(r, j) for j in range(ppb)],
            *[page_spec(dr, j) for j in range(ppb)],
        ],
        out_specs=pl.BlockSpec(
            (1, bq, r), lambda i, qb, s, pt, L, V: (i, qb, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, r), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _mla_prefill_kernel, scale=scale, page=page, ppb=ppb, n_s=n_s,
        s_chunk=s_chunk,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, r), q_nope_eff.dtype),
        interpret=interpret,
    )(
        page_tables.reshape(-1).astype(jnp.int32),
        lengths.astype(jnp.int32),
        valid.astype(jnp.int32),
        q2n,
        q2p,
        *([ckv_pages] * ppb),
        *([kpe_pages] * ppb),
    )
    return out.reshape(b, h, s_chunk, r)


def _gqa_prefill_kernel(
    pt_ref, lens_ref, valid_ref,
    q_ref,  # (1, bq, D) rows flattened (kv-head, group-head, pos)
    *page_refs,  # ppb x k (1, page, Hkv, D), ppb x v, o_ref, scratches
    scale: float,
    page: int,
    ppb: int,
    n_s: int,
    s_chunk: int,
    g_rows: int,  # G * S rows per kv head
    hkv: int,
    window: int,
):
    o_ref = page_refs[2 * ppb]
    m_sc, l_sc, acc_sc = page_refs[2 * ppb + 1 :]
    k_refs = page_refs[:ppb]
    v_refs = page_refs[ppb : 2 * ppb]

    b = pl.program_id(0)
    qb = pl.program_id(1)
    s = pl.program_id(2)
    length = lens_ref[b] + valid_ref[b]

    @pl.when(s == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    @pl.when(s * ppb * page < length)
    def _():
        k = jnp.concatenate(
            [r[0] for r in k_refs], axis=0
        ).astype(jnp.float32)  # [kvblk, Hkv, D]
        v = jnp.concatenate(
            [r[0] for r in v_refs], axis=0
        ).astype(jnp.float32)
        base = s * ppb * page
        row_pos = base + jax.lax.broadcasted_iota(
            jnp.int32, (k.shape[0], 1, 1), 0
        )
        k = jnp.where(row_pos < length, k, 0.0)
        v = jnp.where(row_pos < length, v, 0.0)
        bq = q_ref.shape[1]
        # this q block belongs to ONE kv head (bq divides g_rows)
        kh_idx = (qb * bq) // g_rows
        q = q_ref[0].astype(jnp.float32)  # [bq, D]
        for kh in range(hkv):
            @pl.when(kh_idx == kh)
            def _(kh=kh):
                scores = (
                    jax.lax.dot_general(
                        q, k[:, kh], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * scale
                )  # [bq, kvblk]
                qs = jnp.mod(
                    qb * bq
                    + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0),
                    s_chunk,
                )
                qpos = lens_ref[b] + qs
                kpos = base + jax.lax.broadcasted_iota(
                    jnp.int32, scores.shape, 1
                )
                ok = (kpos <= qpos) & (kpos < length)
                if window:
                    ok = ok & (kpos > qpos - window)
                sc = jnp.where(ok, scores, NEG_INF)

                m_prev = m_sc[:, :1]
                m_new = jnp.maximum(
                    m_prev, jnp.max(sc, axis=-1, keepdims=True)
                )
                p = jnp.exp(sc - m_new)
                corr = jnp.exp(m_prev - m_new)
                l_sc[:, :1] = l_sc[:, :1] * corr + jnp.sum(
                    p, axis=-1, keepdims=True
                )
                acc_sc[:] = acc_sc[:] * corr + jnp.dot(
                    p, v[:, kh], preferred_element_type=jnp.float32
                )
                m_sc[:, :1] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[0] = (
            acc_sc[:] / jnp.maximum(l_sc[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "block_q", "window")
)
def gqa_paged_prefill(
    q: jnp.ndarray,        # [B, H, S, D] (post-rope)
    k_pages: jnp.ndarray,  # [P, page, Hkv, D] — chunk kv ALREADY written
    v_pages: jnp.ndarray,
    page_tables: jnp.ndarray,  # [B, Pmax]
    lengths: jnp.ndarray,  # [B] OLD cached length
    valid: jnp.ndarray,    # [B] valid new tokens in this chunk
    scale: float,
    window: int = 0,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """GQA chunked-prefill attention off the page pool. Returns
    [B, H, S, D]. Query rows are flattened (kv-head, group, pos) and each
    q block maps to exactly one kv head (block_q clamped to divide G*S)."""
    b, h, s_chunk, d = q.shape
    page, hkv = k_pages.shape[1], k_pages.shape[2]
    g = h // hkv
    pmax = page_tables.shape[1]
    ppb = max(1, min(128 // page, pmax))
    while pmax % ppb:
        ppb -= 1
    n_s = pmax // ppb

    g_rows = g * s_chunk
    bq = min(block_q, g_rows)
    while g_rows % bq:
        bq //= 2
    rows = h * s_chunk
    n_q = rows // bq
    # kv-head-major flatten: rows [kh, g, s]
    q2 = q.reshape(b, hkv, g, s_chunk, d).reshape(b, rows, d)

    def page_spec(slot):
        def index_map(i, qb, s, pt, lens, valid):
            total = lens[i] + valid[i]
            j = jnp.minimum(s * ppb + slot, _last_valid_slot(total, page))
            return (pt[i * pmax + j], 0, 0, 0)

        return pl.BlockSpec((1, page, hkv, d), index_map)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, n_q, n_s),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, qb, s, pt, L, V: (i, qb, 0)),
            *[page_spec(j) for j in range(ppb)],
            *[page_spec(j) for j in range(ppb)],
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, qb, s, pt, L, V: (i, qb, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _gqa_prefill_kernel, scale=scale, page=page, ppb=ppb, n_s=n_s,
        s_chunk=s_chunk, g_rows=g_rows, hkv=hkv, window=window,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, d), q.dtype),
        interpret=interpret,
    )(
        page_tables.reshape(-1).astype(jnp.int32),
        lengths.astype(jnp.int32),
        valid.astype(jnp.int32),
        q2,
        *([k_pages] * ppb),
        *([v_pages] * ppb),
    )
    return out.reshape(b, hkv, g, s_chunk, d).reshape(b, h, s_chunk, d)
