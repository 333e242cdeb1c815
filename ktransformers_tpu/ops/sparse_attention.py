"""Quest-style sparse decode attention over the page pool.

The long-context mechanism the reference builds around block summaries
(anchors + top-k block retrieval: kt-kernel/operators/kvcache/kvcache.h:
52-99, archive/ktransformers/operators/dynamic_attention.py:30,
doc/en/long_context_introduction.md): each KV page keeps the elementwise
min/max of its keys; at decode an upper bound on any key's score inside
the page is sum_d max(q_d*min_d, q_d*max_d), the pages with the top-k
bounds are attended, the rest skipped. Decode attention cost becomes
O(budget * page) instead of O(context) while the softmax numerator of
skipped pages is provably <= their bound.

TPU shape: selection and the pruned attention are plain XLA (gathers +
masked softmax over [B, budget*page]); the budget is static so the whole
thing jits with fixed shapes. The last page (the one holding the current
position) is always force-selected so the newest tokens are never
dropped.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30


def update_page_summaries(smin, smax, new_k, pid):
    """Scatter elementwise min/max of new keys into their pages.
    new_k [B, S, Dsum...] f32-castable; pid [B, S] page ids."""
    flat = new_k.reshape(-1, *new_k.shape[2:]).astype(jnp.float32)
    idx = pid.reshape(-1)
    return smin.at[idx].min(flat), smax.at[idx].max(flat)


def sparse_mla_decode(
    q_abs,  # [B, H, R] absorbed latent queries (f32-castable)
    q_pe,   # [B, H, Dr]
    buf_a,  # [P, page, R] ckv pages
    buf_b,  # [P, page, Dr] k_pe pages
    smin, smax,  # [P, R+Dr]
    page_tables,  # [B, Pmax]
    lengths,  # [B] context length INCLUDING the current token
    page_size: int,
    budget: int,
    scale: float,
):
    """Returns [B, H, R] latent attention outputs (value = ckv)."""
    import jax

    b, h, r = q_abs.shape
    q_cat = jnp.concatenate([q_abs, q_pe], -1)
    sel = _select(q_cat, smin, smax, page_tables, lengths, page_size, budget)
    pid = jnp.take_along_axis(page_tables, sel, 1)  # [B, budget]
    ckv = buf_a[pid].astype(jnp.float32)  # [B, S, page, R]
    kpe = buf_b[pid].astype(jnp.float32)
    scores = jnp.einsum("bhr,bspr->bhsp", q_abs.astype(jnp.float32), ckv)
    scores = scores + jnp.einsum(
        "bhd,bspd->bhsp", q_pe.astype(jnp.float32), kpe
    )
    scores = scores * scale
    pos = sel[:, :, None] * page_size + jnp.arange(page_size)[None, None, :]
    live = pos < lengths[:, None, None]  # [B, S, page]
    scores = jnp.where(live[:, None], scores, NEG_INF)
    attn = jax.nn.softmax(
        scores.reshape(b, h, -1), axis=-1
    ).reshape(scores.shape)
    out = jnp.einsum("bhsp,bspr->bhr", attn, ckv)
    return out


def sparse_gqa_decode(
    q,      # [B, H, D]
    buf_k,  # [P, page, Hkv, D]
    buf_v,  # [P, page, Hkv, D]
    smin, smax,  # [P, Hkv, D]
    page_tables,
    lengths,
    page_size: int,
    budget: int,
    scale: float,
):
    """Returns [B, H, D]."""
    import jax

    b, h, d = q.shape
    hkv = buf_k.shape[2]
    g = h // hkv
    qg = q.reshape(b, hkv, g, d)
    sel = _select_gqa(
        qg, smin, smax, page_tables, lengths, page_size, budget
    )
    pid = jnp.take_along_axis(page_tables, sel, 1)
    k = buf_k[pid].astype(jnp.float32)  # [B, S, page, Hkv, D]
    v = buf_v[pid].astype(jnp.float32)
    scores = jnp.einsum(
        "bkgd,bspkd->bkgsp", qg.astype(jnp.float32), k
    ) * scale  # [B, Hkv, G, S, page]
    pos = sel[:, :, None] * page_size + jnp.arange(page_size)[None, None, :]
    live = pos < lengths[:, None, None]
    scores = jnp.where(live[:, None, None], scores, NEG_INF)
    attn = jax.nn.softmax(
        scores.reshape(b, hkv, g, -1), axis=-1
    ).reshape(scores.shape)
    out = jnp.einsum("bkgsp,bspkd->bkgd", attn, v)
    return out.reshape(b, h, d)


def _bound(qf, lo, hi):
    """sum_d max(q*lo, q*hi) upper bound. qf [B, H, Dsum], lo/hi
    [B, Pmax, Dsum] -> [B, Pmax] (max over heads)."""
    contrib = jnp.maximum(
        qf[:, :, None, :] * lo[:, None, :, :],
        qf[:, :, None, :] * hi[:, None, :, :],
    )
    return contrib.sum(-1).max(1)


def _finalize(bound, page_tables, lengths, page_size, budget):
    import jax

    pmax = page_tables.shape[1]
    base = jnp.arange(pmax)[None, :] * page_size
    bound = jnp.where(base < lengths[:, None], bound, NEG_INF)
    last_slot = jnp.maximum(lengths - 1, 0) // page_size
    bound = bound + jnp.where(
        jnp.arange(pmax)[None, :] == last_slot[:, None], 1e30, 0.0
    )
    _, sel = jax.lax.top_k(bound, budget)
    return sel


def _select(q_cat, smin, smax, page_tables, lengths, page_size, budget):
    lo = smin[page_tables].astype(jnp.float32)
    hi = smax[page_tables].astype(jnp.float32)
    bound = _bound(q_cat.astype(jnp.float32), lo, hi)
    return _finalize(bound, page_tables, lengths, page_size, budget)


def _select_gqa(qg, smin, smax, page_tables, lengths, page_size, budget):
    """qg [B, Hkv, G, D]; smin/smax [P, Hkv, D]."""
    lo = smin[page_tables].astype(jnp.float32)  # [B, Pmax, Hkv, D]
    hi = smax[page_tables].astype(jnp.float32)
    qf = qg.astype(jnp.float32)
    contrib = jnp.maximum(
        qf[:, None, :, :, :] * lo[:, :, :, None, :],
        qf[:, None, :, :, :] * hi[:, :, :, None, :],
    )  # [B, Pmax, Hkv, G, D]
    bound = contrib.sum(-1).max((2, 3))  # [B, Pmax]
    return _finalize(bound, page_tables, lengths, page_size, budget)
