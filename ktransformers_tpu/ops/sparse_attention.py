"""Sparse decode attention over the page pool: anchor summaries + top-K
page retrieval.

The long-context mechanism the reference builds around block summaries
(kt-kernel/operators/kvcache/kvcache.h:52-99 `AnchorType {FIXED, DYNAMIC,
QUEST, BLOCK_MAX, BLOCK_MEAN}` x `RetrievalType {LAYER, KVHEAD, QHEAD}`,
archive/ktransformers/operators/dynamic_attention.py:30,
doc/en/long_context_introduction.md): each KV page keeps a small summary;
at decode, pages are scored against the query, the top-`budget` pages are
attended and the rest skipped. Decode attention cost becomes
O(budget * page) instead of O(context).

Anchor kinds (per page, per layer):
- "quest":      elementwise (min, max) of the page's keys; score is the
                provable upper bound sum_d max(q_d*min_d, q_d*max_d) — no
                key's true score inside the page can exceed it.
- "block_max":  score = q . (elementwise max) — one plane, cheaper, bound
                property lost (reference BLOCK_MAX).
- "block_mean": score = q . mean(keys) (reference BLOCK_MEAN); mean is
                ssum / live_count with live_count derived from lengths.
- "fixed":      score = q . first_key_of_page (reference FIXED anchors:
                representative token at a fixed in-block position).
- "dynamic":    score = q . anchor where the anchor key is CHOSEN by
                observed attention (set_dynamic_anchors, fed by the
                SnapKV-style observation pass below) — reference DYNAMIC.

Retrieval granularity:
- "layer":  one page set per sequence (scores maxed over heads) — the
            cheapest; default.
- "kvhead": (GQA) each kv head retrieves its own top-K pages.
- "qhead":  each query head retrieves its own top-K pages (MLA: the latent
            is shared, so this is the per-head variant of layer scoring).

SnapKV-style question-conditioned preselection (snapkv_page_scores):
attention mass of the last-W "observation window" queries (the question)
against the full prefix, accumulated per page — used to (a) preselect a
page subset for decode and (b) derive dynamic anchors.

TPU shape: selection and the pruned attention are plain XLA (gathers +
masked softmax); budgets are static so everything jits with fixed shapes.
The page holding the current position is always force-selected so the
newest tokens are never dropped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30

ANCHOR_KINDS = ("quest", "block_max", "block_mean", "fixed", "dynamic")
RETRIEVAL_KINDS = ("layer", "kvhead", "qhead")


def update_page_summaries(smin, smax, new_k, pid):
    """Scatter elementwise min/max of new keys into their pages (quest /
    block_max planes; the serving forward's per-step hook).
    new_k [B, S, Dsum...]; pid [B, S] page ids. Returns (smin, smax)."""
    flat = new_k.reshape(-1, *new_k.shape[2:]).astype(jnp.float32)
    idx = pid.reshape(-1)
    return smin.at[idx].min(flat), smax.at[idx].max(flat)


def update_page_summaries_cfg(
    planes: dict, new_k, pid, pos, page_size: int
) -> dict:
    """Dict-based summary update: planes maps name -> array or None for
    names in {smin, smax, ssum, sfix}. pos [B, S] absolute positions."""
    flat = new_k.reshape(-1, *new_k.shape[2:]).astype(jnp.float32)
    idx = pid.reshape(-1)
    out = dict(planes)
    if planes.get("smin") is not None:
        out["smin"] = planes["smin"].at[idx].min(flat)
    if planes.get("smax") is not None:
        out["smax"] = planes["smax"].at[idx].max(flat)
    if planes.get("ssum") is not None:
        out["ssum"] = planes["ssum"].at[idx].add(flat)
    if planes.get("sfix") is not None:
        first = (pos.reshape(-1) % page_size) == 0
        # Non-first rows must not write at all. Redirect them to an
        # out-of-bounds index and scatter with mode="drop": deterministic
        # regardless of which pages are live (the old page-0 redirect made
        # duplicate-index writes nondeterministic if page 0 was ever a
        # live page — only the serving engine's PageAllocator(reserved=1)
        # guaranteed it wasn't).
        sfix = planes["sfix"]
        n_pages = sfix.shape[0]
        sel_idx = jnp.where(first, idx, n_pages)
        out["sfix"] = sfix.at[sel_idx].set(flat, mode="drop")
    return out


def set_dynamic_anchors(planes: dict, buf_k, page_tables, page_scores_tok,
                        lengths, page_size: int) -> dict:
    """Derive DYNAMIC anchors: for each page, the key of the token with the
    highest observed score (from snapkv_page_scores' per-token output).

    buf_k [P, page, D...]; page_tables [B, Pmax]; page_scores_tok
    [B, Pmax, page] per-token observation mass; writes planes['sdyn'].
    """
    b, pmax, page = page_scores_tok.shape
    best = jnp.argmax(page_scores_tok, axis=-1)  # [B, Pmax]
    pid = page_tables.reshape(-1)
    keys = buf_k[pid, best.reshape(-1)].astype(jnp.float32)  # [B*Pmax, D...]
    base = jnp.arange(pmax)[None, :] * page_size
    live = (base < lengths[:, None]).reshape(-1)
    sdyn = planes["sdyn"]
    # dead rows scatter out-of-bounds with mode="drop" (deterministic; see
    # update_page_summaries_cfg)
    sel_idx = jnp.where(live, pid, sdyn.shape[0])
    out = dict(planes)
    out["sdyn"] = sdyn.at[sel_idx].set(keys, mode="drop")
    return out


def snapkv_page_scores(q_obs, buf_a, buf_b, page_tables, lengths,
                       page_size: int, scale: float, is_mla: bool = True):
    """Question-conditioned observation pass (SnapKV-style; reference:
    preselect_block + importance in dynamic_attention.py): softmax
    attention mass of the observation-window queries against the cached
    prefix, accumulated per (page, token).

    q_obs: MLA: [B, W, H, Dsum] absorbed+rope query concat; GQA:
    [B, W, H, D]. Returns (page_mass [B, Pmax], token_mass
    [B, Pmax, page]).
    """
    b, w, h = q_obs.shape[:3]
    k_a = buf_a[page_tables].astype(jnp.float32)  # [B, Pmax, page, ...]
    pmax, page = k_a.shape[1], k_a.shape[2]
    if is_mla:
        k_b = buf_b[page_tables].astype(jnp.float32)
        keys = jnp.concatenate([k_a, k_b], -1)  # [B, Pmax, page, Dsum]
        scores = jnp.einsum(
            "bwhd,bspd->bwhsp", q_obs.astype(jnp.float32), keys
        )
    else:
        hkv = k_a.shape[3]
        g = h // hkv
        qg = q_obs.reshape(b, w, hkv, g, -1).astype(jnp.float32)
        scores = jnp.einsum("bwkgd,bspkd->bwkgsp", qg, k_a).reshape(
            b, w, h, pmax, page
        )
    scores = scores * scale
    pos = jnp.arange(pmax * page).reshape(pmax, page)
    live = pos[None] < lengths[:, None, None]
    scores = jnp.where(live[:, None, None], scores, NEG_INF)
    # causal mask WITHIN the observation window: query w sits at absolute
    # position lengths - W + w; keys after it (later window tokens are in
    # the cached prefix too) must not contribute to its softmax, or page
    # mass is biased toward recent pages vs SnapKV's per-query causal
    # observation (ADVICE r4).
    qpos = lengths[:, None] - w + jnp.arange(w)[None, :]  # [B, W]
    causal = pos[None, None] <= qpos[:, :, None, None]  # [B, W, Pmax, page]
    scores = jnp.where(causal[:, :, None], scores, NEG_INF)
    attn = jax.nn.softmax(scores.reshape(b, w, h, -1), axis=-1).reshape(
        scores.shape
    )
    token_mass = attn.sum((1, 2))  # [B, Pmax, page]
    return token_mass.sum(-1), token_mass


def preselect_pages(page_mass, lengths, page_size: int, keep: int,
                    recent: int = 2):
    """Top-`keep` pages by observation mass, with the most recent `recent`
    pages force-kept. Returns a boolean keep-mask [B, Pmax] for decode
    selection (selection then runs over kept pages only)."""
    b, pmax = page_mass.shape
    last_slot = jnp.maximum(lengths - 1, 0) // page_size
    slot = jnp.arange(pmax)[None]
    recent_mask = (slot > last_slot[:, None] - recent) & (
        slot <= last_slot[:, None]
    )
    boosted = jnp.where(recent_mask, jnp.inf, page_mass)
    _, sel = jax.lax.top_k(boosted, min(keep, pmax))
    mask = jnp.zeros((b, pmax), bool).at[
        jnp.arange(b)[:, None], sel
    ].set(True)
    return mask


# ---------------------------------------------------------------------------
# selection
# ---------------------------------------------------------------------------


def _anchor_scores(qf, planes, page_tables, anchor: str, lengths=None,
                   page_size: int = 64):
    """Per-page scores [B, Heads, Pmax] for dot-product anchors, or the
    quest bound. qf [B, H, Dsum] f32 (MLA) — GQA callers reshape to
    [B, Hkv*G, ...] themselves via the *_gqa variants."""
    if anchor == "quest":
        lo = planes["smin"][page_tables].astype(jnp.float32)
        hi = planes["smax"][page_tables].astype(jnp.float32)
        contrib = jnp.maximum(
            qf[:, :, None, :] * lo[:, None, :, :],
            qf[:, :, None, :] * hi[:, None, :, :],
        )
        return contrib.sum(-1)
    if anchor == "block_max":
        a = planes["smax"][page_tables].astype(jnp.float32)
    elif anchor == "block_mean":
        a = planes["ssum"][page_tables].astype(jnp.float32)
        base = jnp.arange(page_tables.shape[1])[None] * page_size
        cnt = jnp.clip(lengths[:, None] - base, 1, page_size).astype(
            jnp.float32
        )
        a = a / cnt[..., None]
    elif anchor == "fixed":
        a = planes["sfix"][page_tables].astype(jnp.float32)
    elif anchor == "dynamic":
        a = planes["sdyn"][page_tables].astype(jnp.float32)
    else:
        raise ValueError(f"anchor {anchor}")
    return jnp.einsum("bhd,bpd->bhp", qf, a)


def _finalize(bound, page_tables, lengths, page_size, budget,
              keep_mask=None):
    """bound [B, Pmax] -> top-`budget` page-table slots [B, budget]."""
    pmax = page_tables.shape[1]
    base = jnp.arange(pmax)[None, :] * page_size
    bound = jnp.where(base < lengths[:, None], bound, NEG_INF)
    if keep_mask is not None:
        bound = jnp.where(keep_mask, bound, NEG_INF)
    last_slot = jnp.maximum(lengths - 1, 0) // page_size
    bound = bound + jnp.where(
        jnp.arange(pmax)[None, :] == last_slot[:, None], 1e30, 0.0
    )
    _, sel = jax.lax.top_k(bound, budget)
    return sel


def select_pages(q_cat, planes, page_tables, lengths, page_size, budget,
                 anchor: str = "quest", retrieval: str = "layer",
                 keep_mask=None):
    """MLA page selection. q_cat [B, H, Dsum].

    retrieval "layer": scores maxed over heads -> sel [B, budget].
    retrieval "qhead": per-head selection -> sel [B, H, budget]."""
    scores = _anchor_scores(
        q_cat.astype(jnp.float32), planes, page_tables, anchor,
        lengths, page_size,
    )  # [B, H, Pmax]
    if retrieval == "layer":
        return _finalize(
            scores.max(1), page_tables, lengths, page_size, budget,
            keep_mask,
        )
    if retrieval == "qhead":
        b, h, pmax = scores.shape
        flat = _finalize(
            scores.reshape(b * h, pmax),
            jnp.repeat(page_tables, h, 0),
            jnp.repeat(lengths, h),
            page_size,
            budget,
            None if keep_mask is None else jnp.repeat(keep_mask, h, 0),
        )
        return flat.reshape(b, h, budget)
    raise ValueError(f"retrieval {retrieval} for MLA")


# ---------------------------------------------------------------------------
# pruned attention
# ---------------------------------------------------------------------------


def sparse_mla_decode(
    q_abs,  # [B, H, R] absorbed latent queries (f32-castable)
    q_pe,   # [B, H, Dr]
    buf_a,  # [P, page, R] ckv pages
    buf_b,  # [P, page, Dr] k_pe pages
    smin, smax,  # [P, R+Dr] (quest planes; pass via `planes` for others)
    page_tables,  # [B, Pmax]
    lengths,  # [B] context length INCLUDING the current token
    page_size: int,
    budget: int,
    scale: float,
    anchor: str = "quest",
    retrieval: str = "layer",
    planes: dict | None = None,
    keep_mask=None,  # [B, Pmax] SnapKV preselection (preselect_pages)
):
    """Returns [B, H, R] latent attention outputs (value = ckv)."""
    b, h, r = q_abs.shape
    if planes is None:
        planes = {"smin": smin, "smax": smax}
    q_cat = jnp.concatenate([q_abs, q_pe], -1)
    sel = select_pages(
        q_cat, planes, page_tables, lengths, page_size, budget,
        anchor, retrieval, keep_mask,
    )
    if retrieval == "layer":
        pid = jnp.take_along_axis(page_tables, sel, 1)  # [B, budget]
        ckv = buf_a[pid].astype(jnp.float32)  # [B, S, page, R]
        kpe = buf_b[pid].astype(jnp.float32)
        scores = jnp.einsum(
            "bhr,bspr->bhsp", q_abs.astype(jnp.float32), ckv
        )
        scores = scores + jnp.einsum(
            "bhd,bspd->bhsp", q_pe.astype(jnp.float32), kpe
        )
        scores = scores * scale
        pos = (
            sel[:, :, None] * page_size
            + jnp.arange(page_size)[None, None, :]
        )
        live = pos < lengths[:, None, None]  # [B, S, page]
        scores = jnp.where(live[:, None], scores, NEG_INF)
        attn = jax.nn.softmax(
            scores.reshape(b, h, -1), axis=-1
        ).reshape(scores.shape)
        return jnp.einsum("bhsp,bspr->bhr", attn, ckv)
    # qhead: per-head page sets
    pid = jnp.take_along_axis(
        page_tables[:, None].repeat(h, 1), sel, 2
    )  # [B, H, budget]
    ckv = buf_a[pid].astype(jnp.float32)  # [B, H, S, page, R]
    kpe = buf_b[pid].astype(jnp.float32)
    scores = (
        jnp.einsum("bhr,bhspr->bhsp", q_abs.astype(jnp.float32), ckv)
        + jnp.einsum("bhd,bhspd->bhsp", q_pe.astype(jnp.float32), kpe)
    ) * scale
    pos = sel[..., None] * page_size + jnp.arange(page_size)[None, None, None]
    live = pos < lengths[:, None, None, None]
    scores = jnp.where(live, scores, NEG_INF)
    attn = jax.nn.softmax(scores.reshape(b, h, -1), axis=-1).reshape(
        scores.shape
    )
    return jnp.einsum("bhsp,bhspr->bhr", attn, ckv)


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
    anchor: str = "quest",
    retrieval: str = "layer",
    planes: dict | None = None,
    keep_mask=None,
):
    """Returns [B, H, D]."""
    b, h, d = q.shape
    hkv = buf_k.shape[2]
    g = h // hkv
    qg = q.reshape(b, hkv, g, d).astype(jnp.float32)
    if planes is None:
        planes = {"smin": smin, "smax": smax}

    def head_scores():
        """[B, Hkv, G, Pmax] per-(kv,q)-head anchor scores."""
        if anchor == "quest":
            lo = planes["smin"][page_tables].astype(jnp.float32)
            hi = planes["smax"][page_tables].astype(jnp.float32)
            contrib = jnp.maximum(
                qg[:, None, :, :, :] * lo[:, :, :, None, :],
                qg[:, None, :, :, :] * hi[:, :, :, None, :],
            )  # [B, Pmax, Hkv, G, D]
            return contrib.sum(-1).transpose(0, 2, 3, 1)
        if anchor == "block_max":
            a = planes["smax"][page_tables].astype(jnp.float32)
        elif anchor == "block_mean":
            a = planes["ssum"][page_tables].astype(jnp.float32)
            base = jnp.arange(page_tables.shape[1])[None] * page_size
            cnt = jnp.clip(
                lengths[:, None] - base, 1, page_size
            ).astype(jnp.float32)
            a = a / cnt[..., None, None]
        elif anchor == "fixed":
            a = planes["sfix"][page_tables].astype(jnp.float32)
        elif anchor == "dynamic":
            a = planes["sdyn"][page_tables].astype(jnp.float32)
        else:
            raise ValueError(anchor)
        # a: [B, Pmax, Hkv, D]
        return jnp.einsum("bkgd,bpkd->bkgp", qg, a)

    scores_h = head_scores()  # [B, Hkv, G, Pmax]
    if retrieval == "layer":
        sel = _finalize(
            scores_h.max((1, 2)), page_tables, lengths, page_size, budget,
            keep_mask,
        )
        pid = jnp.take_along_axis(page_tables, sel, 1)
        k = buf_k[pid].astype(jnp.float32)  # [B, S, page, Hkv, D]
        v = buf_v[pid].astype(jnp.float32)
        scores = jnp.einsum("bkgd,bspkd->bkgsp", qg, k) * scale
        pos = (
            sel[:, :, None] * page_size
            + jnp.arange(page_size)[None, None, :]
        )
        live = pos < lengths[:, None, None]
        scores = jnp.where(live[:, None, None], scores, NEG_INF)
        attn = jax.nn.softmax(
            scores.reshape(b, hkv, g, -1), axis=-1
        ).reshape(scores.shape)
        out = jnp.einsum("bkgsp,bspkd->bkgd", attn, v)
        return out.reshape(b, h, d)
    if retrieval == "kvhead":
        per_kv = scores_h.max(2)  # [B, Hkv, Pmax]
        b_, _, pmax = per_kv.shape
        sel = _finalize(
            per_kv.reshape(b * hkv, pmax),
            jnp.repeat(page_tables, hkv, 0),
            jnp.repeat(lengths, hkv),
            page_size,
            budget,
            None if keep_mask is None else jnp.repeat(keep_mask, hkv, 0),
        ).reshape(b, hkv, budget)
        pid = jnp.take_along_axis(
            page_tables[:, None].repeat(hkv, 1), sel, 2
        )  # [B, Hkv, budget]
        bk = jnp.arange(b)[:, None, None]
        hk = jnp.arange(hkv)[None, :, None]
        k = buf_k[pid, :, hk].astype(jnp.float32)  # [B, Hkv, S, page, D]
        v = buf_v[pid, :, hk].astype(jnp.float32)
        scores = jnp.einsum("bkgd,bkspd->bkgsp", qg, k) * scale
        pos = (
            sel[..., None] * page_size
            + jnp.arange(page_size)[None, None, None]
        )
        live = pos < lengths[:, None, None, None]  # [B, Hkv, S, page]
        scores = jnp.where(live[:, None].transpose(0, 2, 1, 3, 4), scores,
                           NEG_INF)
        attn = jax.nn.softmax(
            scores.reshape(b, hkv, g, -1), axis=-1
        ).reshape(scores.shape)
        out = jnp.einsum("bkgsp,bkspd->bkgd", attn, v)
        return out.reshape(b, h, d)
    raise ValueError(f"retrieval {retrieval} for GQA")
