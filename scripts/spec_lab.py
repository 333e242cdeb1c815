"""Speculation lab (r4): re-measure the MTP round structures with REAL
barriers (scalar readbacks — block_until_ready returns early on axon,
CLAUDE.md), deciding between:

  A. single-program round: catchup + k drafts + verify + accept in ONE jit
     (r3 claimed a ~220 ms/dispatch program-size cliff — measured with the
     broken barrier, so re-verify)
  B. two alternating programs (draft | verify): r3 measured ~177 ms/round
     re-upload cost
  C. plain decode step (baseline per-token cost)

Each measured as marginal cost over chained in-program/round reps where
possible, otherwise wall-per-round with a scalar readback per round.
"""

import dataclasses as dc
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.engine.mtp import (
        MTPDrafter,
        init_mtp_synthetic,
        mtp_layer_forward,
    )
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.model import forward
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    k = int(os.environ.get("SPEC_K", "2"))
    spec = spec_from_hf_config(dict(BASE, max_position_embeddings=2048))
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    # dense-layer head: matches the TRAINED head (scripts/train_mtp.py)
    # and keeps HBM headroom (the MoE-layer head + compile workspace
    # tipped the 16 GB chip over)
    mtp = init_mtp_synthetic(spec, quant="int4_g", dense_layer=True)
    jax.block_until_ready(mtp)
    params = gen.params  # Generator repacks with donate=True; the original
    # tree's buffers are freed (CLAUDE.md engine-init note)
    drafter = MTPDrafter(mtp, gen)
    rope, cdt = gen.rope_tables, gen.compute_dtype
    P = 32

    # --- C. baseline decode step (chained, hard readback) ---
    from ktransformers_tpu.engine.sampler import SamplingConfig

    cache = gen.new_cache()
    cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, P))
    decode = gen._decode_step(SamplingConfig())
    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1,), jnp.int32)
    tok, cache, key = decode(tok[:, None], cache, key)
    _ = int(np.asarray(tok)[0])
    import collections

    n = 64
    pending = collections.deque()
    t0 = time.perf_counter()
    for _ in range(n):
        tok, cache, key = decode(tok[:, None], cache, key)
        try:
            tok.copy_to_host_async()
        except Exception:
            pass
        pending.append(tok)
        if len(pending) > 8:
            _ = int(np.asarray(pending.popleft())[0])
    while pending:
        _ = int(np.asarray(pending.popleft())[0])
    base_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"C. decode step: {base_ms:.2f} ms/tok", flush=True)

    # --- A. single-program round ---
    @partial(jax.jit, donate_argnums=(2, 3))
    def round_single(params, mtp_p, t_cache, m_cache, bonus, h_bonus):
        """k chained drafts + (k+1)-token verify + accept, one program.
        Caches are rewound by the caller between rounds (fixed lengths
        for the lab; the real loop manages lengths on device)."""
        cur, h = bonus, h_bonus
        drafted = []
        for _ in range(k):
            dl, h, m_cache = mtp_layer_forward(
                mtp_p, params, spec, cur[:, None], h, m_cache, rope, cdt
            )
            cur = jnp.argmax(dl[:, -1], -1).astype(jnp.int32)
            drafted.append(cur)
        d = jnp.stack(drafted, 1)  # [1, k]
        inp = jnp.concatenate([bonus[:, None], d], 1)
        tl, t_cache, th = forward(
            params, spec, inp, t_cache, rope_tables=rope,
            compute_dtype=cdt, return_hidden=True,
        )
        greedy = jnp.argmax(tl, -1).astype(jnp.int32)
        match = (d == greedy[:, :k]).astype(jnp.int32)
        a = jnp.sum(jnp.cumprod(match, 1), 1)
        bonus_new = jnp.take_along_axis(greedy, a[:, None], 1)[:, 0]
        h_new = jnp.take_along_axis(th, a[:, None, None], 1)
        return bonus_new, h_new, a, t_cache, m_cache

    t_cache = gen.new_cache()
    t_cache = dc.replace(t_cache, lengths=jnp.full_like(t_cache.lengths, P))
    m_cache = drafter.new_cache()
    m_cache = dc.replace(m_cache, lengths=jnp.full_like(m_cache.lengths, P))
    bonus = jnp.zeros((1,), jnp.int32)
    h_b = jnp.zeros((1, 1, spec.hidden_size), jnp.bfloat16)
    t0 = time.perf_counter()
    bonus, h_b, a, t_cache, m_cache = round_single(
        params, mtp, t_cache, m_cache, bonus, h_b
    )
    _ = int(np.asarray(a)[0])
    print(f"A. single-round compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    n = 32
    pending = collections.deque()
    t0 = time.perf_counter()
    for _ in range(n):
        t_cache = dc.replace(
            t_cache, lengths=jnp.full_like(t_cache.lengths, P)
        )
        m_cache = dc.replace(
            m_cache, lengths=jnp.full_like(m_cache.lengths, P)
        )
        bonus, h_b, a, t_cache, m_cache = round_single(
            params, mtp, t_cache, m_cache, bonus, h_b
        )
        try:
            a.copy_to_host_async()
        except Exception:
            pass
        pending.append(a)
        if len(pending) > 4:
            _ = int(np.asarray(pending.popleft())[0])
    while pending:
        _ = int(np.asarray(pending.popleft())[0])
    single_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"A. single-program round: {single_ms:.2f} ms/round "
          f"(break-even acc {(single_ms/base_ms-1)/k:.2f}; "
          f"speedup@90% {(1+k*0.9)*base_ms/single_ms:.2f}x)", flush=True)

    # --- B. alternating draft/verify programs ---
    @partial(jax.jit, donate_argnums=(2,))
    def draft_only(params, mtp_p, m_cache, bonus, h_bonus):
        cur, h = bonus, h_bonus
        drafted = []
        for _ in range(k):
            dl, h, m_cache = mtp_layer_forward(
                mtp_p, params, spec, cur[:, None], h, m_cache, rope, cdt
            )
            cur = jnp.argmax(dl[:, -1], -1).astype(jnp.int32)
            drafted.append(cur)
        return jnp.stack(drafted, 1), h, m_cache

    @partial(jax.jit, donate_argnums=(1,))
    def verify_only(params, t_cache, bonus, d):
        inp = jnp.concatenate([bonus[:, None], d], 1)
        tl, t_cache, th = forward(
            params, spec, inp, t_cache, rope_tables=rope,
            compute_dtype=cdt, return_hidden=True,
        )
        greedy = jnp.argmax(tl, -1).astype(jnp.int32)
        match = (d == greedy[:, :k]).astype(jnp.int32)
        a = jnp.sum(jnp.cumprod(match, 1), 1)
        bonus_new = jnp.take_along_axis(greedy, a[:, None], 1)[:, 0]
        h_new = jnp.take_along_axis(th, a[:, None, None], 1)
        return bonus_new, h_new, a, t_cache

    d, h_b2, m_cache = draft_only(params, mtp, m_cache, bonus, h_b)
    bonus, h_b2, a, t_cache = verify_only(params, t_cache, bonus, d)
    _ = int(np.asarray(a)[0])
    n = 16
    pending = collections.deque()
    t0 = time.perf_counter()
    for _ in range(n):
        m_cache = dc.replace(
            m_cache, lengths=jnp.full_like(m_cache.lengths, P)
        )
        t_cache = dc.replace(
            t_cache, lengths=jnp.full_like(t_cache.lengths, P)
        )
        d, h_b2, m_cache = draft_only(params, mtp, m_cache, bonus, h_b2)
        bonus, h_b2, a, t_cache = verify_only(params, t_cache, bonus, d)
        try:
            a.copy_to_host_async()
        except Exception:
            pass
        pending.append(a)
        if len(pending) > 4:
            _ = int(np.asarray(pending.popleft())[0])
    while pending:
        _ = int(np.asarray(pending.popleft())[0])
    alt_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"B. alternating round: {alt_ms:.2f} ms/round", flush=True)


if __name__ == "__main__":
    main()
