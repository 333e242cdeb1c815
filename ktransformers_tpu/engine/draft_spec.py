"""Separate-draft-model speculative decoding (VERDICT r4 missing 5).

The reference exposes a draft-model hook next to its MTP path
(archive/ktransformers/server/args.py:31-32 `--speculative_model`,
util/utils.py:397 speculative generate): a small model proposes k
tokens, the target verifies them in one (k+1)-token step. This is the
same verify rule as engine/mtp.mtp_generate — the drafter is just a
full second `Generator` (own weights, own KV cache) instead of the
one-extra-layer MTP head, so ANY registry model with the same tokenizer
can draft for a larger one.

Greedy-exact: the emitted stream equals the target model's own greedy
continuation regardless of draft quality (bad drafts only cost speed).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.engine.speculative import SpecStats, _set_len


def draft_generate(
    target: Generator,
    draft: Generator,
    prompt_ids: list[int],
    cfg: GenerateConfig = GenerateConfig(),
    k: int = 3,
) -> tuple[list[int], SpecStats]:
    """Greedy speculative generation with a separate draft model.

    Per round: catch the draft cache up to the committed stream, draft k
    greedy tokens (k single-token draft steps), verify with ONE
    (k+1)-token target step, accept the matching prefix + the target's
    bonus token (mtp_generate's rule)."""
    assert cfg.sampling.temperature <= 0, "speculative path is greedy-only"
    assert target.spec.vocab_size == draft.spec.vocab_size, (
        "draft and target must share a tokenizer/vocab"
    )

    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32))[None]
    P = len(prompt_ids)

    # target prompt prefill
    t_cache = target.new_cache()
    tl, t_cache = target._step(P)(prompt, t_cache)
    out = [int(jnp.argmax(tl[0, -1]))]
    t_frontier = P

    # draft prompt prefill
    d_cache = draft.new_cache()
    _, d_cache = draft._step(P)(prompt, d_cache)
    d_frontier = P

    stats = SpecStats()

    def finished():
        return len(out) >= cfg.max_new_tokens or (
            cfg.eos_token_id is not None and out[-1] == cfg.eos_token_id
        )

    while not finished():
        all_tokens = prompt_ids + out
        L = len(all_tokens)

        # catch-up + first draft: feed the committed tokens the draft
        # hasn't consumed (its cache holds a valid prefix after rollback)
        d_cache = _set_len(d_cache, d_frontier)
        catch = all_tokens[d_frontier:]
        dl, d_cache = draft._step(len(catch))(
            jnp.asarray([catch], jnp.int32), d_cache
        )
        drafted = [int(jnp.argmax(dl[0, -1]))]
        d_frontier = L
        while len(drafted) < k:
            dl, d_cache = draft._step(1)(
                jnp.asarray([[drafted[-1]]], jnp.int32), d_cache
            )
            drafted.append(int(jnp.argmax(dl[0, -1])))
            d_frontier += 1

        # verify: one target step over [unconsumed committed] + drafted
        t_cache = _set_len(t_cache, t_frontier)
        inp = jnp.asarray([all_tokens[t_frontier:] + drafted], jnp.int32)
        tl, t_cache = target._step(inp.shape[1])(inp, t_cache)
        greedy = np.asarray(jnp.argmax(tl[0], axis=-1))
        # greedy[-(k+1):] are the target's continuations of
        # [last committed, drafted[0..k-1]]
        g = greedy[-(k + 1):]

        accepted = 0
        for i in range(k):
            if drafted[i] == int(g[i]):
                accepted += 1
            else:
                break
        stats.rounds += 1
        stats.drafted += k
        stats.accepted += accepted

        for tok in drafted[:accepted] + [int(g[accepted])]:
            out.append(tok)
            if finished():
                break
        t_frontier += inp.shape[1] - k + accepted
        # draft cache holds KV for committed[:L] + drafted[:k-1]; the
        # first `accepted` drafted tokens are now committed, the rest are
        # stale — roll back to the last valid prefix
        d_frontier = min(d_frontier, L + accepted)

    return out[: cfg.max_new_tokens], stats
