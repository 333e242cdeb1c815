"""Speculative decoding with a draft model (greedy-exact).

Reference analog: the draft_model hooks in prefill_and_generate
(archive/ktransformers/util/utils.py:397, --draft_model_path server args)
and the MTP/EAGLE path via the sglang fork (doc/en/DeepSeek-V4-Flash.md:
157-165, ~1.2x decode). Greedy speculative decoding is *exact*: the output
equals the target model's greedy output for any draft model.

Round structure (k draft tokens per round):
  target cache holds positions [0, L); last emitted token is t0.
  1. draft decodes d1..dk one token at a time from its own cache.
  2. target runs one (k+1)-token step on [t0, d1, .., dk]: logits_i is the
     distribution after consuming the i-th input, i.e. greedy g1..g(k+1).
  3. accept d1..dj while d_i == g_i; emit g_{j+1} as the correction (or the
     bonus token when all k accepted).
  4. rewind both caches' lengths to the accepted frontier — stale KV slots
     beyond the frontier are masked out (kpos <= qpos) and overwritten by
     the next round's writes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.engine.generate import GenerateConfig, Generator


@dataclasses.dataclass
class SpecStats:
    rounds: int = 0
    drafted: int = 0
    accepted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(self.drafted, 1)


def _set_len(cache, value: int):
    return dataclasses.replace(
        cache, lengths=jnp.full_like(cache.lengths, value)
    )


def speculative_generate(
    target: Generator,
    draft: Generator,
    prompt_ids: list[int],
    cfg: GenerateConfig = GenerateConfig(),
    k: int = 4,
) -> tuple[list[int], SpecStats]:
    """Greedy speculative generation; returns (tokens, stats). Output is
    identical to target.generate(..) with greedy sampling."""
    assert cfg.sampling.temperature <= 0, "speculative path is greedy-only"
    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32))[None]

    t_cache = target.new_cache()
    t_logits, t_cache = target.prefill(t_cache, prompt)
    d_cache = draft.new_cache()
    d_logits, d_cache = draft.prefill(d_cache, prompt)

    t0 = int(jnp.argmax(t_logits[0]))
    out = [t0]
    stats = SpecStats()
    P = len(prompt_ids)
    t_frontier = P  # tokens whose KV is valid in the target cache
    d_frontier = P  # same for the draft cache

    t_step = target._step(k + 1)
    d_step = draft._step(1)

    def finished():
        return len(out) >= cfg.max_new_tokens or (
            cfg.eos_token_id is not None and out[-1] == cfg.eos_token_id
        )

    while not finished():
        all_tokens = prompt_ids + out  # global token sequence, 0-indexed
        # --- draft: consume its unprocessed tail, then emit k guesses
        d_cache = _set_len(d_cache, d_frontier)
        dl = None
        for tok in all_tokens[d_frontier:]:
            dl, d_cache = d_step(jnp.asarray([[tok]], jnp.int32), d_cache)
        d_frontier = len(all_tokens)
        drafted = []
        for _ in range(k):
            cur = int(jnp.argmax(dl[0, -1]))
            drafted.append(cur)
            dl, d_cache = d_step(jnp.asarray([[cur]], jnp.int32), d_cache)
        d_frontier += k  # provisional; rewound below to the accepted frontier

        # --- verify: one (k+1)-token target step over [last, d1..dk]
        t_cache = _set_len(t_cache, t_frontier)
        inp = jnp.asarray([all_tokens[t_frontier:] + drafted], jnp.int32)
        assert inp.shape[1] == k + 1
        tl, t_cache = t_step(inp, t_cache)
        greedy = np.asarray(jnp.argmax(tl[0], axis=-1))  # [k+1]

        accepted = 0
        for i in range(k):
            if drafted[i] == int(greedy[i]):
                accepted += 1
            else:
                break
        stats.rounds += 1
        stats.drafted += k
        stats.accepted += accepted

        for tok in drafted[:accepted] + [int(greedy[accepted])]:
            out.append(tok)
            if finished():
                break
        # frontiers advance over the verified inputs; anything beyond is
        # stale and masked/overwritten next round
        t_frontier += accepted + 1
        d_frontier = min(d_frontier, t_frontier)

    return out[: cfg.max_new_tokens], stats
