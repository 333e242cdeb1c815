"""MTP self-speculation: a DeepSeek-V3-style multi-token-prediction head
drafts from the target's OWN hidden states — no separate draft model.

Reference analog: the MTP module shipped with DeepSeek-V3/Kimi-K2
checkpoints (one extra decoder layer at index num_hidden_layers with
enorm/hnorm/eh_proj and a shared lm_head), used by the reference via its
sglang fork for ~1.2x decode (doc/en/DeepSeek-V4-Flash.md:157-165).

MTP convention: at sequence position i the head consumes
(h_i, emb(t_{i+1})) — the target's pre-final-norm hidden and the NEXT
token's embedding — projected through eh_proj, runs one decoder layer
over its own KV cache, and predicts t_{i+2}. Drafting chains the head's
own hidden output as the next h (the EAGLE trick), so k tokens cost k
single-layer steps. Verification is the standard greedy-exact target
step, so output == target greedy regardless of head quality."""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.engine.speculative import SpecStats, _set_len
from ktransformers_tpu.models.model import (
    KVCache,
    _dense_mlp,
    _gqa_attention,
    _mla_attention,
    _moe_mlp,
    forward,
)
from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.ops.linear import linear
from ktransformers_tpu.ops.norm import rms_norm


def mtp_layer_forward(
    mtp,                  # MTP head params
    main_params,          # for shared embed / lm_head
    spec: ModelSpec,
    tokens,               # [B, S] int32: t_{i+1} at each position i
    h_prev,               # [B, S, H]: target hidden at each position i
    cache,                # single-layer KVCache (bufs lists of length 1)
    rope_tables,
    compute_dtype=jnp.bfloat16,
    compute_logits: bool = True,
):
    """Returns (logits [B, S, V] | None, h_out [B, S, H], cache')."""
    b, s = tokens.shape
    cos_t, sin_t = rope_tables
    pos = cache.lengths[:, None] + jnp.arange(s)[None, :]
    rope_cs = (cos_t[pos], sin_t[pos])

    e = main_params["embed"][tokens].astype(compute_dtype)
    x = jnp.concatenate(
        [
            rms_norm(e, mtp["enorm"], spec.rms_norm_eps),
            rms_norm(h_prev.astype(compute_dtype), mtp["hnorm"],
                     spec.rms_norm_eps),
        ],
        axis=-1,
    )
    x = linear(x, mtp["eh_proj"])

    lp = mtp["layer"]
    res = x
    xn = rms_norm(x, lp["input_norm"], spec.rms_norm_eps)
    layer_cache = (cache.bufs_a[0], cache.bufs_b[0])
    if spec.attention.kind == "mla":
        attn_out, (ba, bb) = _mla_attention(
            lp["attn"], spec, xn, layer_cache, cache.lengths, rope_cs
        )
    else:
        attn_out, (ba, bb) = _gqa_attention(
            lp["attn"], spec, xn, layer_cache, cache.lengths, rope_cs
        )
    x = res + attn_out
    res = x
    xn = rms_norm(x, lp["post_attn_norm"], spec.rms_norm_eps)
    if "moe" in lp:
        x = res + _moe_mlp(lp["moe"], spec, xn)
    else:
        x = res + _dense_mlp(lp["mlp"], spec, xn)

    h_out = x
    new_cache = KVCache(lengths=cache.lengths + s, bufs_a=[ba], bufs_b=[bb])
    if not compute_logits:
        # cache catch-up passes don't need the lm_head read (~52 MB int4)
        return None, h_out, new_cache
    xf = rms_norm(x, mtp["final_norm"], spec.rms_norm_eps)
    lm = main_params.get("lm_head")
    if lm is None:
        logits = xf @ main_params["embed"].astype(xf.dtype).T
    else:
        logits = linear(xf, lm)
    return logits, h_out, new_cache


def init_mtp_synthetic(spec: ModelSpec, seed: int = 1, quant: str = "int8",
                       moe_quant: str | None = None,
                       dense_layer: bool = False):
    """Random MTP head at model scale (bench); the decoder-layer half
    mirrors the model's last layer type (dense_layer=True: use a dense-MLP
    decoder layer instead — e.g. a TRAINABLE bf16 head whose MoE variant
    would not fit HBM next to the frozen base + Adam moments)."""
    from ktransformers_tpu.models.init import _layer_params
    from ktransformers_tpu.quant.formats import quantize

    d = spec.hidden_size
    rng = np.random.default_rng(seed)

    def q(shape, kind):
        w = rng.standard_normal(shape).astype(np.float32) / np.sqrt(shape[-2])
        return quantize(jnp.asarray(w), kind, group_size=128)

    def rand(shape, sc=0.02):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * sc)

    li = spec.num_layers - 1
    if dense_layer:
        li = next(
            (i for i in range(spec.num_layers)
             if spec.moe is None or not spec.moe.is_moe_layer(i)),
            0,
        )
    layer = _layer_params(
        spec, li, q, rand, quant, moe_quant or quant
    )
    return {
        "enorm": jnp.ones((d,), jnp.float32),
        "hnorm": jnp.ones((d,), jnp.float32),
        "eh_proj": q((2 * d, d), quant),
        "layer": layer,
        "final_norm": jnp.ones((d,), jnp.float32),
    }


def mtp_params_from_provider(p, spec: ModelSpec, quant: str = "bf16",
                             group_size: int = 128):
    """Load a real DeepSeek-V3-style MTP head: HF names
    model.layers.{L}.{enorm,hnorm,eh_proj,shared_head.norm,...} where
    L == num_hidden_layers (reference: the checkpoint's extra MTP layer)."""
    from ktransformers_tpu.models.loading import build_params

    li = spec.num_layers
    base = f"model.layers.{li}"
    one_layer = dataclasses.replace(spec, num_layers=1)

    # build the decoder-layer half with the loader's own machinery by
    # remapping names layer-L -> layer-0
    class _Shift:
        def __init__(self, inner):
            self.inner = inner

        def _map(self, name):
            return name.replace("model.layers.0.", f"{base}.")

        def get(self, name):
            return self.inner.get(self._map(name))

        def maybe(self, name):
            return self.inner.maybe(self._map(name))

    shifted = _Shift(p)
    lp = build_params(
        shifted, one_layer, quant=quant, group_size=group_size
    )["layers"][0]

    from ktransformers_tpu.models.loading import _q, _t

    def vec(name):
        return jnp.asarray(np.asarray(p.get(name), np.float32))

    return {
        "enorm": vec(f"{base}.enorm.weight"),
        "hnorm": vec(f"{base}.hnorm.weight"),
        "eh_proj": _q(_t(p.get(f"{base}.eh_proj.weight")), quant, group_size),
        "layer": lp,
        "final_norm": vec(f"{base}.shared_head.norm.weight"),
    }


class MTPDrafter:
    """Owns the jitted MTP steps for one (spec, batch) shape set."""

    def __init__(self, mtp_params, target: Generator):
        self.mtp = mtp_params
        self.t = target
        self._steps = {}

    def new_cache(self) -> KVCache:
        one = dataclasses.replace(self.t.spec, num_layers=1)
        return KVCache.create(
            one, self.t.batch, self.t.max_len, dtype=self.t.cache_dtype
        )

    def _step(self, s: int):
        if s not in self._steps:
            spec = self.t.spec
            rope = self.t.rope_tables
            cdt = self.t.compute_dtype

            @partial(jax.jit, donate_argnums=(2,))
            def fn(tokens, h_prev, cache, mtp, params):
                return mtp_layer_forward(
                    mtp, params, spec, tokens, h_prev, cache, rope, cdt
                )

            self._steps[s] = partial(
                fn, mtp=self.mtp, params=self.t.params
            )
        return self._steps[s]


def mtp_generate(
    target: Generator,
    mtp_params,
    prompt_ids: list[int],
    cfg: GenerateConfig = GenerateConfig(),
    k: int = 3,
) -> tuple[list[int], SpecStats]:
    """Greedy self-speculative generation; output equals target greedy.

    Per round: k MTP draft steps (one extra layer each) + one (k+1)-token
    target verify step returning hidden states for the next round."""
    assert cfg.sampling.temperature <= 0, "speculative path is greedy-only"
    spec = target.spec
    rope = target.rope_tables
    cdt = target.compute_dtype

    @partial(jax.jit, donate_argnums=(2,), static_argnames=())
    def t_step_hidden(params, tokens, cache):
        return forward(
            params, spec, tokens, cache, rope_tables=rope,
            compute_dtype=cdt, return_hidden=True,
        )

    drafter = MTPDrafter(mtp_params, target)

    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32))[None]
    P = len(prompt_ids)

    t_cache = target.new_cache()
    tl, t_cache, th = t_step_hidden(target.params, prompt, t_cache)
    t0 = int(jnp.argmax(tl[0, -1]))
    out = [t0]
    stats = SpecStats()

    # prime the MTP cache over the prompt: position i consumes
    # (h_i, t_{i+1}) for i in [0, P-2]
    m_cache = drafter.new_cache()
    if P > 1:
        _, _, m_cache = drafter._step(P - 1)(
            prompt[:, 1:], th[:, : P - 1], m_cache
        )
    m_frontier = P - 1  # MTP positions consumed
    t_frontier = P
    h_last = th[:, -1:]  # target hidden at position P-1
    d1_step = drafter._step(1)

    def finished():
        return len(out) >= cfg.max_new_tokens or (
            cfg.eos_token_id is not None and out[-1] == cfg.eos_token_id
        )

    while not finished():
        all_tokens = prompt_ids + out
        # catch the MTP cache up to position t_frontier - 1: feed
        # (h_i, t_{i+1}) pairs for already-verified positions. h for those
        # came from the last verify step's hidden (th spans the verified
        # inputs).
        m_cache = _set_len(m_cache, m_frontier)
        # positions m_frontier .. t_frontier-2 consume tokens
        # all_tokens[m_frontier+1 .. t_frontier-1] and hiddens from th
        # (hidden for global pos i is th[:, i - (t_frontier - th.shape[1])])
        off = t_frontier - th.shape[1]
        h_buf = th
        toks_catch = all_tokens[m_frontier + 1 : t_frontier]
        if toks_catch:
            hs = h_buf[:, m_frontier - off : t_frontier - 1 - off]
            _, _, m_cache = drafter._step(len(toks_catch))(
                jnp.asarray([toks_catch], jnp.int32), hs, m_cache
            )
            m_frontier += len(toks_catch)

        # draft k tokens: chain the head's own hidden
        drafted = []
        h = h_last
        cur = all_tokens[-1]
        for _ in range(k):
            dl, h, m_cache = d1_step(
                jnp.asarray([[cur]], jnp.int32), h, m_cache
            )
            cur = int(jnp.argmax(dl[0, -1]))
            drafted.append(cur)
        m_frontier += k  # provisional; rewound next round

        # verify
        t_cache = _set_len(t_cache, t_frontier)
        inp = jnp.asarray([all_tokens[t_frontier:] + drafted], jnp.int32)
        tl, t_cache, th = t_step_hidden(target.params, inp, t_cache)
        greedy = np.asarray(jnp.argmax(tl[0], axis=-1))

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
        t_frontier += accepted + 1
        h_last = th[:, accepted : accepted + 1]
        m_frontier = min(m_frontier, t_frontier - 1)

    return out[: cfg.max_new_tokens], stats


def _single_round_fns(target: Generator, k: int):
    """Jitted single-program MTP rounds, cached on the Generator: a fresh
    jit per generate call would make every TIMED run re-load/upload the
    executables (r4: 213 ms/round measured where the hot program is
    7.9 ms)."""
    key_ = ("mtp_single_round", k)
    if key_ in target._steps:
        return target._steps[key_]
    spec = target.spec
    rope = target.rope_tables
    cdt = target.compute_dtype

    def _drafts(params, mtp, m_cache, bonus, h_bonus):
        cur, h = bonus, h_bonus
        drafted = []
        for _ in range(k):
            dl, h, m_cache = mtp_layer_forward(
                mtp, params, spec, cur[:, None], h, m_cache, rope, cdt
            )
            cur = jnp.argmax(dl[:, -1], axis=-1).astype(jnp.int32)
            drafted.append(cur)
        return jnp.stack(drafted, axis=1), m_cache  # [B, k]

    def _verify(params, t_cache, bonus, d):
        T = t_cache.lengths
        inp = jnp.concatenate([bonus[:, None], d], axis=1)
        tl, t_cache, th = forward(
            params, spec, inp, t_cache, rope_tables=rope,
            compute_dtype=cdt, return_hidden=True,
        )
        greedy = jnp.argmax(tl, axis=-1).astype(jnp.int32)
        match = (d == greedy[:, :k]).astype(jnp.int32)
        a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
        bonus_new = jnp.take_along_axis(greedy, a[:, None], axis=1)[:, 0]
        j_idx = jnp.arange(k + 1)[None, :]
        d_pad = jnp.pad(d, ((0, 0), (0, 1)))
        emitted = jnp.where(
            j_idx < a[:, None],
            d_pad,
            jnp.where(j_idx == a[:, None], bonus_new[:, None], -1),
        )
        h_new = jnp.take_along_axis(th, a[:, None, None], axis=1)
        t_cache = dataclasses.replace(t_cache, lengths=T + a + 1)
        return emitted, a, bonus_new, h_new, th, T, t_cache

    @partial(jax.jit, donate_argnums=(2, 3))
    def round1(params, mtp, t_cache, m_cache, bonus, h_bonus):
        d, m_cache = _drafts(params, mtp, m_cache, bonus, h_bonus)
        emitted, a, bonus2, h2, th, T, t_cache = _verify(
            params, t_cache, bonus, d
        )
        return emitted, a, bonus2, h2, d, th, T, t_cache, m_cache

    @partial(jax.jit, donate_argnums=(2, 3))
    def round_n(params, mtp, t_cache, m_cache, bonus, h_bonus,
                T_p, d_p, g_last, a_p, th_p):
        # catch the MTP cache up over the previous round's verified span
        # (rows < T_p + a_p are correct; rejected rows get overwritten)
        m_cache = dataclasses.replace(m_cache, lengths=T_p)
        nxt = jnp.concatenate([d_p, g_last[:, None]], axis=1)
        _, _, m_cache = mtp_layer_forward(
            mtp, params, spec, nxt, th_p, m_cache, rope, cdt,
            compute_logits=False,
        )
        m_cache = dataclasses.replace(m_cache, lengths=T_p + a_p)
        d, m_cache = _drafts(params, mtp, m_cache, bonus, h_bonus)
        emitted, a, bonus2, h2, th, T, t_cache = _verify(
            params, t_cache, bonus, d
        )
        return emitted, a, bonus2, h2, d, th, T, t_cache, m_cache

    target._steps[key_] = (round1, round_n)
    return target._steps[key_]


def mtp_generate_single(
    target: Generator,
    mtp_params,
    prompt_ids: list[int],
    cfg: GenerateConfig = GenerateConfig(),
    k: int = 3,
) -> tuple[list[int], SpecStats]:
    """Greedy MTP self-speculation with the WHOLE round (MTP catch-up +
    k drafts + verify + accept) in ONE device program — the loop replays
    a single hot program, so per-round cost is the device time
    (scripts/spec_lab.py r4: 7.93 ms/round vs 3.64 ms/decode-step on the
    16B bench model; the r3 'program-size cliff' and 'alternation
    re-upload' findings were broken-barrier measurement artifacts).

    Output equals target greedy exactly (same verify rule as
    mtp_generate). Reference: doc/en/DeepSeek-V4-Flash.md:157-165."""
    assert cfg.sampling.temperature <= 0, "speculative path is greedy-only"
    import os

    spec = target.spec
    rope = target.rope_tables
    cdt = target.compute_dtype
    drafter = MTPDrafter(mtp_params, target)
    round1, round_n = _single_round_fns(target, k)

    # --- prompt prefill + MTP priming (jits cached on the Generator so a
    # timed second call replays hot programs, like the round fns) ---
    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32))[None]
    P = len(prompt_ids)

    key_p = "mtp_prefill_hidden"
    if key_p not in target._steps:

        @partial(jax.jit, donate_argnums=(2,))
        def t_prefill_hidden(params, tokens, cache):
            return forward(
                params, spec, tokens, cache, rope_tables=rope,
                compute_dtype=cdt, return_hidden=True,
            )

        target._steps[key_p] = t_prefill_hidden

    key_m = ("mtp_prime", P - 1)
    if P > 1 and key_m not in target._steps:

        @partial(jax.jit, donate_argnums=(4,))
        def prime(params, mtp, tokens, h, cache):
            return mtp_layer_forward(
                mtp, params, spec, tokens, h, cache, rope, cdt,
                compute_logits=False,
            )

        target._steps[key_m] = prime

    t_cache = target.new_cache()
    tl, t_cache, th = target._steps[key_p](target.params, prompt, t_cache)
    bonus = jnp.argmax(tl[:, -1], axis=-1).astype(jnp.int32)
    out = [int(np.asarray(bonus)[0])]
    m_cache = drafter.new_cache()
    if P > 1:
        _, _, m_cache = target._steps[key_m](
            target.params, drafter.mtp, prompt[:, 1:], th[:, : P - 1],
            m_cache,
        )
    h_bonus = th[:, -1:]
    stats = SpecStats()

    depth = max(1, int(os.environ.get("KT_SPEC_PIPELINE", "4")))
    # r5 sweep: depth 8 / k 2 is the best measured config (round 8.7 ms,
    # 273.8 tok/s, acceptance 0.676) — but k=3 at depth>=8 WEDGES the
    # tunnel (deep queues of large round programs; BENCH_SPECULATIVE
    # r5_sweep), so the safe default stays 4; set KT_SPEC_PIPELINE=8
    # explicitly for k<=2 workloads.
    pending = []

    def resolve(entry):
        emitted, a = entry
        em = np.asarray(emitted)[0]
        a_i = int(np.asarray(a)[0])
        stats.rounds += 1
        stats.drafted += k
        stats.accepted += a_i
        for tok in em[: a_i + 1]:
            out.append(int(tok))
            if len(out) >= cfg.max_new_tokens or (
                cfg.eos_token_id is not None
                and out[-1] == cfg.eos_token_id
            ):
                return True
        return False

    done = False
    dispatched = 0
    prev = None
    while not done:
        while (
            not done and len(pending) < depth
            and dispatched < cfg.max_new_tokens
            and P + 1 + (dispatched + 1) * (k + 1) < target.max_len
        ):
            if prev is None:
                (emitted, a, bonus, h_bonus, d, th_r, T_r, t_cache,
                 m_cache) = round1(
                    target.params, drafter.mtp, t_cache, m_cache, bonus,
                    h_bonus,
                )
            else:
                T_p, d_p, g_last, a_p, th_p = prev
                (emitted, a, bonus, h_bonus, d, th_r, T_r, t_cache,
                 m_cache) = round_n(
                    target.params, drafter.mtp, t_cache, m_cache, bonus,
                    h_bonus, T_p, d_p, g_last, a_p, th_p,
                )
            prev = (T_r, d, bonus, a, th_r)
            try:
                emitted.copy_to_host_async()
                a.copy_to_host_async()
            except Exception:  # pragma: no cover
                pass
            pending.append((emitted, a))
            dispatched += 1
        if not pending:
            break
        done = resolve(pending.pop(0))
    return out[: cfg.max_new_tokens], stats


def mtp_generate_fused(
    target: Generator,
    mtp_params,
    prompt_ids: list[int],
    cfg: GenerateConfig = GenerateConfig(),
    k: int = 3,
) -> tuple[list[int], SpecStats]:
    """Greedy MTP self-speculation with the round fused into TWO device
    programs — drafts (k argmax-chained 1-layer MTP steps) and
    verify+accept+catch-up — dispatched back-to-back WITHOUT host reads
    between them; the host reads one small int array per round, late,
    through a depth-2 pipeline (copy_to_host_async), so the tunnel RTT
    amortizes across rounds.

    Why two programs and not one: on the axon runtime programs past a size
    cliff (~10.5 MB HLO) dispatch at 100-400 ms regardless of device time
    (measured r3: the single fused round program cost 220 ms/round); the
    27-layer verify forward alone sits just under the cliff, so the k
    draft steps live in their own small program. On non-tunneled runtimes
    both variants behave the same. r2's host-driven loop (a blocking RTT
    per draft step) measured break-even acceptance 9.85 — unwinnable.

    Output equals target greedy exactly (same verify rule as mtp_generate).
    Position bookkeeping per round, with T = verified length at round
    start and b0 the one emitted-but-uncached bonus token at position T:
    drafts write MTP rows T-1 .. T+k-2 (row T-1 from the TARGET hidden),
    verify writes target rows T .. T+k and returns hiddens th; accept a =
    leading matches; the catch-up re-writes MTP rows T .. T+k from th with
    the verified continuation, correct for rows < T+a — exactly the rows
    kept after the final rewind (m_len = T+a, t_len = T+a+1). Rejected
    rows beyond the rewind are overwritten by the next round.

    Reference: doc/en/DeepSeek-V4-Flash.md:157-165 (sglang MTP ~1.2x).
    """
    assert cfg.sampling.temperature <= 0, "speculative path is greedy-only"
    import os

    spec = target.spec
    rope = target.rope_tables
    cdt = target.compute_dtype
    drafter = MTPDrafter(mtp_params, target)

    @partial(jax.jit, donate_argnums=(2,))
    def draft_fn(params, mtp, m_cache, bonus, h_bonus):
        """k argmax-chained draft steps (round 1: no catch-up needed)."""
        cur = bonus
        h = h_bonus
        drafted = []
        for _ in range(k):
            dl, h, m_cache = mtp_layer_forward(
                mtp, params, spec, cur[:, None], h, m_cache, rope, cdt
            )
            cur = jnp.argmax(dl[:, -1], axis=-1).astype(jnp.int32)
            drafted.append(cur)
        return jnp.stack(drafted, axis=1), m_cache  # d [B, k]

    @partial(jax.jit, donate_argnums=(2,))
    def catchup_draft_fn(params, mtp, m_cache, T_prev, d_prev, greedy_prev,
                         a_prev, bonus, h_bonus):
        """Catch the MTP cache up from the PREVIOUS round's verify hiddens
        (passed as h_all), then draft k tokens. Lives in the small MTP-only
        program: the 27-layer verify program sits just under the axon
        program-size cliff and cannot absorb another decoder layer."""
        h_all, = (h_bonus["th"],)
        m_cache = dataclasses.replace(m_cache, lengths=T_prev)
        nxt = jnp.concatenate([d_prev, greedy_prev[:, -1:]], axis=1)
        _, _, m_cache = mtp_layer_forward(
            mtp, params, spec, nxt, h_all, m_cache, rope, cdt,
            compute_logits=False,
        )
        m_cache = dataclasses.replace(m_cache, lengths=T_prev + a_prev)
        cur = bonus
        h = h_bonus["h"]
        drafted = []
        for _ in range(k):
            dl, h, m_cache = mtp_layer_forward(
                mtp, params, spec, cur[:, None], h, m_cache, rope, cdt
            )
            cur = jnp.argmax(dl[:, -1], axis=-1).astype(jnp.int32)
            drafted.append(cur)
        return jnp.stack(drafted, axis=1), m_cache

    @partial(jax.jit, donate_argnums=(2,))
    def verify_fn(params, t_cache, bonus, d):
        """Pure target verify + accept: NO extra decoder layers, so the
        program stays under the dispatch-size cliff."""
        T = t_cache.lengths  # [B] verified length at round start
        inp = jnp.concatenate([bonus[:, None], d], axis=1)  # [B, k+1]
        tl, t_cache, th = forward(
            params, spec, inp, t_cache, rope_tables=rope,
            compute_dtype=cdt, return_hidden=True,
        )
        greedy = jnp.argmax(tl, axis=-1).astype(jnp.int32)  # [B, k+1]

        match = (d == greedy[:, :k]).astype(jnp.int32)
        a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [B] in [0, k]
        bonus_new = jnp.take_along_axis(greedy, a[:, None], axis=1)[:, 0]
        j_idx = jnp.arange(k + 1)[None, :]
        d_pad = jnp.pad(d, ((0, 0), (0, 1)))
        emitted = jnp.where(
            j_idx < a[:, None],
            d_pad,
            jnp.where(j_idx == a[:, None], bonus_new[:, None], -1),
        )  # [B, k+1]; -1 marks unused slots
        h_new = jnp.take_along_axis(th, a[:, None, None], axis=1)
        t_cache = dataclasses.replace(t_cache, lengths=T + a + 1)
        return emitted, a, bonus_new, h_new, th, T, t_cache

    # --- prompt prefill + MTP priming (as mtp_generate) ---
    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32))[None]
    P = len(prompt_ids)

    @partial(jax.jit, donate_argnums=(2,))
    def t_prefill_hidden(params, tokens, cache):
        return forward(
            params, spec, tokens, cache, rope_tables=rope,
            compute_dtype=cdt, return_hidden=True,
        )

    t_cache = target.new_cache()
    tl, t_cache, th = t_prefill_hidden(target.params, prompt, t_cache)
    bonus = jnp.argmax(tl[:, -1], axis=-1).astype(jnp.int32)
    out = [int(bonus[0])]
    m_cache = drafter.new_cache()
    if P > 1:
        _, _, m_cache = drafter._step(P - 1)(
            prompt[:, 1:], th[:, : P - 1], m_cache
        )
    h_bonus = th[:, -1:]
    stats = SpecStats()

    depth = max(1, int(os.environ.get("KT_SPEC_PIPELINE", "4")))
    # r5 sweep: depth 8 / k 2 is the best measured config (round 8.7 ms,
    # 273.8 tok/s, acceptance 0.676) — but k=3 at depth>=8 WEDGES the
    # tunnel (deep queues of large round programs; BENCH_SPECULATIVE
    # r5_sweep), so the safe default stays 4; set KT_SPEC_PIPELINE=8
    # explicitly for k<=2 workloads.
    pending = []  # (emitted, a) device arrays, read late

    def resolve(entry):
        emitted, a = entry
        # np.asarray of the WHOLE arrays: indexing first (emitted[0])
        # would dispatch a device op that queues BEHIND the in-flight
        # rounds and serializes the pipeline (r4 readback rule, bench.py)
        em = np.asarray(emitted)[0]
        a_i = int(np.asarray(a)[0])
        stats.rounds += 1
        stats.drafted += k
        stats.accepted += a_i
        for tok in em[: a_i + 1]:
            out.append(int(tok))
            if len(out) >= cfg.max_new_tokens or (
                cfg.eos_token_id is not None and out[-1] == cfg.eos_token_id
            ):
                return True
        return False

    done = False
    dispatched_rounds = 0
    max_rounds = cfg.max_new_tokens  # worst case 1 token/round
    prev = None  # (T, d, greedy, a) of the previous round, on device
    profile = os.environ.get("KT_SPEC_PROFILE", "0") == "1"
    prof = {"draft_s": 0.0, "verify_s": 0.0}
    import time as _time

    while not done:
        while (
            not done
            and len(pending) < depth
            and dispatched_rounds < max_rounds
            and P + 1 + (dispatched_rounds + 1) * (k + 1) < target.max_len
        ):
            t0 = _time.perf_counter() if profile else 0.0
            if prev is None:
                d, m_cache = draft_fn(
                    target.params, drafter.mtp, m_cache, bonus, h_bonus
                )
            else:
                T_p, d_p, g_p, a_p, th_p = prev
                d, m_cache = catchup_draft_fn(
                    target.params, drafter.mtp, m_cache, T_p, d_p, g_p,
                    a_p, bonus, {"h": h_bonus, "th": th_p},
                )
            if profile:
                jax.block_until_ready(d)
                t1 = _time.perf_counter()
                prof["draft_s"] += t1 - t0
                t0 = t1
            emitted, a, bonus, h_bonus, th_r, T_r, t_cache = verify_fn(
                target.params, t_cache, bonus, d
            )
            if profile:
                jax.block_until_ready(emitted)
                prof["verify_s"] += _time.perf_counter() - t0
            # the catch-up's last token column only writes MTP row T+k,
            # which is always past the kept range (< T+a, a <= k) — any
            # [B, k+1] token array works there; `emitted` is at hand
            prev = (T_r, d, emitted, a, th_r)
            try:
                emitted.copy_to_host_async()
                a.copy_to_host_async()
            except Exception:  # pragma: no cover - backend-dependent
                pass
            pending.append((emitted, a))
            dispatched_rounds += 1
        if not pending:
            break
        done = resolve(pending.pop(0))
    if profile and stats.rounds:
        import sys as _sys

        print(
            f"[spec profile] draft {prof['draft_s']/stats.rounds*1e3:.1f} "
            f"ms/round, verify {prof['verify_s']/stats.rounds*1e3:.1f} "
            f"ms/round over {stats.rounds} rounds",
            file=_sys.stderr,
        )
    return out[: cfg.max_new_tokens], stats
