"""Bigger-than-HBM serving: device attention + host routed experts.

The reference's raison d'être is running 100s-of-GB MoE models on
memory-constrained accelerators by keeping routed experts in host RAM
(kt-kernel/python/experts_base.py:377-485, doc/en/DeepseekR1_V3_tutorial
.md:127-163). On this runtime the device sits behind a ~30 MB/s tunnel,
so the reference's OTHER key property — only activations cross the
boundary, weights never move — is not just an optimization here, it is
the only physically possible design. The forward is split into per-layer
jitted segments; between segments the host computes the routed-expert FFN
in C++ (offload/host_moe.py) from the normed hidden states, while
attention, norms, router and shared experts stay on-device.

Current model shape support: optional dense prefix layers
(first_k_dense_replace) followed by uniform MoE layers — the
DeepSeek/Kimi/Qwen-MoE families this path exists for.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.models.model import (
    KVCache,
    _dense_mlp,
    _gqa_attention,
    _mla_attention,
)
from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.ops.gate import route
from ktransformers_tpu.ops.norm import rms_norm
from ktransformers_tpu.ops.rope import precompute_rope_tables


def split_params_for_offload(params, spec: ModelSpec, activation=None):
    """Move each MoE layer's routed experts to host RAM. Returns
    (device_params, {layer_idx: HostMoELayer}). The device copy of a MoE
    layer keeps router/shared/norms/attention only."""
    from ktransformers_tpu.offload.host_moe import HostMoELayer

    host = {}
    dev_layers = []
    for li, lp in enumerate(params["layers"]):
        if "moe" in lp:
            moe = dict(lp["moe"])
            w = moe.pop("experts")
            act = activation or getattr(spec.activation, "kind", "silu")
            host[li] = HostMoELayer.from_qtensors(w.gate_up, w.down, act)
            dev_layers.append({**lp, "moe": moe})
        else:
            dev_layers.append(lp)
    return {**params, "layers": dev_layers}, host


@dataclasses.dataclass
class _State:
    """Host-side loop state for one in-flight batch."""

    res: jnp.ndarray          # [B, S, H] residual after attention+shared
    xn_host: np.ndarray       # [B*S, H] f32: input for host experts
    ids_host: np.ndarray      # [B*S, k]
    w_host: np.ndarray        # [B*S, k]


def pack_activations(flat, idx, w, transfer_dtype):
    """One readback instead of three: [T, H + 3k] in transfer_dtype.
    idx is split hi/lo base-128 so expert ids stay exact in bf16."""
    if transfer_dtype is None:
        return flat, idx, w
    td = transfer_dtype
    cols = [
        flat.astype(td),
        (idx // 128).astype(td),
        (idx % 128).astype(td),
        w.astype(td),
    ]
    return jnp.concatenate(cols, axis=1)


def run_host_moe(host_layer, packed, hidden: int, k: int, transfer_dtype):
    """Decode a packed activation block on host and run the C++ expert
    FFN; returns [T, H] in transfer_dtype (or f32 when None)."""
    if transfer_dtype is None:
        flat, ids, w = packed
        x = np.asarray(flat).astype(np.float32)
        ids = np.asarray(ids)
        w = np.asarray(w).astype(np.float32)
    else:
        a = np.asarray(packed).astype(np.float32)
        x = a[:, :hidden]
        ids = (
            a[:, hidden : hidden + k].astype(np.int32) * 128
            + a[:, hidden + k : hidden + 2 * k].astype(np.int32)
        )
        w = a[:, hidden + 2 * k :]
    y = host_layer.forward(x, ids, w)
    if transfer_dtype is not None:
        import ml_dtypes

        y = y.astype(ml_dtypes.bfloat16)
    return y


class HostOffloadGenerator:
    """Batch generation with host-resident routed experts.

    The per-step device work is L+2 jitted segments (embed+dense prefix,
    one reused mid-layer segment, final norm+lm_head+sample); between
    them the host runs kt_hostmoe_forward. All segments are compiled once
    per (batch, seq) shape."""

    def __init__(
        self,
        dev_params,
        spec: ModelSpec,
        host_layers,  # {layer_idx: HostMoELayer}
        max_len: int = 2048,
        batch: int = 8,
        cache_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
        transfer_dtype=None,  # activation dtype across the tunnel; bf16
        # halves host<->device traffic (the per-layer hop is latency/
        # bandwidth-bound); None = keep full compute precision (tests)
    ):
        self.params = dev_params
        self.spec = spec
        self.host = host_layers
        self.max_len = max_len
        self.batch = batch
        self.cache_dtype = cache_dtype
        self.compute_dtype = compute_dtype
        self.transfer_dtype = transfer_dtype
        self.rope = precompute_rope_tables(spec.rope)
        self.moe_lis = sorted(host_layers)
        n = spec.num_layers
        # supported shape: dense prefix [0, moe_lis[0]), then all-MoE
        first = self.moe_lis[0]
        assert self.moe_lis == list(range(first, n)), (
            "host offload supports dense-prefix + uniform MoE tails only"
        )
        self.first_moe = first
        self._steps = {}

    def new_cache(self) -> KVCache:
        return KVCache.create(
            self.spec, self.batch, self.max_len, dtype=self.cache_dtype
        )

    # -- device segments ----------------------------------------------------

    def _attn(self, lp, xn, bufs, lengths, rope_cs):
        if self.spec.attention.kind == "mla":
            return _mla_attention(lp["attn"], self.spec, xn, bufs, lengths, rope_cs)
        return _gqa_attention(lp["attn"], self.spec, xn, bufs, lengths, rope_cs)

    def _layer_head(self, lp, x, bufs, lengths, rope_cs):
        """attention + residual + post-norm + router + shared expert for
        one MoE layer; returns everything the host needs plus the residual
        that waits for the expert output."""
        res = x
        xn = rms_norm(x, lp["input_norm"], self.spec.rms_norm_eps)
        attn_out, bufs = self._attn(lp, xn, bufs, lengths, rope_cs)
        x = res + attn_out
        res2 = x
        xn2 = rms_norm(x, lp["post_attn_norm"], self.spec.rms_norm_eps)
        moe = lp["moe"]
        b, s, d = xn2.shape
        flat = xn2.reshape(b * s, d)
        logits = flat.astype(jnp.float32) @ moe["router_w"].astype(jnp.float32).T
        topk_idx, topk_w = route(
            logits, self.spec.moe.gate, moe.get("router_bias_corr")
        )
        shared_y = jnp.zeros_like(flat)
        if moe.get("shared") is not None:
            shared_y = _dense_mlp(moe["shared"], self.spec, flat)
            if self.spec.moe.shared_expert_gate:
                g = jax.nn.sigmoid(
                    flat.astype(jnp.float32)
                    @ moe["shared_gate"].astype(jnp.float32).T
                )
                shared_y = shared_y * g.astype(shared_y.dtype)
        return res2, shared_y.reshape(b, s, d), flat, topk_idx, topk_w, bufs

    def _pack(self, flat, idx, w):
        return pack_activations(flat, idx, w, self.transfer_dtype)

    def _seg_first(self, s: int):
        """embed + dense prefix layers + first MoE layer's head."""
        key = ("first", s)
        if key not in self._steps:
            spec, cdt = self.spec, self.compute_dtype

            @partial(jax.jit, donate_argnums=(2,))
            def fn(params, tokens, bufs, lengths, rope_tables):
                cos_t, sin_t = rope_tables
                pos = lengths[:, None] + jnp.arange(tokens.shape[1])[None, :]
                rope_cs = (cos_t[pos], sin_t[pos])
                x = params["embed"][tokens].astype(cdt)
                new_bufs = []
                for li in range(self.first_moe):
                    lp = params["layers"][li]
                    res = x
                    xn = rms_norm(x, lp["input_norm"], spec.rms_norm_eps)
                    attn_out, b2 = self._attn(lp, xn, bufs[li], lengths, rope_cs)
                    new_bufs.append(b2)
                    x = res + attn_out
                    res = x
                    xn = rms_norm(x, lp["post_attn_norm"], spec.rms_norm_eps)
                    x = res + _dense_mlp(lp["mlp"], spec, xn)
                lp = params["layers"][self.first_moe]
                res2, sh, flat, idx, w, b2 = self._layer_head(
                    lp, x, bufs[self.first_moe], lengths, rope_cs
                )
                new_bufs.append(b2)
                return res2, sh, self._pack(flat, idx, w), new_bufs, rope_cs

            self._steps[key] = fn
        return self._steps[key]

    def _seg_mid(self, s: int):
        """combine previous layer's expert output + next MoE layer head.
        One compiled function reused for every uniform mid layer."""
        key = ("mid", s)
        if key not in self._steps:

            @partial(jax.jit, donate_argnums=(1, 3))
            def fn(lp, res, shared_y, expert_y, bufs, lengths, rope_cs):
                # combine in the resident path's order (model.py _moe_mlp):
                # y = routed.astype(dtype) + shared; x = res + y
                y = expert_y.reshape(res.shape).astype(res.dtype) + shared_y
                r2, sh, flat, idx, ww, b2 = self._layer_head(
                    lp, res + y, bufs, lengths, rope_cs
                )
                return r2, sh, self._pack(flat, idx, ww), b2

            self._steps[key] = fn
        return self._steps[key]

    def _seg_final(self, s: int):
        key = ("final", s)
        if key not in self._steps:
            spec = self.spec

            @partial(jax.jit, donate_argnums=(1,))
            def fn(params, res, shared_y, expert_y, temperature, key_):
                y = expert_y.reshape(res.shape).astype(res.dtype) + shared_y
                x = res + y
                x = rms_norm(
                    x[:, -1:], params["final_norm"], spec.rms_norm_eps
                )
                lm = params.get("lm_head")
                if lm is None:
                    logits = x @ params["embed"].astype(x.dtype).T
                else:
                    from ktransformers_tpu.ops.linear import linear

                    logits = linear(x, lm)
                logits = logits[:, 0].astype(jnp.float32)
                greedy = jnp.argmax(logits, -1)
                sampled = jax.random.categorical(
                    key_, logits / jnp.maximum(temperature, 1e-6)
                )
                tok = jnp.where(temperature > 0, sampled, greedy)
                return tok.astype(jnp.int32), logits

            self._steps[key] = fn
        return self._steps[key]

    # -- host expert hop ----------------------------------------------------

    def _host_moe(self, li: int, packed) -> np.ndarray:
        return run_host_moe(
            self.host[li], packed, self.spec.hidden_size,
            self.spec.moe.gate.top_k, self.transfer_dtype,
        )

    # -- forward over one chunk --------------------------------------------

    def _chunk_steps(self, tokens, cache: KVCache, temperature, key):
        """Generator form of one forward chunk: after dispatching each
        device segment it YIELDS (layer_idx, packed) — the host expert
        input whose FFN the driver computes — and resumes with the expert
        output via send(). Single-batch forward drives it inline;
        forward_chunk_pipelined round-robins several microbatches so one
        microbatch's host GEMM overlaps another's device segment (the
        reference's CPU/GPU overlap, experts_base.py submit/sync)."""
        b, s = tokens.shape
        lengths = cache.lengths
        bufs = list(zip(cache.bufs_a, cache.bufs_b))
        # numpy operands go straight into the jit calls: on this runtime an
        # explicit device_put costs a full extra round trip, the call path
        # streams arguments with the dispatch
        res, sh, packed, new_bufs, rope_cs = self._seg_first(s)(
            self.params, tokens, bufs[: self.first_moe + 1],
            lengths, self.rope,
        )
        expert_y = yield (self.first_moe, packed)
        mid = self._seg_mid(s)
        for li in range(self.first_moe + 1, self.spec.num_layers):
            res, sh, packed, b2 = mid(
                self.params["layers"][li], res, sh, expert_y,
                bufs[li], lengths, rope_cs,
            )
            new_bufs.append(b2)
            expert_y = yield (li, packed)
        tok, logits = self._seg_final(s)(
            self.params, res, sh, expert_y,
            jnp.float32(temperature), key,
        )
        cache = KVCache(
            lengths=lengths + s,
            bufs_a=[a for a, _ in new_bufs],
            bufs_b=[bb for _, bb in new_bufs],
        )
        return tok, logits, cache

    def forward_chunk(
        self,
        tokens: np.ndarray,  # [B, S] int32
        cache: KVCache,
        temperature: float = 0.0,
        key=None,
    ):
        """Runs the full layer stack over S new tokens; returns
        (next_token [B], logits [B, V], cache). The KV bufs advance by S."""
        if key is None:
            key = jax.random.PRNGKey(0)
        gen = self._chunk_steps(tokens, cache, temperature, key)
        try:
            li, packed = gen.send(None)
            while True:
                li, packed = gen.send(self._host_moe(li, packed))
        except StopIteration as e:
            return e.value

    def forward_chunk_pipelined(
        self,
        tokens_list,  # list of [Bi, S] microbatches
        caches,  # matching KVCaches
        temperature: float = 0.0,
        keys=None,
    ):
        """2-stage software pipeline over microbatches: while the host
        computes microbatch i's routed experts, the device runs the other
        microbatches' attention/shared segments (dispatched by their last
        send()). Returns a list of (tok, logits, cache)."""
        n = len(tokens_list)
        if keys is None:
            keys = [jax.random.PRNGKey(i) for i in range(n)]
        gens = [
            self._chunk_steps(t, c, temperature, k)
            for t, c, k in zip(tokens_list, caches, keys)
        ]
        pending: list = [g.send(None) for g in gens]
        results: list = [None] * n
        live = list(range(n))
        while live:
            for i in list(live):
                li, packed = pending[i]
                # blocking readback + host GEMM for microbatch i; the
                # other live microbatches' device segments are in flight
                ey = self._host_moe(li, packed)
                try:
                    pending[i] = gens[i].send(ey)
                except StopIteration as e:
                    results[i] = e.value
                    live.remove(i)
        return results

    def generate(
        self,
        prompts: list[list[int]],
        max_new_tokens: int = 32,
        prefill_chunk: int = 256,
        temperature: float = 0.0,
        seed: int = 0,
        progress=None,
        microbatches: int = 1,  # >1: 2-stage pipeline — microbatch i's
        # host expert GEMM overlaps the others' device segments. NOTE
        # measured NEGATIVE at large batch on this host (28.1 -> 21.6
        # tok/s, scripts/bench_offload.py --microbatches): big batches
        # route to nearly every expert, so each microbatch re-reads the
        # full expert bytes and the weight-bandwidth-bound host loses
        # more than the overlap gains. Worthwhile only when the host
        # GEMM is compute-bound.
    ) -> list[list[int]]:
        """Greedy/temperature batch generation with VARIABLE prompt
        lengths (r4; the old version asserted equal lengths): the batch
        prefills to the SHORTEST prompt together, then rows with longer
        prompts consume their remaining prompt tokens through the decode
        path (teacher forcing) while finished rows generate — exact under
        greedy, since each row's inputs are exactly its own tokens."""
        assert len(prompts) <= self.batch
        m = microbatches
        assert self.batch % m == 0, (self.batch, m)
        bs = self.batch // m
        n = len(prompts)
        row_lens = [len(p) for p in prompts] + [len(prompts[0])] * (
            self.batch - n
        )
        min_len = min(row_lens)
        max_len_p = max(row_lens)
        pad_rows = [prompts[0]] * (self.batch - n)
        toks = np.zeros((self.batch, max_len_p), np.int32)
        for i, p in enumerate(list(prompts) + pad_rows):
            toks[i, : len(p)] = p
        caches = [
            KVCache.create(self.spec, bs, self.max_len,
                           dtype=self.cache_dtype)
            for _ in range(m)
        ]
        key = jax.random.PRNGKey(seed)
        out = [[] for _ in range(n)]

        def run(chunks, subkeys):
            res = self.forward_chunk_pipelined(
                chunks, caches, temperature, subkeys
            )
            for i, (tok_i, _, c_i) in enumerate(res):
                caches[i] = c_i
            return jnp.concatenate([r[0] for r in res], 0)

        # joint prefill to the shortest prompt
        pos = 0
        while pos < min_len:
            end = min(pos + prefill_chunk, min_len)
            chunk = toks[:, pos:end]
            key, *subs = jax.random.split(key, m + 1)
            tok = run(
                [chunk[i * bs : (i + 1) * bs] for i in range(m)], subs
            )
            pos += chunk.shape[1]
            if progress:
                progress(f"prefill {pos}/{min_len}")
        # hybrid phase: rows with prompt left are teacher-forced; others
        # decode. Row i's first GENERATED token is the sample taken when
        # its last prompt token was the input (cache len == row_lens[i]).
        cur = np.asarray(tok).reshape(-1)
        cache_len = min_len
        total_steps = (max_len_p - min_len) + max_new_tokens - 1
        for step in range(total_steps):
            forced = cache_len < np.asarray(row_lens)
            inp = np.where(forced, toks[:, min(cache_len,
                                               max_len_p - 1)], cur)
            for i in range(n):
                if not forced[i] and len(out[i]) < max_new_tokens:
                    out[i].append(int(cur[i]))
            if all(len(out[i]) >= max_new_tokens for i in range(n)):
                break
            key, *subs = jax.random.split(key, m + 1)
            inp2 = inp.reshape(-1, 1).astype(np.int32)
            tok = run(
                [inp2[i * bs : (i + 1) * bs] for i in range(m)], subs
            )
            cur = np.asarray(tok).reshape(-1)
            cache_len += 1
            if progress:
                progress(f"step {step + 1}/{total_steps}")
        for i in range(n):
            if len(out[i]) < max_new_tokens:
                out[i].append(int(cur[i]))
        return [o[:max_new_tokens] for o in out]
