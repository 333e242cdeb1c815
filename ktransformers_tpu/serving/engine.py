"""ServeEngine: executes scheduler batches as fixed-shape jitted steps.

Analog of the reference's Engine.loop + ModelRunner
(server/backend/interfaces/balance_serve.py:144-381, inference/
model_runner.py): CUDA-graph buckets become per-shape jit caches; the
"fetch next batch while GPU runs" overlap becomes JAX async dispatch (the
next batch is planned on host while the device executes).
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.cache.paged import PagedKVCache, PageAllocator
from ktransformers_tpu.cache.prefix import PrefixCache
from ktransformers_tpu.models.paged import forward_paged
from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.ops.rope import precompute_rope_tables
from ktransformers_tpu.serving.scheduler import (
    DECODE,
    BatchPlan,
    Query,
    Scheduler,
    SchedulerConfig,
)


from ktransformers_tpu.engine.sampler import sample_batched


class ServeEngine:
    def __init__(
        self,
        params,
        spec: ModelSpec,
        cfg: SchedulerConfig = SchedulerConfig(),
        num_pages: int = 512,
        cache_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
        enable_prefix_cache: bool = True,
        spill_tier=None,  # cache/tiers.py HostDiskTier for host/disk KV
        collect_routing: bool = False,  # per-layer expert stats for
        # dynamic re-placement (reference --kt-enable-dynamic-expert-update)
        sparse_budget: int | None = None,  # top-K-page decode attention
        # (long-context; ops/sparse_attention.py)
        sparse_anchor: str = "quest",  # anchor kind (reference AnchorType)
        sparse_retrieval: str = "layer",  # retrieval granularity
    ):
        from ktransformers_tpu.ops import pallas as pallas_ops
        from ktransformers_tpu.utils.device_prep import prepare_params

        params = prepare_params(params, pallas_ops.maybe_enable(), spec)
        self.params = params
        self.spec = spec
        self.cfg = cfg
        self.sparse_budget = sparse_budget
        self.sparse_anchor = sparse_anchor
        self.sparse_retrieval = sparse_retrieval
        # hybrid models (qwen3-next): GatedDeltaNet layers carry O(1)
        # recurrent state per slot instead of pages; their state cannot be
        # reconstructed from KV pages, so prefix reuse and host/disk spill
        # are off for them
        self._hybrid = any(
            spec.layer_kind(li) == "linear" for li in range(spec.num_layers)
        )
        if self._hybrid:
            assert spill_tier is None, "hybrid models cannot spill state"
            enable_prefix_cache = False
        self.kv = PagedKVCache.create(
            spec, num_pages, cfg.page_size, dtype=cache_dtype,
            summaries=sparse_budget is not None,
            linear_slots=cfg.max_batch_size,
            anchor=sparse_anchor,
        )
        # page 0 = trash page for padding-row writes (see PageAllocator)
        self._stale_summary_pages: list[int] = []
        self.alloc = PageAllocator(
            num_pages, reserved=1,
            on_alloc=(self._stale_summary_pages.extend
                      if sparse_budget is not None else None),
        )
        self.prefix = (
            PrefixCache(
                self.alloc,
                cfg.page_size,
                spill=spill_tier,
                read_page=self._read_page if spill_tier else None,
                write_page=self._write_page if spill_tier else None,
            )
            if enable_prefix_cache
            else None
        )
        # per-query export (VERDICT r1 §5 row 76): one JSON line per
        # finished query — the reference logs these SLO fields per query
        # in sched/metrics; here it's an append-only JSONL file
        self._request_log_path = os.environ.get("KT_REQUEST_LOG")
        self.scheduler = Scheduler(
            cfg, self.alloc, self.prefix,
            on_finish=self._log_request if self._request_log_path else None,
        )
        self.compute_dtype = compute_dtype
        self.rope_tables = precompute_rope_tables(spec.rope)
        self._steps = {}
        # per-slot device-side sampling state (lazy; only allocated once a
        # query with repetition/presence/frequency penalties joins)
        self._counts = None  # [max_batch, V] int32 generated-token counts
        self._pmask = None  # [max_batch, V] bool prompt occurrence
        self._key = jax.random.PRNGKey(0)
        # decode pipeline: device-resident batch state + in-flight steps
        # whose tokens have not been read back yet (see step())
        self._dstate = None
        self._decode_sig = None
        self._inflight = []
        # max unresolved decode steps in flight before a blocking resolve
        # of the oldest (see step()). Measured at batch 8 (16B int4, one
        # v5e behind the tunnel, device step 16.4 ms): no pipeline
        # 51 ms/step, depth 2 -> 31 ms, depth 3 -> 26 ms (300 out-tok/s);
        # deeper queues trip tunnel backpressure and slow dispatch itself.
        # Cost of depth: tokens reach the scheduler `depth` steps late
        # (a finished query decodes a few extra tokens into its lookahead
        # page, then they're dropped).
        self.decode_pipeline_depth = int(
            os.environ.get("KT_DECODE_PIPELINE", "3")
        )
        # how many prefill chunks ride the fused mixed step (each extra
        # chunk shares the same weights pass; jit buckets key on the count)
        self._mixed_max_chunks = max(
            1, int(os.environ.get("KT_MIXED_MAX_CHUNKS", "2"))
        )
        from ktransformers_tpu.utils.observability import StageTimer

        # per-stage host profile of the serving loop (enable with
        # KT_FORWARD_TIME_PROFILE=1; engine.timer.report() / /metrics)
        self.timer = StageTimer()
        self.check_numerics = (
            os.environ.get("KT_CHECK_NUMERICS", "0") == "1"
        )
        self.collect_routing = collect_routing
        self.stats = None
        if collect_routing and spec.moe is not None:
            from ktransformers_tpu.utils.expert_placement import (
                ExpertStatsCollector,
            )

            n_moe = sum(
                1 for li in range(spec.num_layers)
                if spec.moe.is_moe_layer(li)
            )
            self.stats = ExpertStatsCollector(n_moe, spec.moe.num_experts)
        self._lock = threading.Lock()
        self._running = False
        self._thread = None
        self.steps_executed = 0

    # -- page spill callbacks (kvc2 CudaStreamManager role) -----------------

    def _read_page(self, pid: int) -> dict:
        """Copy one page's KV (all layers) to host numpy."""
        out = {}
        for li in range(len(self.kv.bufs_a)):
            out[f"a{li}"] = np.asarray(self.kv.bufs_a[li][pid])
            out[f"b{li}"] = np.asarray(self.kv.bufs_b[li][pid])
        return out

    def _write_page(self, pid: int, payload: dict) -> None:
        """Upload a spilled page back into the device pool."""
        new_a = list(self.kv.bufs_a)
        new_b = list(self.kv.bufs_b)
        for li in range(len(new_a)):
            new_a[li] = new_a[li].at[pid].set(jnp.asarray(payload[f"a{li}"]))
            new_b[li] = new_b[li].at[pid].set(jnp.asarray(payload[f"b{li}"]))
        self.kv = PagedKVCache(
            bufs_a=new_a, bufs_b=new_b, page_size=self.kv.page_size
        )

    # -- jitted steps -------------------------------------------------------

    def _prefill_step(self, s: int):
        """One compiled step per BUCKET size; chunk remainders are padded
        into the bucket with trash-page writes (no per-length recompiles —
        the r1 unbounded-compile fix)."""
        name = ("prefill", s)
        if name not in self._steps:
            spec, rope, cdt = self.spec, self.rope_tables, self.compute_dtype

            @partial(jax.jit, donate_argnums=(2,))
            def step(params, tokens, kv, page_table, length, valid, slot):
                return forward_paged(
                    params,
                    spec,
                    tokens,
                    kv,
                    page_table,
                    length,
                    rope_tables=rope,
                    compute_dtype=cdt,
                    logits_last_only=True,
                    valid=valid,
                    slots=slot,
                )

            self._steps[name] = partial(step, self.params)
        return self._steps[name]

    def _bucket(self, n: int) -> int:
        b = 16
        while b < n:
            b *= 2
        return b

    def _decode_step(self, b: int, penalized: bool):
        """Two step variants: 'basic' samples with per-row temperature /
        top-k / top-p; 'penalized' additionally carries the [B, V]
        generated-token counts + prompt mask on device (penaltylib analog).
        The engine picks per step based on the active queries, so default
        requests never pay the penalty arrays."""
        name = ("decode", b, penalized)
        if name not in self._steps:
            spec, rope, cdt = self.spec, self.rope_tables, self.compute_dtype

            # Steps are CHAINABLE: they consume tokens [B] + lengths [B]
            # and return the next tokens and lengths+active, so the engine
            # can dispatch step N+1 from step N's device outputs without a
            # host round-trip (plan/execute overlap — the reference's
            # balance_serve.py:323-381 async loop; over the axon tunnel a
            # blocking readback costs ~10x the device step).
            if penalized:

                @partial(jax.jit, donate_argnums=(2, 12))
                def step(params, tokens, kv, page_tables, lengths, key,
                         temps, top_ks, top_ps, reps, press, freqs,
                         counts, pmask, active):
                    out = forward_paged(
                        params, spec, tokens[:, None], kv, page_tables,
                        lengths, rope_tables=rope, compute_dtype=cdt,
                        logits_last_only=True,
                        collect_routing=self.collect_routing,
                        sparse_budget=self.sparse_budget,
                        sparse_anchor=self.sparse_anchor,
                        sparse_retrieval=self.sparse_retrieval,
                        # hybrid models: inactive padding rows must not
                        # advance their slot's GatedDeltaNet state
                        valid=active.astype(jnp.int32)
                        if self._hybrid else None,
                    )
                    logits, kv = out[0], out[1]
                    routing = out[2] if self.collect_routing else jnp.zeros(())
                    key, sub = jax.random.split(key)
                    toks = sample_batched(
                        logits[:, -1], sub, temps,
                        top_ks=top_ks, top_ps=top_ps, rep_pens=reps,
                        pres_pens=press, freq_pens=freqs,
                        token_counts=counts, prompt_mask=pmask,
                    )
                    bsz = toks.shape[0]
                    counts = counts.at[jnp.arange(bsz), toks].add(
                        active.astype(jnp.int32)
                    )
                    lengths = lengths + active.astype(jnp.int32)
                    return toks, kv, key, lengths, counts, routing

            else:

                @partial(jax.jit, donate_argnums=(2,))
                def step(params, tokens, kv, page_tables, lengths, key,
                         temps, top_ks, top_ps, active):
                    out = forward_paged(
                        params, spec, tokens[:, None], kv, page_tables,
                        lengths, rope_tables=rope, compute_dtype=cdt,
                        logits_last_only=True,
                        collect_routing=self.collect_routing,
                        sparse_budget=self.sparse_budget,
                        sparse_anchor=self.sparse_anchor,
                        sparse_retrieval=self.sparse_retrieval,
                        # hybrid models: inactive padding rows must not
                        # advance their slot's GatedDeltaNet state
                        valid=active.astype(jnp.int32)
                        if self._hybrid else None,
                    )
                    logits, kv = out[0], out[1]
                    routing = out[2] if self.collect_routing else jnp.zeros(())
                    key, sub = jax.random.split(key)
                    toks = sample_batched(
                        logits[:, -1], sub, temps,
                        top_ks=top_ks, top_ps=top_ps,
                    )
                    lengths = lengths + active.astype(jnp.int32)
                    return toks, kv, key, lengths, routing

            self._steps[name] = lambda *a, _s=step: _s(self.params, *a)
        return self._steps[name]

    def _mixed_step(self, bucket: int, n_chunks: int = 1):
        """ONE jitted program for a mixed batch: decode batch + up to
        KT_MIXED_MAX_CHUNKS prefill chunks (distinct queries) share every
        dense/MoE weights pass (forward_paged_mixed; VERDICT r3 item 4 —
        separate programs re-streamed the full model bytes per chunk;
        r4 item 5 extended the fusion past one chunk)."""
        name = ("mixed", bucket, n_chunks)
        if name not in self._steps:
            spec, rope, cdt = self.spec, self.rope_tables, self.compute_dtype

            @partial(jax.jit, donate_argnums=(2,))
            def step(params, dec_tokens, kv, dec_tables, dec_lengths, key,
                     temps, top_ks, top_ps, active,
                     pre_tokens, pre_table, pre_length, pre_valid):
                from ktransformers_tpu.models.paged import (
                    forward_paged_mixed,
                )

                dec_logits, pre_logits, kv = forward_paged_mixed(
                    params, spec, dec_tokens, pre_tokens, kv,
                    dec_tables, dec_lengths, pre_table, pre_length,
                    pre_valid, rope_tables=rope, compute_dtype=cdt,
                    sparse_budget=self.sparse_budget,
                    sparse_anchor=self.sparse_anchor,
                    sparse_retrieval=self.sparse_retrieval,
                )
                key, sub = jax.random.split(key)
                toks = sample_batched(
                    dec_logits, sub, temps, top_ks=top_ks, top_ps=top_ps
                )
                lengths = dec_lengths + active.astype(jnp.int32)
                return toks, kv, key, lengths, pre_logits

            self._steps[name] = lambda *a, _s=step: _s(self.params, *a)
        return self._steps[name]

    def _can_fuse_mixed(self, qs: list[Query]) -> bool:
        from ktransformers_tpu.models import paged as paged_model

        return (
            os.environ.get("KT_FUSED_MIXED", "1") != "0"
            and not self._hybrid
            and not self.collect_routing
            and not any(q.sampling.needs_counts for q in qs)
            and paged_model._PAGED_MLA_DECODE is not None
            and paged_model._PAGED_MLA_PREFILL is not None
            and paged_model._PAGED_GQA_DECODE is not None
            and paged_model._PAGED_GQA_PREFILL is not None
        )

    # -- execution ----------------------------------------------------------

    def _pad_table(self, pages: list[int]) -> np.ndarray:
        pt = np.zeros(self.cfg.max_pages_per_query, np.int32)
        pt[: len(pages)] = pages
        return pt

    def _init_slot_state(self, q: Query) -> None:
        """(Re)build the query's per-slot device sampling state — generated
        token counts + prompt mask — from host bookkeeping (fresh queries
        after their first token; preempted queries on resume)."""
        v = self.spec.vocab_size
        b = self.cfg.max_batch_size
        if self._counts is None:
            self._counts = jnp.zeros((b, v), jnp.int32)
            self._pmask = jnp.zeros((b, v), bool)
        row = np.zeros((v,), np.int32)
        for t in q.output_ids:
            row[t] += 1
        pm = np.zeros((v,), bool)
        pm[np.asarray(q.prompt, np.int64)] = True
        self._counts = self._counts.at[q.slot].set(jnp.asarray(row))
        self._pmask = self._pmask.at[q.slot].set(jnp.asarray(pm))

    def _first_token(self, q: Query, logits) -> int:
        """Sample the first generated token from the last prefill logits,
        honoring the query's full sampling config."""
        from ktransformers_tpu.engine.sampler import sample

        self._key, sub = jax.random.split(self._key)
        sc = q.sampling
        v = logits.shape[-1]
        counts = pmask = None
        if sc.needs_counts:
            pm = np.zeros((1, v), bool)
            pm[0, np.asarray(q.prompt, np.int64)] = True
            pmask = jnp.asarray(pm)
            counts = jnp.zeros((1, v), jnp.int32)
        return int(
            sample(logits, sub, sc, token_counts=counts, prompt_mask=pmask)[0]
        )

    def _reset_linear_state(self, slot: int) -> None:
        """Zero a slot's GatedDeltaNet states before its (re)prefill —
        recurrent state, unlike KV pages, is reused by slot index."""
        new_a = list(self.kv.bufs_a)
        new_b = list(self.kv.bufs_b)
        for li in range(self.spec.num_layers):
            if self.spec.layer_kind(li) == "linear":
                new_a[li] = new_a[li].at[slot].set(0)
                new_b[li] = new_b[li].at[slot].set(0)
        self.kv = dataclasses.replace(self.kv, bufs_a=new_a, bufs_b=new_b)

    def _dispatch_prefill(self, q: Query, chunk: list[int]):
        """Async-dispatch one bucketed prefill chunk; returns the logits
        future ([1, 1, V], taken at the last VALID position)."""
        if self._hybrid and q.prefill_pos == 0:
            self._reset_linear_state(q.slot)
        bucket = self._bucket(len(chunk))
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, : len(chunk)] = chunk
        step = self._prefill_step(bucket)
        logits, self.kv = step(
            jnp.asarray(tokens),
            self.kv,
            jnp.asarray(self._pad_table(q.pages))[None],
            jnp.asarray([q.prefill_pos], jnp.int32),
            jnp.asarray([len(chunk)], jnp.int32),
            jnp.asarray([q.slot], jnp.int32),
        )
        return logits

    def _finish_prefill(self, q: Query, chunk: list[int], logits) -> None:
        self.scheduler.prefill_done_chunk(q, len(chunk))
        if q.state != DECODE:
            return
        if not q.resumed:
            # first generated token comes from the last prefill logits;
            # resumed (preempted) queries already hold their last token
            self.scheduler.push_token(
                q, self._first_token(q, logits[:, -1])
            )
        if q.state == DECODE and q.sampling.needs_counts:
            self._init_slot_state(q)

    def _ensure_decode_pages(self, qs: list[Query]) -> list[Query]:
        """Guarantee every decoding query a page for its next token,
        preempting the newest queries under page exhaustion instead of
        raising (reference: kvc2 eviction; FCFS order is preserved — the
        oldest query always survives)."""
        qs = list(qs)
        # lookahead: with k steps in flight the device length runs k ahead
        # of host total_len, so the next step writes KV at up to
        # total_len + k; keep the +1 margin on top
        ahead = 1 + len(self._inflight) + 1
        while qs:
            failed = None
            for q in qs:
                if not self.scheduler._ensure_pages(q, q.total_len + ahead):
                    failed = q
                    break
            if failed is None:
                return qs
            victim = max(qs, key=lambda q: q.id)
            self.scheduler.preempt(victim)
            qs.remove(victim)
        return qs

    def _decode_signature(self, qs: list[Query], penalized: bool):
        """Device decode state stays valid while the batch composition,
        sampling configs, and page tables are unchanged."""
        return (
            penalized,
            tuple((q.id, q.slot, len(q.pages), q.sampling) for q in qs),
        )

    def _build_decode_state(self, qs: list[Query], penalized: bool) -> dict:
        """Host -> device upload of the full decode-batch state. Packs the
        per-row f32 sampling params into ONE transfer — over the axon
        tunnel each jnp.asarray is a round-trip, and ~10 of them per step
        was most of the old 200 ms step wall."""
        b = self.cfg.max_batch_size  # fixed shape (CUDA-graph bucket analog)
        tokens = np.zeros((b,), np.int32)
        tables = np.zeros((b, self.cfg.max_pages_per_query), np.int32)
        lengths = np.zeros((b,), np.int32)
        fpack = np.zeros((6, b), np.float32)  # temps/top_p/rep/pres/freq/act
        fpack[1] = 1.0
        fpack[2] = 1.0
        top_ks = np.zeros((b,), np.int32)
        for q in qs:
            # rows indexed by the query's stable slot: the token being
            # decoded is the last generated one; its KV gets written at
            # position total_len - 1
            i = q.slot
            tokens[i] = q.last_token
            tables[i] = self._pad_table(q.pages)
            lengths[i] = q.total_len - 1
            sc = q.sampling
            fpack[0, i] = sc.temperature
            top_ks[i] = sc.top_k
            fpack[1, i] = sc.top_p
            fpack[2, i] = sc.repetition_penalty
            fpack[3, i] = sc.presence_penalty
            fpack[4, i] = sc.frequency_penalty
            fpack[5, i] = 1.0
        ints = np.concatenate(
            [tokens[None], lengths[None], top_ks[None], tables.T]
        )  # [3 + P, b] int32 — one transfer
        ints_d = jnp.asarray(ints)
        f_d = jnp.asarray(fpack)
        return dict(
            tokens=ints_d[0],
            lengths=ints_d[1],
            top_ks=ints_d[2],
            tables=ints_d[3:].T,
            temps=f_d[0],
            top_ps=f_d[1],
            reps=f_d[2],
            press=f_d[3],
            freqs=f_d[4],
            active=f_d[5],
        )

    def _dispatch_decode(self, qs: list[Query]):
        """Dispatch one decode step from device-resident state and enqueue
        its outputs for a later (overlapped) readback."""
        penalized = any(q.sampling.needs_counts for q in qs)
        sig = self._decode_signature(qs, penalized)
        if sig != self._decode_sig:
            self._drain_decode()
            # the drain delivers pending tokens, which may FINISH (or
            # preempt) members of qs — dispatching for them afterwards
            # would snapshot a freed slot and waste a step
            qs = [q for q in qs if q.state == DECODE]
            if not qs:
                self._decode_sig = None
                return
            penalized = any(q.sampling.needs_counts for q in qs)
            self._dstate = self._build_decode_state(qs, penalized)
            self._decode_sig = self._decode_signature(qs, penalized)
        st = self._dstate
        step = self._decode_step(self.cfg.max_batch_size, penalized)
        if penalized:
            (toks, self.kv, self._key, st["lengths"], self._counts,
             routing) = step(
                st["tokens"], self.kv, st["tables"], st["lengths"],
                self._key, st["temps"], st["top_ks"], st["top_ps"],
                st["reps"], st["press"], st["freqs"],
                self._counts, self._pmask, st["active"],
            )
        else:
            toks, self.kv, self._key, st["lengths"], routing = step(
                st["tokens"], self.kv, st["tables"], st["lengths"],
                self._key, st["temps"], st["top_ks"], st["top_ps"],
                st["active"],
            )
        st["tokens"] = toks
        try:
            toks.copy_to_host_async()
        except Exception:  # pragma: no cover - backend-dependent
            pass
        # snapshot slots: a query preempted/finished while in flight has
        # its slot freed (possibly reused only after the drain that any
        # composition change forces)
        self._inflight.append(([(q, q.slot) for q in qs], toks, routing))

    def _drain_decode(self) -> None:
        while self._inflight:
            self._resolve_decode(*self._inflight.pop(0))

    def _resolve_decode(self, qs_slots, toks, routing=None) -> None:
        toks_np = np.asarray(toks)
        if self.check_numerics:
            from ktransformers_tpu.utils.observability import check_numerics

            check_numerics(toks_np, "decode tokens")
        if self.stats is not None and routing is not None:
            r = np.asarray(routing)  # [n_moe, B, k] logical expert ids
            slots = [s for _, s in qs_slots]  # active rows at dispatch time
            for l in range(r.shape[0]):
                self.stats.record(l, r[l, slots])
        from ktransformers_tpu.serving.scheduler import DECODE

        for q, slot in qs_slots:
            # skip queries that finished or were preempted while this step
            # was in flight
            if q.state != DECODE or q.slot != slot:
                continue
            self.scheduler.push_token(q, int(toks_np[slot]))

    def apply_expert_rebalance(self, ep_size: int = 1) -> None:
        """Routing-statistics-driven expert re-placement (stop-the-world):
        rebuild each MoE layer's logical->physical map so per-shard load
        balances under the measured routing skew, permute the stored expert
        weights accordingly, and drop the compiled steps (the next step
        recompiles against the new params). Exactness-preserving: the remap
        is applied to logical ids inside moe_forward. Reference:
        experts-sched-Tutorial.md:172-192 (decode 56.6->70.2 tok/s)."""
        from ktransformers_tpu.utils.expert_placement import (
            balanced_logical_to_physical,
            reorder_expert_weights,
        )

        assert self.stats is not None, "collect_routing not enabled"
        freqs = self.stats.frequencies
        li_moe = 0
        new_layers = []
        for li, lp in enumerate(self.params["layers"]):
            if "moe" not in lp:
                new_layers.append(lp)
                continue
            l2p = balanced_logical_to_physical(freqs[li_moe], ep_size)
            moe = dict(lp["moe"])
            moe["experts"] = reorder_expert_weights(moe["experts"], l2p)
            new_layers.append({**lp, "moe": moe})
            li_moe += 1
        self.params = {**self.params, "layers": new_layers}
        self._steps.clear()
        self._drain_decode()
        self._decode_sig = None  # device decode state must be rebuilt

    def step(self) -> bool:
        """Run one mixed scheduler batch (decode batch + ≤2 prefill chunks,
        async-dispatched back-to-back); returns False when idle.

        Decode-only steps are PIPELINED: step N is dispatched from device-
        resident state before step N-1's tokens are read back, so the
        tunnel round-trip overlaps the device step (the reference's
        plan/execute overlap, balance_serve.py:323-381). The scheduler sees
        tokens one step late; a finished query costs one extra (harmless)
        device step into its lookahead page."""
        self.timer.stage("schedule")
        plan = self.scheduler.next_batch()
        if plan is None:
            self._drain_decode()  # deliver tail tokens before going idle
            self.timer.end()
            return False
        if self._stale_summary_pages:
            # recycled pages carry the previous occupant's key extremes;
            # clear before any step reads their bounds
            self.kv = self.kv.reset_page_summaries(self._stale_summary_pages)
            self._stale_summary_pages.clear()
        decode_qs = (
            self._ensure_decode_pages(plan.decode) if plan.decode else []
        )
        self.timer.stage("dispatch")
        pending = []
        if (
            decode_qs and plan.prefills
            and self._can_fuse_mixed(decode_qs)
        ):
            # FUSED mixed step: flush the pipeline (its tokens may finish
            # members of the batch), then run decode + the first prefill
            # chunk as one program
            self._drain_decode()
            decode_qs = [q for q in decode_qs if q.state == DECODE]
        if (
            decode_qs and plan.prefills
            and self._can_fuse_mixed(decode_qs)
        ):
            sig = self._decode_signature(decode_qs, False)
            if sig != self._decode_sig:
                self._dstate = self._build_decode_state(decode_qs, False)
                self._decode_sig = sig
            st = self._dstate
            fused = plan.prefills[: self._mixed_max_chunks]
            c = len(fused)
            bucket = self._bucket(max(len(ch) for _, ch in fused))
            pt = np.zeros((c, bucket), np.int32)
            tables = np.zeros((c, self.cfg.max_pages_per_query), np.int32)
            poss = np.zeros((c,), np.int32)
            valids = np.zeros((c,), np.int32)
            for i, (qq, ch) in enumerate(fused):
                pt[i, : len(ch)] = ch
                tables[i] = self._pad_table(qq.pages)
                poss[i] = qq.prefill_pos
                valids[i] = len(ch)
            step = self._mixed_step(bucket, c)
            toks, self.kv, self._key, st["lengths"], pre_logits = step(
                st["tokens"], self.kv, st["tables"], st["lengths"],
                self._key, st["temps"], st["top_ks"], st["top_ps"],
                st["active"],
                jnp.asarray(pt),
                jnp.asarray(tables),
                jnp.asarray(poss),
                jnp.asarray(valids),
            )
            st["tokens"] = toks
            self._resolve_decode([(qq, qq.slot) for qq in decode_qs], toks)
            for i, (qq, ch) in enumerate(fused):
                pending.append((qq, ch, pre_logits[i : i + 1, None]))
            for q2, c2 in plan.prefills[c:]:
                pending.append((q2, c2, self._dispatch_prefill(q2, c2)))
            self.timer.stage("readback")
        else:
            # dispatch everything (decode first — its tokens resolve
            # first) before reading anything back: prefill chunks execute
            # behind the decode step on-device while the host is already
            # collecting tokens
            if decode_qs:
                self._dispatch_decode(decode_qs)
            for q, chunk in plan.prefills:
                pending.append((q, chunk, self._dispatch_prefill(q, chunk)))
            self.timer.stage("readback")
            if pending:
                # mixed step: prefill completions change the batch
                # composition, so flush the decode pipeline now
                self._drain_decode()
            elif len(self._inflight) >= self.decode_pipeline_depth:
                # blocking resolve of the oldest step. Counter-intuitively
                # this beats is_ready()-gated non-blocking pacing (300 vs
                # 154-240 tok/s measured at batch 8): while the asarray
                # blocks one tunnel RTT, the next in-flight steps finish
                # computing and their async copies land, so the following
                # resolves are free — the RTT amortizes over `depth`
                # steps. Fine-grained polling instead paid transfer
                # latency (or tunnel backpressure at depth>4) on every
                # single step.
                self._resolve_decode(*self._inflight.pop(0))
        self.timer.stage("bookkeeping")
        for q, chunk, logits in pending:
            self._finish_prefill(q, chunk, logits)
        self.timer.end()
        self.steps_executed += 1
        return True

    # -- public API ---------------------------------------------------------

    def submit(self, prompt, **kw) -> Query:
        with self._lock:
            return self.scheduler.add_query(list(prompt), **kw)

    def cancel(self, q: Query) -> None:
        """Abort a query (client disconnect / assistants run cancel). An
        in-flight pipelined step that still references it resolves
        harmlessly — _resolve_decode skips non-DECODE queries."""
        with self._lock:
            self.scheduler.cancel(q)

    def _log_request(self, q: Query) -> None:
        import json

        rec = {
            "id": q.id,
            "prompt_tokens": len(q.prompt),
            "output_tokens": len(q.output_ids),
            "matched_prefix_tokens": q.matched_len,
            "ttft_s": round(q.ttft, 4) if q.ttft is not None else None,
            "tbt_s": round(q.tbt, 5) if q.tbt is not None else None,
            "finish_reason": q.finish_reason,
            "preemptions": q.preemptions,
            "wall_s": round((q.finished_at or 0) - q.created, 3),
            "ts": time.time(),
        }
        with open(self._request_log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def generate_sync(self, prompt, **kw) -> list[int]:
        """Blocking single-query helper (tests / CLI)."""
        q = self.submit(prompt, **kw)
        while q.state != "done":
            with self._lock:
                if not self.step():
                    time.sleep(0.001)
        return list(q.output_ids)

    def run_forever(self, poll_s: float = 0.002) -> None:
        self._running = True
        while self._running:
            with self._lock:
                busy = self.step()
            if not busy:
                time.sleep(poll_s)

    def start(self) -> None:
        self._thread = threading.Thread(target=self.run_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread:
            self._thread.join(timeout=5)

    def metrics(self) -> dict:
        m = self.scheduler.metrics()
        m["engine_steps"] = self.steps_executed
        return m

    def reset_metrics(self) -> None:
        """Forget finished-query stats (e.g. after a compile-warmup wave)."""
        self.scheduler.finished.clear()
        self.steps_executed = 0
        self.timer.totals.clear()
        self.timer.counts.clear()
