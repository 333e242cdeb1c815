"""FCFS continuous-batching scheduler with chunked prefill and paged KV.

Host-side re-design of the reference's C++ scheduler
(archive/csrc/balance_serve/sched/scheduler.cpp): the query state machine
Received -> Prefill(plan_position = matched_length) -> Decode -> Done
(Query::to_status scheduler.cpp:737-795), chunked prefill with a token
budget (recommended_chunk_prefill_token_count, :441-446), decode batches
capped at max_batch_size (:447-475), and kvc2 prefix matching before
prefill (lookup_to_gpu_async). SLO bookkeeping (TTFT/TBT, scheduler.h:
154-155) is recorded per query.
"""

from __future__ import annotations

import dataclasses
import itertools
import queue
import time
from typing import Optional

from ktransformers_tpu.cache.paged import PageAllocator
from ktransformers_tpu.cache.prefix import PrefixCache
from ktransformers_tpu.engine.sampler import SamplingConfig

RECEIVED, PREFILL, DECODE, DONE = "received", "prefill", "decode", "done"


@dataclasses.dataclass
class Query:
    id: int
    prompt: list[int]
    max_new_tokens: int = 128
    sampling: SamplingConfig = SamplingConfig()
    eos_token_id: int | None = None
    state: str = RECEIVED
    # fixed decode-batch row while running (stable so per-slot device-side
    # sampling state — token counts — follows the query across steps)
    slot: int | None = None
    # progress
    prefill_pos: int = 0  # prompt tokens already in KV (incl. prefix match)
    matched_len: int = 0
    pages: list[int] = dataclasses.field(default_factory=list)
    prefix_pages: int = 0  # leading pages borrowed from the prefix cache
    output_ids: list[int] = dataclasses.field(default_factory=list)
    last_token: int | None = None
    # True after a preemption: the query re-prefills its full context
    # (prompt + generated so far) and resumes decoding without re-sampling
    # a "first" token (reference: kvc2 eviction + Received re-entry,
    # scheduler.cpp:737-795)
    resumed: bool = False
    preemptions: int = 0

    @property
    def context_ids(self) -> list[int]:
        """Token ids whose KV must exist to continue this query."""
        return self.prompt + self.output_ids

    @property
    def prefill_target(self) -> int:
        """How far prefill must run: fresh queries stop before sampling the
        first token from the final chunk's logits; resumed queries stop one
        short (the last generated token is fed through the decode step)."""
        n = len(self.context_ids)
        return n - 1 if self.resumed else len(self.prompt)
    # streaming + SLO metrics
    out_queue: "queue.Queue" = dataclasses.field(default_factory=queue.Queue)
    created: float = dataclasses.field(default_factory=time.monotonic)
    first_token_at: float | None = None
    finished_at: float | None = None
    finish_reason: str | None = None

    @property
    def total_len(self) -> int:
        return len(self.prompt) + len(self.output_ids)

    @property
    def ttft(self) -> float | None:
        if self.first_token_at is None:
            return None
        return self.first_token_at - self.created

    @property
    def tbt(self) -> float | None:
        """Mean time-between-tokens over the decode phase (SLO field of the
        reference scheduler, scheduler.h:154-155)."""
        if (
            self.finished_at is None
            or self.first_token_at is None
            or len(self.output_ids) < 2
        ):
            return None
        return (self.finished_at - self.first_token_at) / (
            len(self.output_ids) - 1
        )


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    max_batch_size: int = 8
    prefill_chunk: int = 256
    max_pages_per_query: int = 32
    page_size: int = 64
    max_queue: int = 512
    # ≤N prefill chunks ride along with each decode step (reference: ≤2
    # prefill minibatches per BatchQueryTodo, scheduler.cpp:441-446)
    max_prefills_per_step: int = 2


@dataclasses.dataclass
class BatchPlan:
    """One engine step's work: a decode batch AND up to `max_prefills`
    prefill chunks execute back-to-back (async-dispatched together), the
    analog of the reference's mixed ForwardBatch of ≤2 prefill minibatches
    + decode minibatches (sched/scheduler.cpp:441-475)."""

    decode: list[Query] = dataclasses.field(default_factory=list)
    prefills: list[tuple[Query, list[int]]] = dataclasses.field(
        default_factory=list
    )

    # compat helpers for r1-style call sites/tests
    @property
    def kind(self) -> str:
        if self.prefills and not self.decode:
            return "prefill"
        if self.decode and not self.prefills:
            return "decode"
        return "mixed"

    @property
    def queries(self) -> list[Query]:
        return [q for q, _ in self.prefills] + self.decode


class Scheduler:
    """FCFS: one prefill chunk per step while prefill work exists, decode
    batches otherwise (the reference interleaves ≤2 prefill minibatches with
    decode; strategy `FCFS_single_prefill`, scheduler.cpp:826)."""

    def __init__(
        self,
        cfg: SchedulerConfig,
        allocator: PageAllocator,
        prefix_cache: PrefixCache | None = None,
        on_finish=None,  # callback(q) after a query completes — the
        # per-query metrics export hook (engine's request log)
    ):
        self.cfg = cfg
        self.alloc = allocator
        self.prefix = prefix_cache
        self.on_finish = on_finish
        self.waiting: list[Query] = []
        self.running: list[Query] = []
        self._ids = itertools.count()
        self._free_slots = list(range(cfg.max_batch_size))
        self.finished: list[Query] = []

    # -- intake ------------------------------------------------------------

    def add_query(
        self,
        prompt: list[int],
        max_new_tokens: int = 128,
        sampling: SamplingConfig = SamplingConfig(),
        eos_token_id: int | None = None,
    ) -> Query:
        if len(self.waiting) >= self.cfg.max_queue:
            raise RuntimeError("scheduler queue full")
        q = Query(
            id=next(self._ids),
            prompt=list(prompt),
            max_new_tokens=max_new_tokens,
            sampling=sampling,
            eos_token_id=eos_token_id,
        )
        self.waiting.append(q)
        return q

    # -- planning ----------------------------------------------------------

    def _pages_needed(self, q: Query, upto_len: int) -> int:
        ps = self.cfg.page_size
        return (upto_len + ps - 1) // ps

    def _ensure_pages(self, q: Query, upto_len: int) -> bool:
        need = self._pages_needed(q, upto_len) - len(q.pages)
        if need <= 0:
            return True
        if self.alloc.free_count < need:
            if self.prefix is not None:
                self.prefix.trim(need)
            if self.alloc.free_count < need:
                return False
        q.pages.extend(self.alloc.alloc(need))
        return True

    def _admit(self) -> None:
        """Move waiting queries into running (prefill) while pages allow."""
        while self.waiting and len(self.running) < self.cfg.max_batch_size:
            q = self.waiting[0]
            if q.state == RECEIVED:
                if self.prefix is not None:
                    matched, pages = self.prefix.lookup(q.context_ids[:-1])
                    # never match the full context: the last token must be
                    # prefilled/decoded to produce the next logits
                    q.matched_len = matched
                    q.prefill_pos = matched
                    q.pages = list(pages)
                    q.prefix_pages = len(pages)
                q.state = PREFILL
            if not self._ensure_pages(
                q,
                min(q.prefill_target, q.prefill_pos + self.cfg.prefill_chunk),
            ):
                break  # no memory; keep FCFS order
            self.waiting.pop(0)
            q.slot = self._free_slots.pop(0)
            self.running.append(q)

    def next_batch(self) -> BatchPlan | None:
        """One step's work (the analog of BatchQueryTodo): the decode batch
        plus ≤max_prefills_per_step prefill chunks — decode never stalls
        behind a long prompt (the r1 head-of-line blocking fix)."""
        self._admit()
        decoding = [q for q in self.running if q.state == DECODE][
            : self.cfg.max_batch_size
        ]
        prefills = []
        chunk_budget = self.cfg.prefill_chunk
        if not decoding:
            # idle decode lane: double the chunk (reference doubles the
            # single prefill's chunk when there is room, scheduler.cpp:441)
            chunk_budget *= 2
        for q in self.running:
            if len(prefills) >= self.cfg.max_prefills_per_step:
                break
            if q.state != PREFILL:
                continue
            end = min(q.prefill_target, q.prefill_pos + chunk_budget)
            if end <= q.prefill_pos or not self._ensure_pages(q, end):
                continue
            prefills.append((q, q.context_ids[q.prefill_pos : end]))
        if not decoding and not prefills:
            return None
        return BatchPlan(decode=decoding, prefills=prefills)

    # -- updates -----------------------------------------------------------

    def prefill_done_chunk(self, q: Query, chunk_len: int) -> None:
        q.prefill_pos += chunk_len
        if q.prefill_pos >= q.prefill_target:
            q.state = DECODE

    def preempt(self, q: Query) -> None:
        """Release a running query's pages under memory pressure and requeue
        it (front of the waiting line) to re-prefill its full context later.
        Already-streamed tokens are kept; decoding resumes afterwards
        (reference analog: kvc2 eviction + query re-preparation)."""
        if q in self.running:
            self.running.remove(q)
        if q.slot is not None:
            self._free_slots.append(q.slot)
            self._free_slots.sort()
            q.slot = None
        self.alloc.release(q.pages)
        q.pages = []
        q.prefix_pages = 0
        q.prefill_pos = 0
        q.matched_len = 0
        q.resumed = True
        q.preemptions += 1
        q.state = RECEIVED
        self.waiting.insert(0, q)

    def push_token(self, q: Query, token: int) -> None:
        if q.first_token_at is None:
            q.first_token_at = time.monotonic()
        q.output_ids.append(token)
        q.last_token = token
        q.out_queue.put(token)
        stop = (
            q.eos_token_id is not None and token == q.eos_token_id
        ) or len(q.output_ids) >= q.max_new_tokens
        if stop:
            self.finish(
                q,
                "stop"
                if q.eos_token_id is not None and token == q.eos_token_id
                else "length",
            )

    def finish(self, q: Query, reason: str) -> None:
        q.state = DONE
        q.finish_reason = reason
        q.finished_at = time.monotonic()
        q.out_queue.put(None)  # sentinel
        if q in self.running:
            self.running.remove(q)
        if q.slot is not None:
            self._free_slots.append(q.slot)
            self._free_slots.sort()
            q.slot = None
        # hand fully-written context pages (prompt + generated — multi-turn
        # reuse) to the prefix cache, then drop our references
        if self.prefix is not None and q.prompt:
            ps = self.cfg.page_size
            # KV coverage: everything prefilled, plus every decoded token
            # except the final sampled one (its KV was never written)
            covered = (
                q.total_len - 1
                if q.first_token_at is not None
                else q.prefill_pos
            )
            full = min(len(q.context_ids), max(covered, 0)) // ps
            self.prefix.insert(q.context_ids[: full * ps], q.pages[:full])
        self.alloc.release(q.pages)
        q.pages = []
        self.finished.append(q)
        if self.on_finish is not None:
            self.on_finish(q)

    def cancel(self, q: Query) -> None:
        if q.state == DONE:
            return
        if q in self.waiting:
            self.waiting.remove(q)
        self.finish(q, "cancelled")

    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    @staticmethod
    def _pct(vals: list[float], p: float) -> float:
        if not vals:
            return 0.0
        s = sorted(vals)
        return s[min(len(s) - 1, int(p * len(s)))]

    def metrics(self) -> dict:
        done = [q for q in self.finished if q.ttft is not None]
        with_tbt = [q for q in self.finished if q.tbt is not None]
        total_out = sum(len(q.output_ids) for q in self.finished)
        span = (
            max(q.finished_at for q in self.finished) - self.finished[0].created
            if self.finished
            else 0.0
        )
        return {
            "queries_waiting": len(self.waiting),
            "queries_running": len(self.running),
            "queries_finished": len(self.finished),
            "free_pages": self.alloc.free_count,
            "tokens_generated": total_out,
            "output_tok_s": total_out / span if span > 0 else 0.0,
            "mean_tbt_s": (
                sum(q.tbt for q in with_tbt) / len(with_tbt)
                if with_tbt
                else 0.0
            ),
            "mean_ttft_s": (
                sum(q.ttft for q in done) / len(done) if done else 0.0
            ),
            "p95_ttft_s": self._pct([q.ttft for q in done], 0.95),
            "p95_tbt_s": self._pct([q.tbt for q in with_tbt], 0.95),
            "preemptions": sum(q.preemptions for q in self.finished),
            **(
                {"prefix_" + k: v for k, v in self.prefix.stats().items()}
                if self.prefix
                else {}
            ),
        }
