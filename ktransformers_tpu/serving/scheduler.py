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


@dataclasses.dataclass
class BatchPlan:
    kind: str  # "prefill" | "decode"
    queries: list[Query]
    chunk: Optional[list[int]] = None  # prefill token chunk


class Scheduler:
    """FCFS: one prefill chunk per step while prefill work exists, decode
    batches otherwise (the reference interleaves ≤2 prefill minibatches with
    decode; strategy `FCFS_single_prefill`, scheduler.cpp:826)."""

    def __init__(
        self,
        cfg: SchedulerConfig,
        allocator: PageAllocator,
        prefix_cache: PrefixCache | None = None,
    ):
        self.cfg = cfg
        self.alloc = allocator
        self.prefix = prefix_cache
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
                    matched, pages = self.prefix.lookup(q.prompt[:-1])
                    # never match the full prompt: the last token must be
                    # prefilled to produce first-token logits
                    q.matched_len = matched
                    q.prefill_pos = matched
                    q.pages = list(pages)
                    q.prefix_pages = len(pages)
                q.state = PREFILL
            if not self._ensure_pages(
                q, min(len(q.prompt), q.prefill_pos + self.cfg.prefill_chunk)
            ):
                break  # no memory; keep FCFS order
            self.waiting.pop(0)
            q.slot = self._free_slots.pop(0)
            self.running.append(q)

    def next_batch(self) -> BatchPlan | None:
        """One step's work (the analog of BatchQueryTodo)."""
        self._admit()
        # prefill first: FCFS query with remaining prompt tokens
        for q in self.running:
            if q.state == PREFILL:
                end = min(len(q.prompt), q.prefill_pos + self.cfg.prefill_chunk)
                if not self._ensure_pages(q, end):
                    continue
                chunk = q.prompt[q.prefill_pos : end]
                return BatchPlan(kind="prefill", queries=[q], chunk=chunk)
        decoding = [q for q in self.running if q.state == DECODE]
        if decoding:
            return BatchPlan(
                kind="decode", queries=decoding[: self.cfg.max_batch_size]
            )
        return None

    # -- updates -----------------------------------------------------------

    def prefill_done_chunk(self, q: Query, chunk_len: int) -> None:
        q.prefill_pos += chunk_len
        if q.prefill_pos >= len(q.prompt):
            q.state = DECODE

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
        # hand fully-written prompt pages to the prefix cache, then drop our
        # references
        if self.prefix is not None and q.prompt:
            ps = self.cfg.page_size
            # only fully-written prompt pages (cancelled queries may have
            # prefilled only part of the prompt)
            full = min(len(q.prompt), q.prefill_pos) // ps
            self.prefix.insert(q.prompt[: full * ps], q.pages[:full])
        self.alloc.release(q.pages)
        q.pages = []
        self.finished.append(q)

    def cancel(self, q: Query) -> None:
        if q.state == DONE:
            return
        if q in self.waiting:
            self.waiting.remove(q)
        self.finish(q, "cancelled")

    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

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
            **(
                {"prefix_" + k: v for k, v in self.prefix.stats().items()}
                if self.prefix
                else {}
            ),
        }
