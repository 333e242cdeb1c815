"""Paged KV cache in HBM + host-side page allocator.

Analog of the reference's paged caches (models/custom_cache.py
KDeepSeekV3Cache: ckv+kpe pages; KGQACache) and of kvc2's GPUPageCache
(kvc2/src/gpu_cache.cpp) which owns the device tensors handed to the
engine. Pages are shared across layers by index: page p of layer l lives at
bufs[l][p], so one page id serves the whole model — same convention as the
reference's block tables (scheduler.cpp:797-824).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ktransformers_tpu.models.spec import ModelSpec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """bufs_a[l]: [P, page, R] (MLA ckv) or [P, page, Hkv, D] (GQA k);
    bufs_b[l]: k_pe / v."""

    bufs_a: list
    bufs_b: list
    # per-page key summaries for sparse decode (ops/sparse_attention.py):
    # smin/smax[l] is [P, Dsum] f32, the elementwise min/max of every key
    # written to that page (MLA: the concat [ckv, k_pe] latent; GQA:
    # [P, Hkv, D]). None = dense only. The extra anchor planes mirror the
    # reference's AnchorType family (kvcache.h:52-99): ssum (BLOCK_MEAN
    # running sum), sfix (FIXED first-key anchor), sdyn (DYNAMIC anchors
    # set by the SnapKV-style observation pass).
    smin: list | None = None
    smax: list | None = None
    ssum: list | None = None
    sfix: list | None = None
    sdyn: list | None = None
    page_size: int = dataclasses.field(metadata=dict(static=True), default=64)

    @property
    def num_pages(self) -> int:
        return self.bufs_a[0].shape[0]

    @staticmethod
    def create(
        spec: ModelSpec, num_pages: int, page_size: int = 64,
        dtype=jnp.bfloat16, summaries: bool = False,
        linear_slots: int = 8,  # state rows for GatedDeltaNet layers of
        # hybrid models (qwen3-next): their "cache" is O(1) per sequence
        # and lives per SLOT, not in the page pool
        anchor: str = "quest",  # which extra anchor planes to allocate
        # when summaries=True: quest/block_max -> min/max only;
        # block_mean -> +ssum; fixed -> +sfix; dynamic -> +sdyn
    ) -> "PagedKVCache":
        a = spec.attention
        if a.kind == "mla":
            sa = (num_pages, page_size, a.kv_lora_rank)
            sb = (num_pages, page_size, a.qk_rope_head_dim)
            ssum = (num_pages, a.kv_lora_rank + a.qk_rope_head_dim)
        else:
            sa = sb = (num_pages, page_size, a.num_kv_heads, a.head_dim)
            ssum = (num_pages, a.num_kv_heads, a.head_dim)
        n = spec.num_layers
        bufs_a, bufs_b = [], []
        for li in range(n):
            if spec.layer_kind(li) == "linear":
                assert not summaries, (
                    "sparse page summaries + hybrid linear layers: "
                    "not supported together yet"
                )
                la = spec.linear_attn
                bufs_a.append(jnp.zeros(
                    (linear_slots, la.conv_kernel, la.conv_dim), dtype
                ))
                bufs_b.append(jnp.zeros(
                    (linear_slots, la.num_v_heads, la.head_k_dim,
                     la.head_v_dim), jnp.float32,
                ))
            else:
                bufs_a.append(jnp.zeros(sa, dtype))
                bufs_b.append(jnp.zeros(sb, dtype))
        def planes(fill):
            return [jnp.full(ssum, fill, jnp.float32) for _ in range(n)]

        return PagedKVCache(
            bufs_a=bufs_a,
            bufs_b=bufs_b,
            smin=planes(jnp.inf) if summaries else None,
            smax=planes(-jnp.inf) if summaries else None,
            ssum=planes(0.0) if summaries and anchor == "block_mean"
            else None,
            sfix=planes(0.0) if summaries and anchor == "fixed" else None,
            sdyn=planes(0.0) if summaries and anchor == "dynamic" else None,
            page_size=page_size,
        )

    def reset_page_summaries(self, pids) -> "PagedKVCache":
        """Clear summaries for freshly (re)allocated pages — stale extremes
        from a previous occupant would loosen the selection bounds."""
        if self.smin is None:
            return self
        import numpy as np

        idx = jnp.asarray(np.asarray(pids, np.int32))
        return dataclasses.replace(
            self,
            smin=[m.at[idx].set(jnp.inf) for m in self.smin],
            smax=[m.at[idx].set(-jnp.inf) for m in self.smax],
            ssum=None if self.ssum is None
            else [m.at[idx].set(0.0) for m in self.ssum],
            sfix=None if self.sfix is None
            else [m.at[idx].set(0.0) for m in self.sfix],
            sdyn=None if self.sdyn is None
            else [m.at[idx].set(0.0) for m in self.sdyn],
        )

    def bytes_per_page(self, spec: ModelSpec) -> int:
        a = self.bufs_a[0]
        b = self.bufs_b[0]
        per_layer = (
            a[0].size * a.dtype.itemsize + b[0].size * b.dtype.itemsize
        )
        return per_layer * len(self.bufs_a)


class PageAllocator:
    """Host-side free-list allocator with refcounts (prefix-cache pages are
    shared across queries). Analog of kvc2's page pool + eviction hooks
    (page_aligned_memory_pool.cpp).

    `reserved` pages at the front are never handed out. The serving engine
    reserves page 0 as a *trash page*: inactive padding rows of the
    fixed-shape decode batch write their KV through a zero page table, and
    those writes must land somewhere no live query reads (their reads are
    position-masked, but the writes are real)."""

    def __init__(self, num_pages: int, reserved: int = 0, on_alloc=None):
        self.num_pages = num_pages
        self.reserved = reserved
        self._free = list(range(num_pages - 1, reserved - 1, -1))
        self._refs = [0] * num_pages
        # callback(list[int]) on every allocation — the sparse-attention
        # engine resets page summaries for recycled pages through this
        self.on_alloc = on_alloc

    @property
    def free_count(self) -> int:
        return len(self._free)

    def alloc(self, n: int = 1) -> list[int]:
        if len(self._free) < n:
            raise MemoryError(
                f"KV page pool exhausted ({n} requested, {len(self._free)} free)"
            )
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._refs[p] = 1
        if self.on_alloc is not None:
            self.on_alloc(pages)
        return pages

    def retain(self, pages: list[int]) -> None:
        for p in pages:
            assert self._refs[p] > 0, f"retain of free page {p}"
            self._refs[p] += 1

    def release(self, pages: list[int]) -> None:
        for p in pages:
            self._refs[p] -= 1
            assert self._refs[p] >= 0, f"double free of page {p}"
            if self._refs[p] == 0:
                self._free.append(p)

    def refcount(self, page: int) -> int:
        return self._refs[page]
