"""KV cache subsystem: paged HBM cache + page allocator + prefix cache.

TPU re-design of the reference's cache stack: paged GPU caches
(archive/ktransformers/models/custom_cache.py KDeepSeekV3Cache/KGQACache),
the kvc2 3-layer prefix cache (archive/csrc/balance_serve/kvc2), and the
page-table plumbing of BatchQueryTodo (sched/scheduler.h:100-101).
"""

from ktransformers_tpu.cache.paged import PagedKVCache, PageAllocator
from ktransformers_tpu.cache.prefix import PrefixCache

__all__ = ["PagedKVCache", "PageAllocator", "PrefixCache"]
