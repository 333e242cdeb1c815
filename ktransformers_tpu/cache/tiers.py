"""Host-DRAM and disk spill tiers for the prefix cache (kvc2's 3 layers).

Reference: kvc2 keeps KV blocks on GPU <-> CPU <-> Disk with prefix-tree
lookup and async page copies (doc/en/prefix_cache.md, kvc2/src/kvc2.h
lookup_to_gpu / raw_insert, async_store.cpp). Here:

- HBM tier   = PrefixCache trie over device pages (cache/prefix.py)
- host tier  = LRU dict of numpy page payloads (this module)
- disk tier  = .npz files under a directory, LRU by mtime (this module)

Eviction from the trie spills the page payload down; a lookup miss in the
trie consults the spill store and re-uploads pages. Keys are hashes of the
*full token prefix* ending at the page (same keying idea as kvc2's token-
array + CacheInfo hash, prefix.cpp).
"""

from __future__ import annotations

import hashlib
import os
from collections import OrderedDict

import numpy as np


def prefix_key(tokens: tuple) -> str:
    h = hashlib.sha256()
    h.update(np.asarray(tokens, np.int64).tobytes())
    return h.hexdigest()[:32]


class HostDiskTier:
    """Two-level spill store for page payloads (dict of numpy arrays)."""

    def __init__(
        self,
        max_host_bytes: int = 1 << 30,
        disk_dir: str | None = None,
        max_disk_bytes: int = 16 << 30,
    ):
        self.max_host_bytes = max_host_bytes
        self.disk_dir = disk_dir
        self.max_disk_bytes = max_disk_bytes
        self._host: OrderedDict[str, dict] = OrderedDict()
        self._host_bytes = 0
        if disk_dir:
            os.makedirs(disk_dir, exist_ok=True)
        self.stats = {"host_hits": 0, "disk_hits": 0, "misses": 0,
                      "spilled": 0}

    @staticmethod
    def _nbytes(payload: dict) -> int:
        return sum(a.nbytes for a in payload.values())

    # -- save (called on HBM eviction) -------------------------------------

    def save(self, key: str, payload: dict) -> None:
        if key in self._host:
            self._host.move_to_end(key)
            return
        self._host[key] = payload
        self._host_bytes += self._nbytes(payload)
        self.stats["spilled"] += 1
        while self._host_bytes > self.max_host_bytes and self._host:
            old_key, old = self._host.popitem(last=False)
            self._host_bytes -= self._nbytes(old)
            self._to_disk(old_key, old)

    def _to_disk(self, key: str, payload: dict) -> None:
        if not self.disk_dir:
            return
        np.savez(os.path.join(self.disk_dir, f"{key}.npz"), **payload)
        self._trim_disk()

    def _trim_disk(self) -> None:
        if not self.disk_dir:
            return
        files = [
            os.path.join(self.disk_dir, f)
            for f in os.listdir(self.disk_dir)
            if f.endswith(".npz")
        ]
        total = sum(os.path.getsize(f) for f in files)
        if total <= self.max_disk_bytes:
            return
        files.sort(key=os.path.getmtime)
        for f in files:
            if total <= self.max_disk_bytes:
                break
            total -= os.path.getsize(f)
            os.remove(f)

    # -- load (called on trie miss) ----------------------------------------

    def load(self, key: str) -> dict | None:
        if key in self._host:
            self._host.move_to_end(key)
            self.stats["host_hits"] += 1
            return self._host[key]
        if self.disk_dir:
            path = os.path.join(self.disk_dir, f"{key}.npz")
            if os.path.exists(path):
                with np.load(path) as z:
                    payload = {k: z[k] for k in z.files}
                self.stats["disk_hits"] += 1
                os.utime(path)  # LRU touch
                return payload
        self.stats["misses"] += 1
        return None
