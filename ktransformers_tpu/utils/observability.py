"""Observability: per-stage timers, NaN guards, logging config.

Reference analogs: the FORWARD_TIME_PROFILE per-stage counters
(kt-kernel/operators/amx/moe_base.hpp:186-211), the sanitizer/NaN-check
hooks, and the server logging flags (~80-arg config system). TPU-shaped:
device work is async, so stage timers measure HOST wall segments between
dispatch points (meaningful for the serving loop: schedule / dispatch /
readback / bookkeeping), and NaN checks are explicit jnp.isfinite fences
the engine inserts only when enabled (a traced-in check is free at
steady state: it rides the existing readback).
"""

from __future__ import annotations

import collections
import logging
import os
import time


def setup_logging(level: str | None = None) -> logging.Logger:
    """Configure the framework logger once; level from arg or
    KT_LOG_LEVEL (default INFO)."""
    logger = logging.getLogger("ktransformers_tpu")
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter(
                "%(asctime)s %(name)s %(levelname)s %(message)s"
            )
        )
        logger.addHandler(h)
    logger.setLevel(
        (level or os.environ.get("KT_LOG_LEVEL", "INFO")).upper()
    )
    return logger


class StageTimer:
    """Accumulating wall-time profile over named stages.

    Enabled via KT_FORWARD_TIME_PROFILE=1 (the reference's env flag name,
    moe_base.hpp:186) or explicitly. Near-zero cost when disabled."""

    def __init__(self, enabled: bool | None = None):
        if enabled is None:
            enabled = os.environ.get("KT_FORWARD_TIME_PROFILE", "0") == "1"
        self.enabled = enabled
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)
        self._t0: float | None = None
        self._stage: str | None = None

    def stage(self, name: str) -> None:
        """End the current stage (if any) and start `name`."""
        if not self.enabled:
            return
        now = time.perf_counter()
        if self._stage is not None:
            self.totals[self._stage] += now - self._t0
            self.counts[self._stage] += 1
        self._stage = name
        self._t0 = now

    def end(self) -> None:
        if self.enabled and self._stage is not None:
            self.totals[self._stage] += time.perf_counter() - self._t0
            self.counts[self._stage] += 1
            self._stage = None

    def report(self) -> dict[str, dict]:
        return {
            k: {
                "total_s": round(v, 4),
                "count": self.counts[k],
                "avg_ms": round(1e3 * v / max(self.counts[k], 1), 3),
            }
            for k, v in sorted(self.totals.items())
        }


def check_numerics(tree, where: str = "") -> None:
    """Raise on any non-finite leaf (reference check_numerics analog).
    Call on HOST-visible values (tokens/logits already being read back)
    so it adds no extra device round trips."""
    import jax
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None:
            continue
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            raise FloatingPointError(
                f"non-finite values at {jax.tree_util.keystr(path)} {where}"
            )
