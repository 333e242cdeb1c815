"""Process-wide parallel context: which mesh/axes the model forward uses.

The model code (models/model.py, models/paged.py) is mesh-agnostic; when a
context is set, MoE layers route through the explicit shard_map EP path
(parallel/ep.py) instead of relying on GSPMD to partition the routed
gather. Analog of the reference's placement wiring in the injection rules
(per-module device kwargs) but process-global.
"""

from __future__ import annotations

import contextlib
import dataclasses

from jax.sharding import Mesh

from ktransformers_tpu.parallel.mesh import AXIS_EP


@dataclasses.dataclass
class ParallelContext:
    mesh: Mesh
    use_ep: bool = True

    @property
    def ep_size(self) -> int:
        return self.mesh.shape.get(AXIS_EP, 1)


_CURRENT: ParallelContext | None = None


def set_parallel_context(ctx: ParallelContext | None) -> None:
    global _CURRENT
    _CURRENT = ctx


def get_parallel_context() -> ParallelContext | None:
    return _CURRENT


@contextlib.contextmanager
def parallel_context(mesh: Mesh, use_ep: bool = True):
    prev = _CURRENT
    set_parallel_context(ParallelContext(mesh=mesh, use_ep=use_ep))
    try:
        yield
    finally:
        set_parallel_context(prev)
