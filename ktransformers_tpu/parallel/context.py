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
    # "psum": masked-replicated compute + psum combine (decode-optimal:
    # weights stay local, activations are replicated anyway).
    # "a2a": token dispatch to the expert's shard (large-prefill-optimal:
    # activation traffic ~T*d instead of full replication).
    ep_impl: str = "psum"
    # >1 = deferred-expert pipelining on the a2a path: chunk the dispatch
    # so ICI transfers overlap expert GEMMs (parallel/ep.py)
    ep_pipeline_chunks: int = 1

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
def parallel_context(mesh: Mesh, use_ep: bool = True, ep_impl: str = "psum",
                     ep_pipeline_chunks: int = 1):
    prev = _CURRENT
    set_parallel_context(ParallelContext(
        mesh=mesh, use_ep=use_ep, ep_impl=ep_impl,
        ep_pipeline_chunks=ep_pipeline_chunks,
    ))
    try:
        yield
    finally:
        set_parallel_context(prev)
