"""Device-mesh parallelism: dp/tp/ep axes over ICI, sharding specs, EP dispatch.

The TPU re-design of the reference's parallel layer set: NUMA tensor
parallelism (kt-kernel/operators/moe-tp.hpp TP_MOE), GPU tensor parallelism
(archive/.../distributed/parallel_state.py + pynccl), and the heterogeneous
CPU/GPU expert placement (gpu_experts_mask) — all replaced by shardings over
one `jax.sharding.Mesh` with XLA collectives on ICI.
"""

from ktransformers_tpu.parallel.mesh import MeshConfig, make_mesh

__all__ = ["MeshConfig", "make_mesh"]
