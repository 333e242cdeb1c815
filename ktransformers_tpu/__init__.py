"""ktransformers_tpu: a TPU-native quantized MoE inference + fine-tuning framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
kvcache-ai/ktransformers (CPU/GPU heterogeneous MoE inference):

- Quantized expert kernels (INT4/INT8/FP8/GGUF k-quants) as fused Pallas
  dequant-matmul kernels feeding the MXU, instead of AMX/AVX512 CPU GEMMs.
- Expert parallelism over a `jax.sharding.Mesh` with all-to-all dispatch,
  instead of CPU<->GPU expert offload ordered by cudaLaunchHostFunc.
- MLA/GQA paged attention over HBM-resident KV pages, instead of
  custom_flashinfer/Triton CUDA kernels.
- A continuous-batching serving engine with bucketed jit shapes, instead of
  CUDA-graph capture (archive/csrc/balance_serve in the reference).
- A module-to-mesh placement spec, instead of the YAML torch-module
  injection framework (archive/ktransformers/optimize).

See SURVEY.md at the repo root for the full mapping to the reference.
"""

from ktransformers_tpu.version import __version__

__all__ = ["__version__"]
