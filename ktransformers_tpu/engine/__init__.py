"""Single-user generation engine: chunked prefill + jitted decode loop.

TPU analog of the reference's `local_chat` path
(archive/ktransformers/util/utils.py prefill_and_generate +
cuda_graph_runner.py): CUDA-graph capture becomes bucketed `jax.jit` shapes
with donated KV cache; the chunked prefill loop is the same algorithm.
"""

from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.engine.sampler import SamplingConfig, sample

__all__ = ["GenerateConfig", "Generator", "SamplingConfig", "sample"]
