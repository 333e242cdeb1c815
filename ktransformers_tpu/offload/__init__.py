"""Host-offloaded expert weights: serve models larger than HBM.

The reference's core trick is holding the routed-expert weights in CPU DRAM
and computing them on the CPU while the GPU runs attention
(kt-kernel CPUInfer + KExpertsCPU). The TPU re-design keeps the *compute*
on the TPU and streams only the **routed experts' quantized bytes**
host->HBM per layer per step (decode traffic = active expert bytes, like
the reference's CPU memory-bandwidth bound), with the full framework
(routing, attention, cache) unchanged.
"""

from ktransformers_tpu.offload.experts import (
    OffloadedMoEWeights,
    offload_moe_weights,
)

__all__ = ["OffloadedMoEWeights", "offload_moe_weights"]
