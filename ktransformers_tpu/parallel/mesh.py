"""Mesh construction and axis conventions.

Axes (SURVEY.md §2.7 mapping):
- ``dp``: data parallel (serving: independent batches; SFT: batch shard).
- ``ep``: expert parallel — experts sharded across devices, tokens routed via
  masked local compute + psum (reference: gpu_experts_mask partial sums).
- ``tp``: tensor parallel — attention heads / MLP intermediate sharded
  (reference: TP_MOE NUMA sharding, pynccl GPU TP).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_DP = "dp"
AXIS_EP = "ep"
AXIS_TP = "tp"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    ep: int = 1
    tp: int = 1

    @property
    def num_devices(self) -> int:
        return self.dp * self.ep * self.tp


def make_mesh(
    dp: int = 1, ep: int = 1, tp: int = 1, devices=None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = dp * ep * tp
    if len(devices) < n:
        raise ValueError(
            f"mesh {dp}x{ep}x{tp} needs {n} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(dp, ep, tp)
    return Mesh(dev, (AXIS_DP, AXIS_EP, AXIS_TP))
