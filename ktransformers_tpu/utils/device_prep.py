"""Engine-init parameter preparation for the real TPU.

Currently one one-time pass over the params pytree: the W4A8 repack
(quant/w4a8.py) for the int8-MXU decode kernels, with buffer donation so
resident expert bytes never double.

NEGATIVE RESULT, recorded so it is not retried: the decode program
layout-converts a few weight families inside every step (~340 us/step on
the bench model: attn projections {0,1}->{1,0} and experts.down.scales
{2,0,1}->{2,1,0}, destination memory space S(1) — see
scripts/profile_decode3.py). Every attempt to move those conversions to
init made decode 25-35x SLOWER (270 -> 8-11 tok/s):
  - device_put all / small / scales-only params to the default
    minor-to-major layout;
  - asking XLA for preferred entry layouts via jit in_shardings =
    Format(Layout.AUTO) and relaying to those.
The init-produced layouts are evidently what the Pallas custom calls want
on this backend, and the residual copies are XLA's own (partially
overlapped) staging into alternate memory, not an entry-layout mismatch.
Bulk relayout passes can also trip the axon runtime's transfer pool
(RESOURCE_EXHAUSTED) even with donation.

The reference stack does its analog of the *useful* part at load time:
GGUF/ST tensors are repacked once into the AMX BufferB tile layout
(kt-kernel/operators/amx/la/amx_kernels.hpp), never per step — here that
role is the w4a8 offset-lo repack.
"""

from __future__ import annotations

import os

from ktransformers_tpu.quant.w4a8 import enable_w4a8


def prepare_params(params, pallas_active: bool):
    """Engine-init param transforms; no-op off-TPU."""
    if not pallas_active:
        return params
    if os.environ.get("KT_W4A8", "1") != "0":
        params = enable_w4a8(params, donate=True)
    return params
