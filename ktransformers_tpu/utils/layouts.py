"""Layout canonicalization tools (currently NOT wired into any load path).

Measured findings on the axon v5e runtime (r2 profiling, decode bench
deepseek-v2-lite int4):

- `quantize()` / the jitted synthetic init commit [E, G, N] scale tensors
  at layout {1,0,2}; the Pallas custom calls want {2,1,0}, so XLA inserts
  a per-step whole-tensor relayout copy into VMEM (5.8 MB x 26 layers
  visible as `copy` ops in the trace, ~0.2 ms of a 4.2 ms step).
- HOWEVER: `jax.device_put(x, Format(default_layout))` at load time makes
  decode catastrophically SLOWER on this runtime (224 -> 13.9 tok/s when
  all leaves are forced, 224 -> 4.3 tok/s when only scales/zeros are),
  apparently because committed-layout inputs push XLA into relayouting
  the multi-GB packed weight tensors per step instead. The per-step scale
  copies are the cheaper equilibrium, so no load path calls this module;
  it is kept as a documented probe (scripts/kernel_lab*.py use it).

Reference analog: the AMX path's load-time repack into kernel-native tile
layout (kt-kernel/operators/amx/la/amx_kernels.hpp BufferA/BufferB) — on
TPU the kernel-native layout is the default tiled row-major.
"""

from __future__ import annotations

import jax


def _default_major_to_minor(x) -> tuple:
    return tuple(range(x.ndim))


def _fix_leaf(x):
    try:
        from jax.experimental.layout import Format, Layout
    except Exception:  # pragma: no cover - very old/new jax
        return x
    if not isinstance(x, jax.Array):
        return x
    try:
        mtm = x.format.layout.major_to_minor
    except Exception:
        return x
    if mtm == _default_major_to_minor(x):
        return x
    tgt = Format(
        Layout(major_to_minor=_default_major_to_minor(x)), x.sharding
    )
    return jax.device_put(x, tgt)


def canonicalize_layouts(tree):
    """device_put QTensor scale/zero leaves whose committed layout is not
    default row-major back to default. ONLY scales/zeros: they feed Pallas
    custom calls that demand default layouts, and XLA's fix-up is a
    per-step whole-tensor relayout. Packed weight *data* is left in
    whatever layout XLA committed — forcing it to default was measured to
    recreate the same per-step relayout problem in reverse (the jitted
    init emits data in XLA's preferred layout; decode dropped 224 -> 14
    tok/s when data was canonicalized). No-op on CPU and for canonical
    arrays."""
    from ktransformers_tpu.quant.formats import QTensor

    def fix(node):
        if isinstance(node, QTensor):
            return QTensor(
                data=node.data,
                scales=_fix_leaf(node.scales),
                zeros=_fix_leaf(node.zeros),
                kind=node.kind,
                group_size=node.group_size,
            )
        return node

    return jax.tree.map(
        fix, tree, is_leaf=lambda n: isinstance(n, QTensor)
    )
