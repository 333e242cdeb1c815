"""Quantized linear / matmul dispatch.

TPU analog of the reference's linear operator zoo
(archive/ktransformers/operators/linear.py: KLinearTorch / KLinearMarlin /
KLinearFP8 / KLinearCPUInfer): one entry point that picks the best compute
path for a `QTensor` weight. The "reference" path dequantizes and lets the
MXU do a bf16 matmul (weight-only quantization — HBM traffic is the decode
bottleneck, compute is not); the Pallas path fuses dequantization into the
matmul tiles so the dense weight never exists in HBM.
"""

from __future__ import annotations

import jax.numpy as jnp

from ktransformers_tpu.quant.formats import QTensor, dequantize

# Set by ktransformers_tpu.ops.pallas at import time when running on TPU.
_PALLAS_QMATMUL = None


def set_pallas_qmatmul(fn) -> None:
    global _PALLAS_QMATMUL
    _PALLAS_QMATMUL = fn


def qmatmul(
    x: jnp.ndarray, w: QTensor, *, impl: str = "auto"
) -> jnp.ndarray:
    """Compute x @ w for a 2D quantized weight [K, N]; x is [..., K]."""
    if impl == "auto":
        impl = "pallas" if _PALLAS_QMATMUL is not None and w.kind != "bf16" else "ref"
    if impl == "pallas" and _PALLAS_QMATMUL is not None and w.kind != "bf16":
        return _PALLAS_QMATMUL(x, w)
    wd = dequantize(w, x.dtype)
    return jnp.matmul(x, wd)


def linear(
    x: jnp.ndarray,
    w: QTensor,
    bias: jnp.ndarray | None = None,
    *,
    impl: str = "auto",
) -> jnp.ndarray:
    y = qmatmul(x, w, impl=impl)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
