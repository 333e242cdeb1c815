"""Quantized linear / matmul dispatch.

TPU analog of the reference's linear operator zoo
(archive/ktransformers/operators/linear.py: KLinearTorch / KLinearMarlin /
KLinearFP8 / KLinearCPUInfer): one entry point that picks the best compute
path for a `QTensor` weight.

Design rule (what keeps decode HBM-bound on the *quantized* bytes rather
than the dequantized ones — the same economics as the reference's fused
AMX dequant-GEMM):
- per-out-channel scales commute with the contraction:
  x @ (q * s) == (x @ q) * s, so the kernel is a plain int->bf16 convert
  (fused by XLA into the matmul operand) plus a cheap output scale;
- group-wise scales contract per K-group:
  y[n] = sum_g s[g, n] * (x[g, :] @ q[g, :, :]);
- the Pallas fused kernels (ops/pallas/) replace these where profiled
  faster; they are registered at import time via set_pallas_qmatmul.
"""

from __future__ import annotations

import jax.numpy as jnp

from ktransformers_tpu.quant.formats import (
    QTensor,
    dequantize,
    raw_int4_data,
    unpack_int4,
)

# Set by ktransformers_tpu.ops.pallas at import time when running on TPU.
_PALLAS_QMATMUL = None


def set_pallas_qmatmul(fn) -> None:
    global _PALLAS_QMATMUL
    _PALLAS_QMATMUL = fn


def _int_data(w: QTensor, dtype) -> jnp.ndarray:
    """Weight codes as `dtype` [..., K, N] (unpacks int4 nibbles)."""
    if w.kind in ("int4", "int4_g", "int4_gz"):
        return unpack_int4(raw_int4_data(w), w.group_size).astype(dtype)
    return w.data.astype(dtype)


def qmatmul(x: jnp.ndarray, w: QTensor, *, impl: str = "auto") -> jnp.ndarray:
    """Compute x @ w for a 2D quantized weight [K, N]; x is [..., K]."""
    if impl == "auto" and _PALLAS_QMATMUL is not None and w.kind != "bf16":
        y = _PALLAS_QMATMUL(x, w)
        if y is not None:
            return y

    if w.kind == "bf16":
        return jnp.matmul(x, w.data.astype(x.dtype))

    if w.kind in ("int8", "int4", "fp8"):
        # scales [1, N] hoisted to the output.
        y = jnp.matmul(x, _int_data(w, x.dtype))
        return (y.astype(jnp.float32) * w.scales.reshape(1, -1)).astype(x.dtype)

    if w.kind in ("int4_g", "int4_gz", "int8_g", "int8_gz"):
        g = w.group_size
        q = _int_data(w, x.dtype)  # [K, N]
        k, n = q.shape
        q = q.reshape(k // g, g, n)
        *lead, _ = x.shape
        xr = x.reshape(-1, k // g, g)
        part = jnp.einsum(
            "tGg,GgN->tGN", xr.astype(jnp.float32), q.astype(jnp.float32)
        )
        if w.kind.endswith("_gz"):
            # y -= sum_g (sum_k x) * z[g, n] * s[g, n]
            xsum = jnp.sum(xr.astype(jnp.float32), axis=-1)  # [t, G]
            part = part - xsum[..., None] * w.zeros[: k // g][None]
        # scales may be sublane-padded past the true group count
        y = jnp.sum(part * w.scales[: k // g][None], axis=1)
        return y.reshape(*lead, n).astype(x.dtype)

    # Fallback: dense dequant.
    return jnp.matmul(x, dequantize(w, x.dtype))


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
