"""Pallas fused dequant-matmul kernels vs the XLA reference paths.

Runs in interpreter mode on the CPU test mesh (real-TPU execution is covered
by bench.py and the verify drive); mirrors the reference's kernel accuracy
tests (kt-kernel/test/per_commit/test_moe_amx_accuracy_*.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ktransformers_tpu.ops.pallas.quant_matmul import (
    gathered_quant_matmul,
    quant_matmul,
)
from ktransformers_tpu.quant.formats import dequantize, quantize


@pytest.mark.parametrize("kind", ["int8", "int4", "int4_g", "int4_gz", "fp8"])
@pytest.mark.parametrize("m", [1, 7, 32])
def test_quant_matmul_kernel(rng, kind, m):
    k, n = 256, 384
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    qt = quantize(w, kind, group_size=128)
    ref = np.asarray(
        x.astype(jnp.float32) @ dequantize(qt, jnp.float32), np.float32
    )
    out = np.asarray(quant_matmul(x, qt, interpret=True), np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kind", ["int8", "int4_g", "int4_gz"])
def test_gathered_quant_matmul_kernel(rng, kind):
    e, k, n, r = 8, 256, 384, 6
    w = jnp.asarray(rng.standard_normal((e, k, n)).astype(np.float32) * 0.1)
    qt = quantize(w, kind, group_size=128)
    x = jnp.asarray(rng.standard_normal((r, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ids = jnp.asarray([3, 0, 5, 3, 7, 1], jnp.int32)

    wd = np.asarray(dequantize(qt, jnp.float32))
    ref = np.stack(
        [
            np.asarray(x[i].astype(jnp.float32)) @ wd[int(ids[i])]
            for i in range(r)
        ]
    )
    out = np.asarray(gathered_quant_matmul(x, qt, ids, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_quant_matmul_odd_n(rng):
    """N not divisible by the tile size (e.g. 2816 = 5.5 * 512)."""
    k, n = 256, 320
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    qt = quantize(w, "int4_g", group_size=128)
    ref = np.asarray(x.astype(jnp.float32) @ dequantize(qt, jnp.float32))
    out = np.asarray(quant_matmul(x, qt, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kind", ["int8", "int4_g", "fp8"])
def test_grouped_quant_matmul_kernel(rng, kind):
    from ktransformers_tpu.ops.pallas.quant_matmul import grouped_quant_matmul

    e, k, n, m = 4, 256, 384, 40
    w = jnp.asarray(rng.standard_normal((e, k, n)).astype(np.float32) * 0.1)
    qt = quantize(w, kind, group_size=128)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    # groups: 10, 0, 25, 3 -> 38 valid rows, 2 masked tail rows
    gs = jnp.asarray([10, 0, 25, 3], jnp.int32)
    wd = np.asarray(dequantize(qt, jnp.float32))
    xs = np.asarray(x.astype(jnp.float32))
    bounds = [0, 10, 10, 35, 38]
    ref = np.zeros((m, n), np.float32)
    for g in range(e):
        ref[bounds[g]:bounds[g + 1]] = xs[bounds[g]:bounds[g + 1]] @ wd[g]
    out = np.asarray(grouped_quant_matmul(x, qt, gs, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    # masked tail rows must be exactly zero
    assert np.all(out[38:] == 0)


def test_mla_decode_kernel(rng):
    from ktransformers_tpu.ops.attention import mla_absorbed
    from ktransformers_tpu.ops.pallas.mla_decode import mla_decode_attention

    b, h, r, dr, smax = 3, 4, 128, 32, 640
    qn = jnp.asarray(rng.standard_normal((b, h, r)).astype(np.float32))
    qp = jnp.asarray(rng.standard_normal((b, h, dr)).astype(np.float32))
    ckv = jnp.asarray(rng.standard_normal((b, smax, r)).astype(np.float32))
    kpe = jnp.asarray(rng.standard_normal((b, smax, dr)).astype(np.float32))
    lengths = jnp.asarray([17, 500, 640], jnp.int32)

    # dense reference with length mask
    kpos = np.arange(smax)[None, None, :]
    mask = jnp.asarray(
        np.where(kpos < np.asarray(lengths)[:, None, None], 0.0, -1e30),
        jnp.float32,
    )
    ref = mla_absorbed(
        qn[:, :, None], qp[:, :, None], ckv, kpe, scale=0.09, mask=mask
    )[:, :, 0]
    out = mla_decode_attention(
        qn, qp, ckv, kpe, lengths, 0.09, block_s=256, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
