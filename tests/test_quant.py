"""Quant format roundtrip accuracy (analog of the reference's accuracy tests
kt-kernel/test/per_commit/test_moe_amx_accuracy_*.py, but at the format level)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ktransformers_tpu.quant.formats import dequantize, quantize

SHAPES = [(64, 32), (4, 256, 48)]  # [K, N] and [E, K, N]


@pytest.mark.parametrize("kind,tol", [
    ("bf16", 0.01),
    ("int8", 0.02),
    ("fp8", 0.04),
    ("int4", 0.25),
    ("int4_g", 0.15),
    ("int4_gz", 0.12),
    ("mxfp4", 0.30),
    ("mxfp8", 0.05),
])
@pytest.mark.parametrize("shape", SHAPES)
def test_roundtrip(rng, kind, tol, shape):
    w = rng.standard_normal(shape).astype(np.float32)
    qt = quantize(jnp.asarray(w), kind, group_size=64)
    wd = np.asarray(dequantize(qt, jnp.float32))
    assert wd.shape == w.shape
    err = np.abs(wd - w).mean() / np.abs(w).mean()
    assert err < tol, f"{kind}: rel err {err}"


def test_int4_is_packed_storage(rng):
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    qt = quantize(w, "int4")
    # nibble-packed along K: uint8 [K/2, N] (axon TPU can't take jnp.int4
    # jit arguments; see formats.py docstring)
    assert qt.data.dtype == jnp.uint8
    assert qt.data.shape == (64, 64)
    assert qt.in_features == 128
    # int4 + f32 scales must be ~8x smaller than f32.
    assert qt.nbytes() < w.size * 4 / 6


def test_int4_pack_roundtrip(rng):
    from ktransformers_tpu.quant.formats import pack_int4, unpack_int4

    q = rng.integers(-8, 8, size=(2, 16, 8)).astype(np.int8)
    out = np.asarray(unpack_int4(pack_int4(jnp.asarray(q))))
    np.testing.assert_array_equal(out, q)


def test_mxfp4_exact_values_roundtrip():
    """Values that are exactly representable (e2m1 magnitude x 2^E) must
    survive quantize->dequantize bit-exactly."""
    from ktransformers_tpu.quant.formats import E2M1_VALUES

    mags = np.array(E2M1_VALUES, np.float32)
    # one group of 32 per column; scale exponents differ per group
    col0 = np.tile(mags, 4) * 4.0  # E=2
    col1 = -np.tile(mags, 4) * 0.5  # E=-1
    w = np.stack([col0, col1], axis=1)  # [32, 2]
    qt = quantize(jnp.asarray(w), "mxfp4")
    assert qt.data.dtype == jnp.uint8 and qt.scales.dtype == jnp.uint8
    wd = np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_array_equal(wd, w)


def test_mxfp4_gathered_moe_matches_dense(rng):
    """MX formats through the decode gather path vs the dense reference."""
    from ktransformers_tpu.ops.gate import GateConfig, route
    from ktransformers_tpu.ops.moe import (
        MoEConfig,
        MoEWeights,
        moe_forward,
        moe_forward_dense_reference,
    )

    for kind in ("mxfp4", "mxfp8"):
        e, d, f, k, t = 8, 64, 96, 2, 4  # t small -> gather path
        gu = jnp.asarray(rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.1)
        dn = jnp.asarray(rng.standard_normal((e, f, d)).astype(np.float32) * 0.1)
        w = MoEWeights(gate_up=quantize(gu, kind), down=quantize(dn, kind))
        x = jnp.asarray(rng.standard_normal((t, d)).astype(np.float32))
        logits = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
        idx, wts = route(logits, GateConfig(num_experts=e, top_k=k))
        ref = moe_forward_dense_reference(x, w, idx, wts, MoEConfig())
        got = moe_forward(x, w, idx, wts, MoEConfig())
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
        )
        # prefill (grouped) path too
        xt = jnp.asarray(rng.standard_normal((64, d)).astype(np.float32))
        lg = jnp.asarray(rng.standard_normal((64, e)).astype(np.float32))
        idx2, wts2 = route(lg, GateConfig(num_experts=e, top_k=k))
        ref2 = moe_forward_dense_reference(xt, w, idx2, wts2, MoEConfig())
        got2 = moe_forward(xt, w, idx2, wts2, MoEConfig())
        np.testing.assert_allclose(
            np.asarray(got2), np.asarray(ref2), rtol=2e-3, atol=2e-3
        )


def test_quantize_preserves_columns(rng):
    # Per-out-channel scaling: scaling one column must not affect others.
    w = rng.standard_normal((32, 8)).astype(np.float32)
    w2 = w.copy()
    w2[:, 3] *= 100
    d1 = np.asarray(dequantize(quantize(jnp.asarray(w), "int8"), jnp.float32))
    d2 = np.asarray(dequantize(quantize(jnp.asarray(w2), "int8"), jnp.float32))
    np.testing.assert_allclose(
        d1[:, :3], d2[:, :3], rtol=0, atol=1e-6
    )
