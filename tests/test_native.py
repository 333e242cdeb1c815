"""Native (C++) decoders/repack vs the numpy reference implementations."""

import numpy as np
import pytest

from ktransformers_tpu.loader import native
from ktransformers_tpu.loader.gguf import GGML_NAMES, _DECODERS

from tests.test_gguf import (
    pack_q2_k,
    pack_q3_k,
    pack_q4_0,
    pack_q4_k,
    pack_q5_k,
    pack_q6_k,
    pack_q8_0,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize(
    "tname,maker",
    [
        ("Q8_0", lambda rng: pack_q8_0(rng.standard_normal(256).astype(np.float32))),
        ("Q4_0", lambda rng: pack_q4_0(rng.standard_normal(256).astype(np.float32))),
        ("Q2_K", lambda rng: pack_q2_k(rng, 4)[0]),
        ("Q3_K", lambda rng: pack_q3_k(rng, 4)[0]),
        ("Q4_K", lambda rng: pack_q4_k(rng, 4)[0]),
        ("Q5_K", lambda rng: pack_q5_k(rng, 4)[0]),
        ("Q6_K", lambda rng: pack_q6_k(rng, 4)[0]),
    ],
)
def test_native_matches_numpy(rng, tname, maker):
    raw = maker(rng)
    ref = _DECODERS[tname](np.asarray(raw, np.uint8))
    out = native.decode(np.asarray(raw, np.uint8), tname)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_native_pack_int4_matches_jnp(rng):
    import jax.numpy as jnp

    from ktransformers_tpu.quant.formats import quantize

    w = rng.standard_normal((256, 64)).astype(np.float32) * 0.1
    res = native.pack_int4_group_split(w, 128)
    assert res is not None
    packed, scales = res

    qt = quantize(jnp.asarray(w), "int4_g", group_size=128)
    np.testing.assert_allclose(
        scales, np.asarray(qt.scales), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_array_equal(packed, np.asarray(qt.data))


def test_threads():
    lib = native.get_lib()
    assert lib.native_num_threads() >= 1
