"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's CI strategy (kt-kernel test/run_suite.py) but adds what
the reference lacks: multi-device mesh coverage without real hardware, via
XLA's host-platform device-count flag.
"""

import os

# Must run before jax is imported anywhere. Note: the environment may pin
# JAX_PLATFORMS=axon (real TPU tunnel) via sitecustomize, so we must override
# through jax.config rather than the env var alone.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def mesh8():
    from ktransformers_tpu.parallel.mesh import make_mesh

    return make_mesh(dp=1, tp=2, ep=4)
