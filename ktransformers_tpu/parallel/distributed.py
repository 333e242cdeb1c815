"""Multi-host initialization: jax.distributed + a global mesh over DCN.

Reference analog: the multi-rank launch plumbing (torchrun/HCCL in
local_chat.py:92, NPU PUB/SUB broadcast in balance_serve.py:221-235) — on
TPU pods this collapses into `jax.distributed.initialize` + one mesh whose
outer axis spans hosts (DCN) and inner axes ride ICI.

Usage (one process per host, e.g. via the TPU VM metadata env):
    from ktransformers_tpu.parallel.distributed import init_multihost
    mesh = init_multihost(dp=1, ep=16, tp=4)
"""

from __future__ import annotations

import os

import jax

from ktransformers_tpu.parallel.mesh import make_mesh


def init_multihost(
    dp: int = 1,
    ep: int | None = None,
    tp: int = 1,
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize jax.distributed when running multi-process and build the
    global mesh. On a single host this is a no-op wrapper around make_mesh.

    Mesh-axis guidance (scaling-book recipe): keep `tp` within a chip's ICI
    neighborhood, let `ep` span hosts (expert weights never move — only
    activations psum over the ep axis), and use `dp` across slices.
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    multiproc = explicit or os.environ.get("TPU_WORKER_HOSTNAMES")
    if multiproc and jax.process_count() == 1:
        kwargs = {}
        if coordinator_address:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)

    n = jax.device_count()
    if ep is None:
        ep = n // (dp * tp)
    assert dp * ep * tp == n, (dp, ep, tp, n)
    return make_mesh(dp=dp, ep=ep, tp=tp)
