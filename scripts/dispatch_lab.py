"""Dispatch-cost lab (r4): how much of a decode step's wall time is host
argument marshaling? The bench model's params tree is ~600 arrays; each
dispatch ships every buffer handle through the axon client.

Measures per-dispatch wall of a trivial jitted fn over N arrays, with a
depth-8 paced readback (the honest decode-loop pattern), for N in
{8, 64, 256, 640}. If per-dispatch cost scales with N, stacking layer
params into a few big arrays is the single-user decode lever.
"""

import collections
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    for n_arrays in (8, 64, 256, 640):
        arrs = [
            jnp.zeros((8, 128), jnp.bfloat16) + i for i in range(n_arrays)
        ]

        @jax.jit
        def f(tok, *arrs):
            acc = tok.astype(jnp.float32)
            for a in arrs:
                acc = acc + a[0, 0].astype(jnp.float32)
            return (acc.astype(jnp.int32) % 7)

        tok = jnp.zeros((1,), jnp.int32)
        tok = f(tok, *arrs)
        _ = int(tok[0])
        steps = 64
        pending = collections.deque()
        t0 = time.perf_counter()
        for _ in range(steps):
            tok = f(tok, *arrs)
            try:
                tok.copy_to_host_async()
            except Exception:
                pass
            pending.append(tok)
            if len(pending) > 8:
                _ = int(pending.popleft()[0])
        while pending:
            _ = int(pending.popleft()[0])
        dt = (time.perf_counter() - t0) / steps * 1e3
        print(f"N={n_arrays:4d} args: {dt:7.3f} ms/dispatch", flush=True)


if __name__ == "__main__":
    main()
