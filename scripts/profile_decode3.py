"""Trace one (chained) decode step of the bench model and print the top
device ops by total time — pinpoints kernels vs glue after the w4a8 change.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.engine.sampler import SamplingConfig
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(dict(BASE))
    params = init_params_synthetic(
        spec,
        quant=os.environ.get("KT_BENCH_QUANT", "int4_g"),
        moe_quant=os.environ.get("KT_BENCH_MOE_QUANT", "int4_g"),
    )
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    cache = gen.new_cache()
    cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
    decode = gen._decode_step(SamplingConfig())
    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1,), jnp.int32)
    tok, cache, key = decode(tok[:, None], cache, key)
    jax.block_until_ready(tok)

    n = 64
    tdir = "/tmp/prof_decode3"
    os.system(f"rm -rf {tdir}")
    import time
    t0 = time.perf_counter()
    with jax.profiler.trace(tdir):
        for _ in range(n):
            tok, cache, key = decode(tok[:, None], cache, key)
        jax.block_until_ready(tok)
    wall = (time.perf_counter() - t0) / n
    print(f"wall per step: {wall*1e3:.2f} ms -> {1/wall:.1f} tok/s")

    f = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    core = {p for p, nm in pids.items()
            if "TensorCore" in nm or "/device" in nm.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in core:
            continue
        nm = e.get("name", "")
        if nm.startswith(("jit_", "while")) or "fori" in nm:
            continue
        agg[nm] += e.get("dur", 0)
        cnt[nm] += 1
        total += e.get("dur", 0)
    print(f"device total per step: {total/n/1e3:.3f} ms")
    for nm, d in sorted(agg.items(), key=lambda kv: -kv[1])[:32]:
        print(f"  {d/n:9.1f} us  x{cnt[nm]//n:<4d} {nm[:110]}")

    import re
    fam = defaultdict(float)
    famc = defaultdict(int)
    for nm, d in agg.items():
        key = re.sub(r"[.\d]+$", "", nm)
        fam[key] += d
        famc[key] += cnt[nm]
    print("\nby family:")
    for nm, d in sorted(fam.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {d/n:9.1f} us  x{famc[nm]//n:<5d} {nm[:100]}")

    print("\ntop copy/fusion/reduce events (per step):")
    sel = [(nm, d) for nm, d in agg.items()
           if re.sub(r"[.\d]+$", "", nm) in
           ("copy", "fusion", "multiply_reduce_fusion", "broadcast_select_fusion",
            "dynamic-update-slice", "sort", "reshape")]
    for nm, d in sorted(sel, key=lambda kv: -kv[1])[:25]:
        print(f"  {d/n:9.1f} us  x{cnt[nm]//n:<4d} {nm[:110]}")


if __name__ == "__main__":
    main()
