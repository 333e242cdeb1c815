"""Trace steady-state serving decode steps (batch N) and print the top
device ops — the serving analog of profile_decode3."""
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.serving.engine import ServeEngine
    from ktransformers_tpu.serving.scheduler import SchedulerConfig
    from scripts.profile_decode2 import BASE

    conc = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = dict(BASE, max_position_embeddings=4096)
    spec = spec_from_hf_config(cfg)
    params = init_params_synthetic(spec, quant="int8", moe_quant="int4_g")
    jax.block_until_ready(params)
    pages_per_q = (256 + 512 + 63) // 64 + 1
    eng = ServeEngine(
        params, spec,
        SchedulerConfig(max_batch_size=conc, prefill_chunk=256,
                        page_size=64, max_pages_per_query=pages_per_q),
        num_pages=pages_per_q * conc + 16,
    )
    rng = np.random.default_rng(0)
    qs = [eng.submit(list(rng.integers(0, cfg["vocab_size"], 256)),
                     max_new_tokens=512) for _ in range(conc)]
    # run until all queries are decoding (prefill done)
    while any(q.state in ("waiting", "prefill") for q in qs):
        eng.step()
    # warm the decode-step compile
    for _ in range(4):
        eng.step()
    n = 32
    t0 = time.perf_counter()
    tdir = "/tmp/prof_serving"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(n):
            eng.step()
    wall = (time.perf_counter() - t0) / n
    print(f"wall per decode step (batch {conc}): {wall*1e3:.2f} ms "
          f"-> {conc/wall:.0f} tok/s aggregate")

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
    fam = defaultdict(float)
    famc = defaultdict(int)
    for nm, d in agg.items():
        key = re.sub(r"[.\d]+$", "", nm)
        fam[key] += d
        famc[key] += cnt[nm]
    for nm, d in sorted(fam.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {d/n:9.1f} us  x{famc[nm]//n:<5d} {nm[:100]}")


if __name__ == "__main__":
    main()
