"""Dump the optimized HLO of the bench decode step and summarize the copy /
fusion ops: shapes, layouts, memory spaces — to find what the ~650 us/step
of copy+slice traffic in profile_decode3 actually moves.
"""
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


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
    params = init_params_synthetic(spec, quant=os.environ.get("KT_BENCH_QUANT", "int4_g"), moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    cache = gen.new_cache()
    cache = dc.replace(cache, lengths=jnp.full_like(cache.lengths, 512))
    # reproduce the jitted decode fn with concrete args for lower/compile
    from functools import partial

    spec_ = gen.spec
    rope_tables = gen.rope_tables
    compute_dtype = gen.compute_dtype
    from ktransformers_tpu.engine.sampler import sample
    from ktransformers_tpu.models.model import forward

    sampling = SamplingConfig()

    @partial(jax.jit, donate_argnums=(2,))
    def step(params, tok, cache, key):
        logits, cache = forward(
            params, spec_, tok, cache,
            rope_tables=rope_tables, compute_dtype=compute_dtype,
        )
        key, sub = jax.random.split(key)
        nxt = sample(logits[:, -1], sub, sampling)
        return nxt, cache, key

    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1, 1), jnp.int32)
    compiled = step.lower(gen.params, tok, cache, key).compile()
    txt = compiled.as_text()
    out = "/tmp/decode_step.hlo"
    with open(out, "w") as f:
        f.write(txt)
    print("HLO written:", out, len(txt), "bytes")

    # summarize copy ops
    pat = re.compile(r"^\s*(\S+) = (\S+) copy\((\S+?)\)", re.M)
    copies = defaultdict(lambda: [0, 0.0])
    for m in re.finditer(r"^\s*%?([\w.\-]+) = ([^=]+?) copy\(", txt, re.M):
        shape = m.group(2).strip()
        copies[shape][0] += 1
    print("\ncopy ops by result shape/layout:")
    for shape, (n, _) in sorted(copies.items(), key=lambda kv: -kv[1][0]):
        print(f"  x{n:<4d} {shape[:140]}")

    # dynamic-slice / slice ops with S(1) in them
    sl = defaultdict(int)
    for m in re.finditer(r"^\s*%?[\w.\-]+ = ([^=]+?) (dynamic-slice|slice)\(", txt, re.M):
        sl[m.group(1).strip()[:140]] += 1
    print("\nslice result shapes:")
    for shape, n in sorted(sl.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  x{n:<4d} {shape}")

    n_s1 = len(re.findall(r"S\(1\)", txt))
    print(f"\nS(1) annotations: {n_s1}")


if __name__ == "__main__":
    main()
