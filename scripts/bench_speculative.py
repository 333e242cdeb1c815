"""MTP self-speculation benchmark (VERDICT r1 item 9: measured speedup
with acceptance-rate reporting; reference: doc/en/DeepSeek-V4-Flash.md
MTP ~1.2x decode).

Speculative gains depend on the draft's acceptance rate, which depends
on TRAINED weights we cannot download in this environment. So two
regimes on the bench model:
  natural     synthetic target + synthetic MTP head: acceptance is
              whatever random weights give (a floor; real checkpoints'
              MTP heads are trained to the target and land 60-90%).
  predictable the same model with an lm_head biased to a constant
              distribution: acceptance ~1.0 — an upper bound that
              measures the speculation MACHINERY (k 1-layer draft steps
              + one (k+1)-token verify per round) rather than the draft
              quality.
Prints one JSON line; writes BENCH_SPECULATIVE.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2, help="draft tokens/round")
    ap.add_argument("--new", type=int, default=96)
    ap.add_argument("--prompt", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import GenerateConfig, Generator
    from ktransformers_tpu.engine.mtp import init_mtp_synthetic, mtp_generate
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.quant.formats import quantize
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(dict(BASE, max_position_embeddings=2048))
    mtp = init_mtp_synthetic(spec, quant="int8")
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, spec.vocab_size, args.prompt))

    results = {}
    for regime in ("natural", "predictable"):
        # fresh params per regime: Generator's W4A8 repack DONATES the
        # int4 buffers, so a second Generator over the same tree would
        # touch freed arrays
        params = init_params_synthetic(spec, quant="int8",
                                       moe_quant="int4_g")
        jax.block_until_ready(params)
        p = params
        if regime == "predictable":
            # lm_head column 7 dominant -> the target greedily repeats
            # token 7 and any draft sharing the lm_head proposes it too
            w = np.zeros((spec.hidden_size, spec.vocab_size), np.float32)
            w[:, 7] = 1.0
            p = {**params, "lm_head": quantize(jnp.asarray(w), "bf16")}

        gen = Generator(p, spec, max_len=1024, batch=1)
        cfg = GenerateConfig(max_new_tokens=args.new)

        t0 = time.perf_counter()
        base_out = gen.generate([prompt], cfg)[0]
        base_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        base_out = gen.generate([prompt], cfg)[0]
        base_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        out, stats = mtp_generate(gen, mtp, prompt, cfg, k=args.k)
        mtp_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        out, stats = mtp_generate(gen, mtp, prompt, cfg, k=args.k)
        mtp_s = time.perf_counter() - t0

        # greedy-exactness per program is tested in tests/test_mtp.py
        # (f32, CPU); across the s=1 decode vs (k+1)-token verify programs
        # in bf16 on-chip, argmax near-ties of the RANDOM synthetic logits
        # can flip and the sequences then diverge — report the agreement
        # prefix instead of asserting
        agree = 0
        for a, b in zip(out, base_out):
            if a != b:
                break
            agree += 1
        results[regime] = {
            "baseline_tok_s": round(args.new / base_s, 2),
            "mtp_tok_s": round(len(out) / mtp_s, 2),
            "speedup": round((len(out) / mtp_s) / (args.new / base_s), 3),
            "acceptance": round(stats.acceptance_rate, 3),
            "greedy_agreement_prefix": agree,
        }
        print(f"{regime}: {results[regime]} "
              f"(compiles {base_compile:.0f}s/{mtp_compile:.0f}s)",
              file=sys.stderr)
        # release this regime's 9.77 GB before the next one allocates
        # (two copies would exceed the 16 GB HBM)
        import gc

        del gen, p, params
        gc.collect()

    out = {
        "metric": f"MTP self-speculation, k={args.k} (16B int4, 1 chip)",
        **results,
        "note": "synthetic weights: 'natural' acceptance is a floor "
        "(trained MTP heads reach 60-90%); 'predictable' is the "
        "machinery's upper bound at acceptance~1",
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SPECULATIVE.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
