"""MTP self-speculation benchmark (VERDICT r1 item 9: measured speedup
with acceptance-rate reporting; reference: doc/en/DeepSeek-V4-Flash.md
MTP ~1.2x decode).

What this measures on THIS runtime (one v5e behind the axon tunnel,
~25 ms per host round-trip): the speculation machinery's real cost per
round (k 1-layer draft steps + one (k+1)-token verify + the host-driven
accept logic) against the pipelined baseline decoder, plus the
BREAK-EVEN acceptance rate implied by those costs. Acceptance itself
depends on trained draft weights we cannot download here, so the
natural-regime acceptance (random synthetic weights) is a floor —
trained MTP heads land 60-90% — and the break-even number says whether
ANY acceptance could win.

NEGATIVE RESULT recorded by this benchmark: mtp_generate\'s round loop
performs several blocking host round-trips per round (draft chaining,
verify readback, cache catch-up), so a round costs ~6x the baseline\'s
amortized per-token cost and the break-even acceptance exceeds 1.0 —
self-speculation cannot pay off over the tunnel until the whole round
(drafts + verify + accept) is fused into one device program. On a
PCIe-attached host those round-trips are microseconds and the usual
~1.2x at 60-90% acceptance applies. Fusing the round on-device is the
round-3 item.

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

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import GenerateConfig, Generator
    from ktransformers_tpu.engine.mtp import init_mtp_synthetic, mtp_generate
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(dict(BASE, max_position_embeddings=2048))
    mtp = init_mtp_synthetic(spec, quant="int8")
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, spec.vocab_size, args.prompt))

    params = init_params_synthetic(spec, quant="int8", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    cfg = GenerateConfig(max_new_tokens=args.new)

    base_out = gen.generate([prompt], cfg)[0]  # compile
    t0 = time.perf_counter()
    base_out = gen.generate([prompt], cfg)[0]
    base_s = time.perf_counter() - t0

    out, stats = mtp_generate(gen, mtp, prompt, cfg, k=args.k)  # compile
    t0 = time.perf_counter()
    out, stats = mtp_generate(gen, mtp, prompt, cfg, k=args.k)
    mtp_s = time.perf_counter() - t0

    # greedy-exactness per program is covered by tests/test_mtp.py (f32,
    # CPU); across differently-shaped bf16 programs argmax near-ties of
    # RANDOM logits can flip, so report the agreement prefix
    agree = 0
    for a, b in zip(out, base_out):
        if a != b:
            break
        agree += 1

    acc = stats.acceptance_rate
    tokens_per_round = 1.0 + args.k * acc
    rounds = max(1, len(out) / tokens_per_round)
    round_s = mtp_s / rounds
    base_per_tok = base_s / args.new
    # break-even: (1 + k*a) tokens per round_s matches base_per_tok
    break_even = (round_s / base_per_tok - 1.0) / args.k

    result = {
        "metric": f"MTP self-speculation, k={args.k} (16B int4, 1 chip)",
        "baseline_tok_s": round(args.new / base_s, 2),
        "mtp_tok_s": round(len(out) / mtp_s, 2),
        "speedup": round((len(out) / mtp_s) / (args.new / base_s), 3),
        "acceptance": round(acc, 3),
        "round_ms": round(round_s * 1e3, 1),
        "break_even_acceptance": round(break_even, 2),
        "greedy_agreement_prefix": agree,
        "note": "host-driven round loop is tunnel-RTT-bound on this "
        "runtime: break-even acceptance > 1 means no draft quality can "
        "win until the round is fused on-device (round-3 item); "
        "acceptance with synthetic weights is a floor (trained MTP "
        "heads: 60-90%)",
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SPECULATIVE.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
