"""On-chip LoRA SFT step on the 16B bench model (VERDICT r2 item 5 "one
on-chip 16B LoRA step with time/memory"): the forward runs the fused
Pallas kernels and the backward their transposed custom_vjp rules
(ops/pallas/vjp.py) — no XLA dequant fallback anywhere on the hot path.

Prints one JSON line; writes BENCH_SFT.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.ops import pallas as pallas_ops
    from ktransformers_tpu.sft.lora import LoRAConfig, init_lora
    from ktransformers_tpu.sft.train import TrainConfig, Trainer
    from scripts.profile_decode2 import BASE

    pallas_active = pallas_ops.maybe_enable()
    seq = int(os.environ.get("KT_SFT_SEQ", "512"))
    spec = spec_from_hf_config(dict(BASE, max_position_embeddings=2048))
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    from ktransformers_tpu.utils.device_prep import prepare_params

    params = prepare_params(params, pallas_active, spec)
    params = init_lora(params, spec, LoRAConfig(rank=8))

    trainer = Trainer(
        params, spec,
        TrainConfig(seq_len=seq, remat=True),
        compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(0, spec.vocab_size, (1, seq))
    labels = ids.copy()

    t0 = time.perf_counter()
    loss0 = trainer.train_step(ids, labels)
    loss0 = float(loss0)  # real barrier (block_until_ready is a no-op
    # on axon; r5 honest-readback rule)
    compile_s = time.perf_counter() - t0

    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        loss = trainer.train_step(ids, labels)
    loss = float(loss)  # readback INSIDE the timed region: without it
    # this loop measured host dispatch rate, not step time
    step_s = (time.perf_counter() - t0) / n

    # device.memory_stats() returns None on the axon backend (r3 shipped
    # hbm_peak 0.0 because of it) — report live-array bytes (exact, from
    # JAX's buffer registry) plus the remat-activation analytic estimate
    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        if stats.get("peak_bytes_in_use"):
            mem["hbm_peak_gb"] = round(
                stats["peak_bytes_in_use"] / 1e9, 2
            )
        live = sum(
            x.nbytes for x in jax.live_arrays()
            if hasattr(x, "nbytes")
        )
        # per-layer remat: one layer's activations + its backward temps
        # live at once; bound ~ seq * hidden * ~24 f32 planes
        act_est = seq * spec.hidden_size * 24 * 4
        mem["hbm_live_gb"] = round(live / 1e9, 2)
        mem["hbm_transient_est_gb"] = round(act_est / 1e9, 2)
    except Exception:
        pass

    result = {
        "metric": "LoRA SFT step, 16B-A2.4B int4 base (frozen) + r8 "
        "adapters, 1 x seq " + str(seq) + ", 1 TPU v5e chip",
        "step_s": round(step_s, 3),
        "tok_s": round(seq / step_s, 1),
        "loss_first": round(loss0, 3),
        "loss_last": round(loss, 3),
        "compile_s": round(compile_s, 1),
        "pallas_active": pallas_active,
        **mem,
        "note": "forward = fused Pallas dequant kernels; backward = the "
        "transposed custom_vjp kernels (ops/pallas/vjp.py) — the analog "
        "of the reference's hand-written fused MoE backward "
        "(sft_moe.hpp:355); per-layer remat",
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SFT.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
