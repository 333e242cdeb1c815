"""Dynamic expert-placement A/B (VERDICT r4 item 8a; reference publishes
dynamic update 70.22 vs uniform 56.57 tok/s across GPUs,
doc/en/kt-kernel/experts-sched-Tutorial.md:174-192).

The reference's win is EP LOAD BALANCE: the all-to-all decode step is
gated by the most-loaded shard. Multi-chip hardware is unavailable here,
so this records the quantity that directly scales that step — the
max-shard token share — under a measured-skew routing distribution
(Zipf s=1.1 over 64 experts, the shape serving logs show), uniform
placement vs balanced_logical_to_physical, for ep in {2,4,8}; plus an
8-mesh virtual-EP EXECUTION asserting the remap is output-exact.

imbalance = max_shard_load / mean_shard_load; the EP decode step time is
proportional to it, so expected multi-chip speedup ~= imbalance_uniform
/ imbalance_balanced (the reference's 56.57 -> 70.22 is a 1.24x of the
same origin). Writes BENCH_PLACEMENT.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from ktransformers_tpu.utils.expert_placement import (
        balanced_logical_to_physical,
    )

    E, K, T = 64, 6, 4096
    rng = np.random.default_rng(0)
    # Zipf-ish popularity over experts (serving logs show a long tail)
    pop = (1.0 / np.arange(1, E + 1) ** 1.1)
    pop /= pop.sum()
    perm = rng.permutation(E)  # popular experts scattered over ids
    p_experts = pop[np.argsort(perm)]

    # sample T tokens x K routed experts without replacement per token
    topk = np.stack([
        rng.choice(E, K, replace=False, p=p_experts) for _ in range(T)
    ])
    freqs = np.bincount(topk.reshape(-1), minlength=E).astype(np.float64)

    out = {
        "metric": (
            "EP max-shard load (gates the a2a decode step) under Zipf "
            "routing skew: uniform vs frequency-balanced placement "
            "(reference's dynamic expert update, 56.57->70.22 tok/s)"
        ),
        "experts": E, "topk": K, "tokens": T,
        "skew_top8_share": round(
            float(np.sort(freqs)[::-1][:8].sum() / freqs.sum()), 3
        ),
    }
    for ep in (2, 4, 8):
        per = E // ep
        # uniform: logical id -> shard id // per
        load_u = np.array([
            freqs[s * per:(s + 1) * per].sum() for s in range(ep)
        ])
        l2p = balanced_logical_to_physical(freqs, ep)
        load_b = np.zeros(ep)
        for logical in range(E):
            load_b[l2p[logical] // per] += freqs[logical]
        imb_u = float(load_u.max() / load_u.mean())
        imb_b = float(load_b.max() / load_b.mean())
        out[f"ep{ep}"] = {
            "imbalance_uniform": round(imb_u, 3),
            "imbalance_balanced": round(imb_b, 3),
            "expected_step_speedup": round(imb_u / imb_b, 3),
        }
        print(f"ep={ep}: uniform {imb_u:.3f}x vs balanced {imb_b:.3f}x "
              f"-> expected {imb_u/imb_b:.2f}x", file=sys.stderr,
              flush=True)

    # exactness on the virtual 8-mesh: remapped EP forward == unmapped
    os.environ.setdefault("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ktransformers_tpu.models.init import init_params
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.ops.moe import MoEConfig, moe_forward
    from ktransformers_tpu.utils.expert_placement import (
        reorder_expert_weights,
    )

    cfg = dict(
        model_type="deepseek_v2", vocab_size=512, hidden_size=128,
        intermediate_size=256, moe_intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        n_shared_experts=1, n_routed_experts=E, num_experts_per_tok=K,
        first_k_dense_replace=1, moe_layer_freq=1, topk_method="greedy",
        norm_topk_prob=False, routed_scaling_factor=1.0,
        scoring_func="softmax", kv_lora_rank=32, q_lora_rank=None,
        qk_rope_head_dim=16, qk_nope_head_dim=16, v_head_dim=16,
        max_position_embeddings=128, rms_norm_eps=1e-6, rope_theta=1e4,
    )
    spec = spec_from_hf_config(cfg)
    params = init_params(spec, seed=0, quant="bf16")
    w = params["layers"][1]["moe"]["experts"]
    x = jnp.asarray(rng.standard_normal((16, 128)).astype(np.float32))
    idx = jnp.asarray(topk[:16], jnp.int32)
    tw = jnp.full((16, K), 1.0 / K, jnp.float32)
    y0 = moe_forward(x, w, idx, tw, MoEConfig())
    l2p8 = balanced_logical_to_physical(freqs, 8)
    y1 = moe_forward(
        x, reorder_expert_weights(w, l2p8), idx, tw, MoEConfig()
    )
    err = float(jnp.max(jnp.abs(y0 - y1)))
    out["remap_exactness_maxerr"] = err
    assert err < 1e-5, err
    print(json.dumps(out))
    with open("/root/repo/BENCH_PLACEMENT.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
