"""Train the MTP draft head ON-CHIP against the target's own greedy
continuations, then measure REAL acceptance + wall-clock speculation
speedup (VERDICT r3 item 3: acceptance had never been >0 outside unit
tests because the synthetic head was random).

This mirrors how real MTP heads are produced (trained on the target
model's distribution; reference ships DeepSeek-V4-Flash MTP weights,
doc/en/DeepSeek-V4-Flash.md): here the target is the synthetic-weight
16B bench model, whose greedy continuations are a real (if degenerate)
distribution the head must learn.

Steps:
 1. generate greedy sequences from the target, collecting hidden states
 2. train a bf16 MTP head: CE( head(h_i, t_{i+1}), t_{i+2} )
 3. save the head to mtp_trained.npz (scripts/bench_speculative.py
    --trained loads it)
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def head_init_bf16(spec, seed=3):
    """Trainable (bf16, unquantized) MTP head at model scale."""
    from ktransformers_tpu.engine.mtp import init_mtp_synthetic

    return init_mtp_synthetic(spec, seed=seed, quant="bf16",
                              moe_quant="bf16", dense_layer=True)


def save_head(path, head):
    import jax

    flat, treedef = jax.tree_util.tree_flatten(head)
    np.savez(path, *[np.asarray(x) for x in flat])
    import pickle

    with open(path + ".tree", "wb") as f:
        pickle.dump(treedef, f)


def load_head(path):
    import pickle

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    data = np.load(path)
    flat = []
    for k in data.files:
        a = data[k]
        if a.dtype == np.dtype("V2"):  # np.savez stores bf16 as void16
            a = a.view(ml_dtypes.bfloat16)
        flat.append(jnp.asarray(a))
    with open(path + ".tree", "rb") as f:
        treedef = pickle.load(f)
    return jax.tree_util.tree_unflatten(treedef, flat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--nseq", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="/root/repo/mtp_trained.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import GenerateConfig, Generator
    from ktransformers_tpu.engine.mtp import mtp_layer_forward
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.model import KVCache, forward
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(dict(BASE, max_position_embeddings=2048))
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)
    params = gen.params  # Generator repacks with donate=True (CLAUDE.md)
    rng = np.random.default_rng(0)

    # --- 1. greedy corpora from the target + hidden states ---
    print("generating target sequences...", file=sys.stderr, flush=True)
    cfg = GenerateConfig(max_new_tokens=args.seq, prefill_chunk=64)
    seqs = []
    for i in range(args.nseq):
        prompt = list(rng.integers(0, spec.vocab_size, 16))
        out = gen.generate([prompt], cfg)[0]
        seqs.append(prompt + out)
    print("collecting hidden states...", file=sys.stderr, flush=True)

    rope, cdt = gen.rope_tables, gen.compute_dtype

    @jax.jit
    def hidden_of(params, toks):
        cache = KVCache.create(spec, 1, toks.shape[1] + 8, dtype=jnp.bfloat16)
        _, _, th = forward(params, spec, toks, cache, rope_tables=rope,
                           compute_dtype=cdt, return_hidden=True)
        return th

    L = min(len(s) for s in seqs)
    toks = jnp.asarray(np.array([s[:L] for s in seqs], np.int32))
    hs = np.stack([
        np.asarray(hidden_of(params, toks[i:i + 1])[0], np.float32)
        for i in range(args.nseq)
    ])  # [N, L, H]

    # training triples: (h_i, t_{i+1}) -> t_{i+2}
    h_in = jnp.asarray(hs[:, : L - 2]).astype(jnp.bfloat16)  # [N, L-2, H]
    t_in = toks[:, 1 : L - 1]
    t_out = toks[:, 2:L]

    # --- 2. train the head ---
    head = head_init_bf16(spec)
    opt = optax.adam(args.lr)
    opt_state = opt.init(head)

    @partial(jax.jit, donate_argnums=(1, 2))
    def train_step(params, head, opt_state, h, tin, tout):
        def loss_fn(head):
            # fresh single-layer cache per step (full-seq teacher forcing)
            import dataclasses as dc

            one = dc.replace(spec, num_layers=1)
            cache = KVCache.create(one, h.shape[0], h.shape[1],
                                   dtype=jnp.bfloat16)
            logits, _, _ = mtp_layer_forward(
                head, params, spec, tin, h, cache, rope, cdt
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            ll = jnp.take_along_axis(logp, tout[..., None], -1)
            return -jnp.mean(ll)

        loss, grads = jax.value_and_grad(loss_fn)(head)
        updates, opt_state = opt.update(grads, opt_state)
        head = optax.apply_updates(head, updates)
        return loss, head, opt_state

    print("training...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for step in range(args.steps):
        i = step % args.nseq
        loss, head, opt_state = train_step(
            params, head, opt_state, h_in[i:i + 1], t_in[i:i + 1],
            t_out[i:i + 1],
        )
        if step % 25 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f} "
                  f"({time.perf_counter()-t0:.0f}s)",
                  file=sys.stderr, flush=True)

    save_head(args.out, head)
    print(f"saved {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
