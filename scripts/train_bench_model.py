"""Train the bench_ppl synthetic model ON-CHIP until its teacher-forced
ppl is non-trivial, so the per-format quantization sweep discriminates
(VERDICT r4 item 4 / missing 1: on RANDOM weights every format looks
catastrophic — int4_g dppl +7,150 — because random weights carry no
redundancy; on a trained model int8/q8_0 deltas should be ~noise and
int4 kinds small, matching the reference's quantized==full-precision
claim, doc/en/benchmark.md:31-46).

Data: a seeded sparse-Markov token source — each token has 8 plausible
successors drawn from a fixed random table with a geometric profile
(entropy ~1.66 nats -> optimal ppl ~5.3 vs vocab 8192). The model must
learn the 8192x8 successor table + profile; a trained run reaches
single-digit ppl, leaving quantization deltas in a realistic regime.

Saves bench_model_trained.npz (+ .tree) for scripts/bench_ppl.py.
Run: python scripts/train_bench_model.py [--steps 400]
"""

import argparse
import os
import pickle
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# geometric-ish successor profile (8 branches)
_PROFILE = np.asarray([0.30, 0.22, 0.15, 0.11, 0.08, 0.06, 0.05, 0.03])


def _succ_table(vocab: int, seed: int = 7):
    return np.random.default_rng(seed).integers(
        0, vocab, (vocab, len(_PROFILE)), dtype=np.int32
    )


def markov_stream(vocab: int, n: int, seed: int) -> np.ndarray:
    """Sample one token stream from the Markov source. Seeds < 10_000 are
    the training pool; bench_ppl evaluates on seed 10_001 (held out)."""
    table = _succ_table(vocab)
    rng = np.random.default_rng(seed)
    ks = rng.choice(len(_PROFILE), size=n, p=_PROFILE)
    out = np.empty((n,), np.int32)
    tok = int(rng.integers(0, vocab))
    for i in range(n):
        out[i] = tok
        tok = int(table[tok, ks[i]])
    return out


def save_params(path, params):
    import jax

    flat, treedef = jax.tree_util.tree_flatten(params)
    np.savez(path, *[np.asarray(x) for x in flat])
    with open(path + ".tree", "wb") as f:
        pickle.dump(treedef, f)


def load_params(path):
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
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.models.init import init_params
    from ktransformers_tpu.models.model import KVCache, forward
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.bench_ppl import PPL_CFG, TRAINED_PATH

    out_path = args.out or TRAINED_PATH
    cfg = dict(
        PPL_CFG,
        num_hidden_layers=int(os.environ.get("KT_PPL_LAYERS", "8")),
    )
    spec = spec_from_hf_config(cfg)
    params = init_params(spec, seed=0, quant="bf16")
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.1f} M params", file=sys.stderr, flush=True)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(params, tokens):
        cache = KVCache.create(spec, tokens.shape[0], tokens.shape[1])
        logits, _ = forward(params, spec, tokens[:, :-1], cache)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], -1)
        return jnp.mean(nll)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    B, S = args.batch, args.seq
    t0 = time.perf_counter()
    last = None
    for step in range(args.steps):
        batch = np.stack(
            [markov_stream(cfg["vocab_size"], S + 1, seed=step * B + i)
             for i in range(B)]
        )
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(batch)
        )
        if step % 20 == 0 or step == args.steps - 1:
            last = float(loss)  # real readback = the honest barrier
            print(
                f"step {step:4d}: loss {last:.4f} ppl {np.exp(last):8.2f} "
                f"({time.perf_counter()-t0:.0f}s)",
                file=sys.stderr, flush=True,
            )
    save_params(out_path, params)
    print(f"saved {out_path} (final ppl {np.exp(last):.2f})",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
