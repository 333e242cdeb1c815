"""Needle-retrieval accuracy at depth, ON-CHIP, per anchor type
(VERDICT r4 item 4/8: all BENCH_LONGCTX rows were tok/s-only; the
reference pairs its long-context speedups with accuracy — needle
89.31 -> 92.88 @1M, doc/en/long_context_introduction.md:7).

What this measures (and what it does not): real-model needle tasks need
real checkpoints (zero-egress here), so this scores the RETRIEVAL layer
itself — the part sparse attention can get wrong. Per (context, anchor):

  B=32 planted needles per VARIANT, everything else N(0,1); accuracy =
  fraction of queries whose needle PAGE is in the budget-64 selection
  (select_pages, the exact serving path):

  - "outlier": needle key = 4.5 * sign(q) per dimension — the key sits
    OUTSIDE each page's per-dimension extremes, the regime bound-based
    retrieval (Quest) targets: distinctive tokens have out-of-
    distribution keys. This column shows the mechanism works at depth.
  - "inlier": needle key = alpha * q with alpha set so the needle DOT is
    2x the max random score, but each component stays inside the page's
    min/max envelope. Per-dimension summaries fundamentally cannot see
    such a needle (the page bound does not move) — accuracies near
    budget/P document that HONEST limitation of every summary-based
    anchor (the r5 first-cut bench measured only this and read ~0 at
    512K+).

  At <=128K a dense-attention fidelity column is added: cosine between
  sparse_mla_decode and full dense attention outputs (outlier variant).

Contexts 64K..1M run a single layer's planes+buffers (selection is
per-layer; 1M buffers are 1.2 GB — fits beside nothing else, hence one
subprocess per context).

Writes BENCH_NEEDLE.json. Usage:
  python scripts/bench_needle.py              (driver, all contexts)
  python scripts/bench_needle.py CTX          (one context, in-process)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CTXS = [65536, 131072, 524288, 1048576]
ANCHORS = ["quest", "block_max", "block_mean", "fixed"]
PAGE = 64
BUDGET = 64
R, DR, H, B = 512, 64, 16, 32


def run_ctx(ctx: int):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.ops.sparse_attention import (
        select_pages,
        sparse_mla_decode,
    )

    P = ctx // PAGE
    D = R + DR
    rng = np.random.default_rng(ctx)

    key = jax.random.PRNGKey(1)
    k_a, k_b = jax.random.split(key)
    buf_a = jax.random.normal(k_a, (P + 1, PAGE, R), jnp.bfloat16)
    buf_b = jax.random.normal(k_b, (P + 1, PAGE, DR), jnp.bfloat16)

    # queries + needle placement (host-side bookkeeping, device writes)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    q_sel = q[:, 0]  # the needle aligns with head 0's query
    # inlier alpha: needle dot = alpha*||q||^2 ~ alpha*D; max random ~
    # sqrt(2 ln(ctx*H)) * sqrt(D); target needle ~2x that max
    alpha = 2.0 * np.sqrt(2 * np.log(ctx * H)) / np.sqrt(D)
    variants = {
        "outlier": (4.5 * np.sign(q_sel)).astype(np.float32),
        "inlier": (alpha * q_sel).astype(np.float32),
    }
    pages = rng.integers(1, P + 1, B)
    offs = rng.integers(0, PAGE, B)
    page_tables = jnp.broadcast_to(
        jnp.arange(1, P + 1, dtype=jnp.int32)[None], (B, P)
    )
    lengths = jnp.full((B,), ctx, jnp.int32)
    qj = jnp.asarray(q)

    out = {a: {} for a in ANCHORS}
    for vname, needle_keys in variants.items():
        va = buf_a.at[jnp.asarray(pages), jnp.asarray(offs)].set(
            jnp.asarray(needle_keys[:, :R], jnp.bfloat16)
        )
        vb = buf_b.at[jnp.asarray(pages), jnp.asarray(offs)].set(
            jnp.asarray(needle_keys[:, R:], jnp.bfloat16)
        )
        # summary planes from the final buffers (dense-filled pages)
        af = va.astype(jnp.float32)
        bf = vb.astype(jnp.float32)
        planes = {
            "smin": jnp.concatenate([af.min(1), bf.min(1)], -1),
            "smax": jnp.concatenate([af.max(1), bf.max(1)], -1),
            "ssum": jnp.concatenate([af.sum(1), bf.sum(1)], -1),
            "sfix": jnp.concatenate([af[:, 0], bf[:, 0]], -1),
        }
        del af, bf

        for anchor in ANCHORS:

            @jax.jit
            def sel_fn(qj, planes, page_tables, lengths, _a=anchor):
                return select_pages(
                    qj, planes, page_tables, lengths, PAGE, BUDGET, _a,
                    "layer",
                )

            sel = np.asarray(sel_fn(qj, planes, page_tables, lengths))
            # sel holds page-table SLOTS; needle slot row b = pages[b]-1
            hit = [(pages[i] - 1) in sel[i] for i in range(B)]
            row = {f"{vname}_acc": round(float(np.mean(hit)), 4)}

            if ctx <= 131072 and vname == "outlier":
                # dense-attention fidelity on the first 8 queries
                nb = 8
                q_abs = qj[:nb, :, :R]
                q_pe = qj[:nb, :, R:]
                scale = 1.0 / np.sqrt(D)

                @jax.jit
                def fid(q_abs, q_pe, va, vb, planes, page_tables,
                        lengths, _a=anchor):
                    sp = sparse_mla_decode(
                        q_abs, q_pe, va, vb, planes["smin"],
                        planes["smax"], page_tables[:nb], lengths[:nb],
                        PAGE, BUDGET, scale, anchor=_a, planes=planes,
                    )
                    ckv = va[page_tables[:nb]].astype(jnp.float32)
                    kpe = vb[page_tables[:nb]].astype(jnp.float32)
                    sc = (
                        jnp.einsum("bhr,bspr->bhsp",
                                   q_abs.astype(jnp.float32), ckv)
                        + jnp.einsum("bhd,bspd->bhsp",
                                     q_pe.astype(jnp.float32), kpe)
                    ) * scale
                    attn = jax.nn.softmax(
                        sc.reshape(nb, H, -1), -1
                    ).reshape(sc.shape)
                    dn = jnp.einsum("bhsp,bspr->bhr", attn, ckv)
                    cos = jnp.sum(sp * dn, -1) / (
                        jnp.linalg.norm(sp, axis=-1)
                        * jnp.linalg.norm(dn, axis=-1) + 1e-9
                    )
                    return jnp.mean(cos)

                row["dense_cosine"] = round(
                    float(fid(q_abs, q_pe, va, vb, planes,
                              page_tables, lengths)), 4
                )
            out[anchor].update(row)
            print(f"  ctx {ctx}: {anchor} {vname} -> {row}",
                  file=sys.stderr, flush=True)
        del va, vb, planes
    print("RESULT " + json.dumps({str(ctx): out}), flush=True)


def main():
    if len(sys.argv) > 1:
        run_ctx(int(sys.argv[1]))
        return
    doc = {
        "metric": (
            "needle-page retrieval accuracy per anchor type, budget-64 "
            "selection over planted-needle KV, ON-CHIP. outlier_acc: "
            "per-dim out-of-envelope needle (the regime bound-based "
            "retrieval targets); inlier_acc: dot-aligned but inside the "
            "per-dim envelope (documents the honest limit of summary-"
            "based anchors); dense-attention output cosine at <=128K"
        ),
        "page_size": PAGE, "budget_pages": BUDGET, "needles": B,
    }
    for ctx in CTXS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(ctx)],
            capture_output=True, text=True, timeout=1800,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        if lines:
            doc.update(json.loads(lines[-1][7:]))
            print(lines[-1], flush=True)
        else:
            print(f"ctx {ctx} FAILED: {p.stderr[-1000:]}", flush=True)
    with open("/root/repo/BENCH_NEEDLE.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
