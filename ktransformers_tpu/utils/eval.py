"""Evaluation utilities: perplexity and HTTP multiple-choice harness.

Reference analogs: the PPL/MMLU parity harnesses
(archive/ktransformers/tests/mmlu_test.py + doc/en/benchmark.md) used to
demonstrate quantization parity. `perplexity` runs locally on a loaded
model; `mmlu_eval_http` hits any OpenAI-compatible endpoint (including
ours) with a JSON dataset of {question, choices, answer}.
"""

from __future__ import annotations

import json
import math

import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import ModelSpec


def perplexity(
    params,
    spec: ModelSpec,
    token_ids: list[int],
    chunk: int = 512,
    compute_dtype=jnp.bfloat16,
    return_nll: bool = False,  # mean NLL instead of exp(mean NLL) — for
    # parity harnesses whose models are degenerate enough to overflow exp
) -> float:
    """Teacher-forced perplexity over a token stream (chunked prefill; the
    KV cache carries context across chunks)."""
    import jax

    ids = np.asarray(token_ids, np.int32)
    n = len(ids)
    assert n >= 2
    cache = KVCache.create(spec, 1, n, dtype=compute_dtype)
    total_nll = 0.0
    total_tok = 0
    pos = 0
    while pos + 1 < n:
        end = min(pos + chunk, n - 1)
        inputs = jnp.asarray(ids[pos:end][None])  # predicts ids[pos+1..end]
        logits, cache = forward(
            params, spec, inputs, cache, compute_dtype=compute_dtype
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        targets = jnp.asarray(ids[pos + 1 : end + 1][None])
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
        total_nll += float(jnp.sum(nll))
        total_tok += end - pos
        pos = end
    mean_nll = total_nll / max(total_tok, 1)
    if return_nll:
        return mean_nll
    try:
        return math.exp(mean_nll)
    except OverflowError:  # garbage-weight parity harnesses compare NLL
        return float("inf")


def mmlu_eval_http(
    endpoint: str,
    dataset_path: str,
    model: str = "ktransformers-tpu",
    limit: int | None = None,
) -> dict:
    """Multiple-choice accuracy against an OpenAI-compatible server.

    dataset: JSON list of {"question": str, "choices": [str, ...],
    "answer": int}. Asks for a single-letter answer at temperature 0."""
    import urllib.request

    with open(dataset_path) as f:
        data = json.load(f)
    if limit:
        data = data[:limit]
    letters = "ABCDEFGH"
    correct = 0
    for item in data:
        prompt = item["question"] + "\n" + "\n".join(
            f"{letters[i]}. {c}" for i, c in enumerate(item["choices"])
        ) + "\nAnswer with a single letter.\nAnswer:"
        req = urllib.request.Request(
            endpoint.rstrip("/") + "/v1/completions",
            data=json.dumps(
                {"model": model, "prompt": prompt, "max_tokens": 2,
                 "temperature": 0}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            text = json.load(resp)["choices"][0]["text"].strip().upper()
        pred = next((i for i, c in enumerate(letters) if text.startswith(c)), -1)
        correct += int(pred == item["answer"])
    return {"accuracy": correct / max(len(data), 1), "n": len(data)}
