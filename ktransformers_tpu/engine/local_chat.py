"""Model loading front-door + interactive chat (local_chat analog).

Reference: archive/ktransformers/local_chat.py — config+tokenizer from HF,
optimize_and_load_gguf, prefill_and_generate. Here: detect the weight
source (HF safetensors dir / GGUF file / packed-params dir), build the
spec, apply the placement spec, and run the Generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.engine.generate import GenerateConfig, Generator
from ktransformers_tpu.engine.sampler import SamplingConfig
from ktransformers_tpu.models.loading import build_params
from ktransformers_tpu.models.spec import ModelSpec, spec_from_hf_config


def detect_source(path: str) -> str:
    """'packed' | 'hf' | 'gguf'"""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "manifest.json")):
            return "packed"
        if os.path.exists(os.path.join(path, "config.json")):
            return "hf"
        if any(f.endswith(".gguf") for f in os.listdir(path)):
            return "gguf"
    if path.endswith(".gguf"):
        return "gguf"
    raise ValueError(f"cannot detect model format at {path}")


def load_spec(path: str, config_path: str | None = None) -> ModelSpec:
    src = detect_source(path)
    if config_path is None:
        if src in ("hf", "packed"):
            config_path = os.path.join(path, "config.json")
        else:
            # derive the spec from GGUF metadata (llama.cpp keys)
            from ktransformers_tpu.loader.gguf import GGUFDir
            from ktransformers_tpu.models.spec import spec_from_gguf_fields

            gd = GGUFDir(path)
            try:
                return spec_from_gguf_fields(gd.fields)
            finally:
                gd.close()
    with open(config_path) as f:
        return spec_from_hf_config(json.load(f))


def resolve_spec_provider(path: str, config_path: str | None = None):
    """(spec, provider, exact) for a non-packed source — the streaming
    converter's entry (cli convert --stream)."""
    src = detect_source(path)
    spec = load_spec(path, config_path)
    if src == "hf":
        from ktransformers_tpu.loader.providers import SafetensorsProvider

        provider = SafetensorsProvider(path)
        exact = False
        if os.path.isdir(path):
            from ktransformers_tpu.loader.gptq import (
                QuantizedSafetensorsProvider,
                detect_quant_method,
            )

            method = detect_quant_method(path)
            if method is not None:
                provider = QuantizedSafetensorsProvider(provider, method)
                exact = True
        return spec, provider, exact
    from ktransformers_tpu.loader.providers import GGUFProvider

    return spec, GGUFProvider(path), True


def load_model(
    path: str,
    quant: str = "int8",
    moe_quant: str = "int4_g",
    config_path: str | None = None,
    placement=None,
    save_packed: str | None = None,
    progress=None,
    exact_gguf: bool = True,
):
    """Returns (spec, params). `save_packed` writes the converted params so
    the next start loads them directly (reference .kt cache analog)."""
    src = detect_source(path)
    spec = load_spec(path, config_path)
    if src == "packed":
        from ktransformers_tpu.models.checkpoint import load_params

        return spec, load_params(path)

    if src == "hf":
        from ktransformers_tpu.loader.providers import SafetensorsProvider

        provider = SafetensorsProvider(path)
        exact_gguf = False
        if os.path.isdir(path):
            from ktransformers_tpu.loader.gptq import (
                QuantizedSafetensorsProvider,
                detect_quant_method,
            )

            method = detect_quant_method(path)
            if method is not None:
                # GPTQ/AWQ checkpoint: carry the packed codes losslessly
                # into int4_gz (reference loader.py:515-1227)
                provider = QuantizedSafetensorsProvider(provider, method)
                exact_gguf = True
    else:
        from ktransformers_tpu.loader.providers import GGUFProvider

        provider = GGUFProvider(path)

    params = build_params(
        provider,
        spec,
        quant=quant,
        moe_quant=moe_quant,
        placement=placement,
        progress=progress,
        # GGUF default: compute on the original block codes (lossless
        # repack), matching the reference's direct-on-GGUF kernels
        exact_gguf=exact_gguf,
    )
    if save_packed:
        from ktransformers_tpu.models.checkpoint import save_params

        save_params(params, save_packed)
        # also copy the config for later spec reconstruction
        if config_path or src == "hf":
            import shutil

            shutil.copy(
                config_path or os.path.join(path, "config.json"),
                os.path.join(save_packed, "config.json"),
            )
    return spec, params


def load_tokenizer(path: str, tokenizer_path: str | None = None):
    tp = tokenizer_path or path
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(tp, trust_remote_code=True)
    except Exception:
        from ktransformers_tpu.serving.server import SimpleTokenizer

        return SimpleTokenizer()


def chat_loop(
    spec,
    params,
    tokenizer,
    max_len: int = 4096,
    max_new_tokens: int = 512,
    temperature: float = 0.6,
    top_p: float = 0.95,
    draft=None,  # optional draft Generator: greedy turns run
    # draft-model speculation (engine/draft_spec.py)
):
    """Interactive REPL (reference local_chat.py main loop)."""
    gen = Generator(params, spec, max_len=max_len, batch=1)
    history = []
    print("ktransformers-tpu chat — empty line to exit", flush=True)
    while True:
        try:
            user = input("you> ").strip()
        except EOFError:
            break
        if not user:
            break
        history.append({"role": "user", "content": user})
        if hasattr(tokenizer, "apply_chat_template"):
            try:
                ids = tokenizer.apply_chat_template(
                    history, add_generation_prompt=True
                )
            except Exception:
                ids = tokenizer.encode(user)
        else:
            ids = tokenizer.encode(user)
        t0 = time.perf_counter()
        pieces = []

        def on_token(tok_np):
            text = tokenizer.decode([int(tok_np[0])])
            pieces.append(text)
            print(text, end="", flush=True)

        cfg_g = GenerateConfig(
            max_new_tokens=max_new_tokens,
            sampling=SamplingConfig(temperature=temperature, top_p=top_p),
            eos_token_id=getattr(tokenizer, "eos_token_id", None),
        )
        if draft is not None and temperature <= 0:
            from ktransformers_tpu.engine.draft_spec import draft_generate

            out, _stats = draft_generate(gen, draft, list(ids), cfg_g)
            for t in out:
                on_token(np.asarray([t]))
        else:
            out = gen.generate([list(ids)], cfg_g, on_token=on_token)[0]
        dt = time.perf_counter() - t0
        print(
            f"\n[{len(out)} tokens, {len(out)/dt:.1f} tok/s]",
            file=sys.stderr,
        )
        history.append({"role": "assistant", "content": "".join(pieces)})
