"""kt-tpu command line: chat / serve / convert / bench / doctor.

Reference analog: kt-kernel/python/cli (typer `kt` app with run, chat,
model, doctor, config, sft, bench commands).
"""

from __future__ import annotations

import json
import os
import sys

import click


@click.group()
def cli():
    """ktransformers-tpu: TPU-native quantized MoE inference."""


_model_opts = [
    click.option("--quant", default="int8", show_default=True,
                 help="quant format for dense/attention weights"),
    click.option("--moe-quant", default="int4_g", show_default=True,
                 help="quant format for routed experts"),
    click.option("--config", "config_path", default=None,
                 help="HF config.json (required for raw GGUF)"),
    click.option("--placement", "placement_yaml", default=None,
                 help="placement rules YAML (per-module quant/shard)"),
    click.option("--tokenizer", "tokenizer_path", default=None),
]


def model_options(f):
    for opt in reversed(_model_opts):
        f = opt(f)
    return f


def _load(model_path, quant, moe_quant, config_path, placement_yaml,
          save_packed=None):
    from ktransformers_tpu.engine.local_chat import load_model

    placement = None
    if placement_yaml:
        # library preset name (kt placements) or a YAML file path
        from ktransformers_tpu.placement.library import load_placement

        placement = load_placement(placement_yaml)
    return load_model(
        model_path,
        quant=quant,
        moe_quant=moe_quant,
        config_path=config_path,
        placement=placement,
        save_packed=save_packed,
        progress=lambda msg: print(f"\r{msg}", end="", file=sys.stderr),
    )


@cli.command()
@click.argument("model_path")
@model_options
@click.option("--max-new-tokens", default=512, show_default=True)
@click.option("--temperature", default=0.6, show_default=True)
@click.option("--top-p", default=0.95, show_default=True)
@click.option("--max-len", default=4096, show_default=True)
@click.option("--speculative-model", default=None,
              help="path to a smaller DRAFT model sharing the tokenizer; "
              "greedy requests then run draft-model speculation "
              "(engine/draft_spec.py; reference --speculative_model, "
              "archive/ktransformers/server/args.py:31)")
def chat(model_path, quant, moe_quant, config_path, placement_yaml,
         tokenizer_path, max_new_tokens, temperature, top_p, max_len,
         speculative_model):
    """Interactive chat with a local model (local_chat analog)."""
    from ktransformers_tpu.engine.local_chat import chat_loop, load_tokenizer

    spec, params = _load(
        model_path, quant, moe_quant, config_path, placement_yaml
    )
    tok = load_tokenizer(model_path, tokenizer_path)
    draft = None
    if speculative_model:
        d_spec, d_params = _load(
            speculative_model, quant, moe_quant, None, None
        )
        from ktransformers_tpu.engine.generate import Generator

        draft = Generator(d_params, d_spec, max_len=max_len, batch=1)
    chat_loop(
        spec, params, tok,
        max_len=max_len, max_new_tokens=max_new_tokens,
        temperature=temperature, top_p=top_p, draft=draft,
    )


@cli.command()
@click.argument("model_path", required=False)
@model_options
@click.option("--config-file", default=None,
              help="YAML/JSON ServerConfig (serving/config.py); CLI flags "
              "override file values")
@click.option("--host", default=None)
@click.option("--port", default=None, type=int)
@click.option("--api-key", default=None,
              help="require Authorization: Bearer <key> on /v1 and /api")
@click.option("--model-name", default=None)
@click.option("--max-batch-size", default=None, type=int)
@click.option("--prefill-chunk", default=None, type=int)
@click.option("--num-pages", default=None, type=int)
@click.option("--page-size", default=None, type=int)
@click.option("--max-pages-per-query", default=None, type=int)
@click.option("--sparse-budget", default=None, type=int,
              help="top-K-page decode attention (long context)")
@click.option("--sparse-anchor", default=None,
              type=click.Choice(["quest", "block_max", "block_mean",
                                 "fixed", "dynamic"]),
              help="page-summary anchor kind (reference AnchorType)")
@click.option("--sparse-retrieval", default=None,
              type=click.Choice(["layer", "kvhead", "qhead"]),
              help="retrieval granularity (reference RetrievalType)")
@click.option("--offload/--no-offload", default=None,
              help="bigger-than-HBM mode: routed experts compute in host "
              "RAM (offload/paged_engine.py); attention/router/shared "
              "experts stay on-chip")
@click.option("--no-web", "mount_web", flag_value=False, default=None,
              help="do not mount the chat UI at /")
def serve(model_path, quant, moe_quant, config_path, placement_yaml,
          tokenizer_path, config_file, host, port, api_key, model_name,
          max_batch_size, prefill_chunk, num_pages, page_size,
          max_pages_per_query, sparse_budget, sparse_anchor,
          sparse_retrieval, offload, mount_web):
    """OpenAI-compatible server (balance_serve analog). All knobs also
    load from --config-file (the reference's ~80-flag ConfigArgs role)."""
    from ktransformers_tpu.engine.local_chat import load_tokenizer
    from ktransformers_tpu.serving.config import ServerConfig
    from ktransformers_tpu.serving.engine import ServeEngine
    from ktransformers_tpu.serving.server import serve as run_server

    overrides = dict(
        model_path=model_path, config_path=config_path,
        tokenizer_path=tokenizer_path, placement_yaml=placement_yaml,
        host=host, port=port, api_key=api_key, model_name=model_name,
        max_batch_size=max_batch_size, prefill_chunk=prefill_chunk,
        num_pages=num_pages, page_size=page_size,
        max_pages_per_query=max_pages_per_query,
        sparse_budget=sparse_budget, sparse_anchor=sparse_anchor,
        sparse_retrieval=sparse_retrieval, offload=offload,
        mount_web=mount_web,
    )
    # quant kinds come from model_options with non-None defaults; only
    # treat them as overrides when a config file is NOT supplying them
    if config_file:
        sc = ServerConfig.from_file(config_file, **overrides)
        if quant != "int8" or sc.quant is None:
            sc.quant = quant
        if moe_quant != "int4_g" or sc.moe_quant is None:
            sc.moe_quant = moe_quant
    else:
        sc = ServerConfig(**{k: v for k, v in overrides.items()
                             if v is not None},
                          quant=quant, moe_quant=moe_quant)
    if not sc.model_path:
        raise click.ClickException(
            "model path required (argument or config-file model_path)"
        )

    spec, params = _load(
        sc.model_path, sc.quant, sc.moe_quant, sc.config_path,
        sc.placement_yaml,
    )
    engine_cls = ServeEngine
    if sc.offload:
        from ktransformers_tpu.offload.paged_engine import (
            HostOffloadServeEngine,
        )

        engine_cls = HostOffloadServeEngine
    engine = engine_cls(
        params,
        spec,
        sc.scheduler_config(),
        num_pages=sc.num_pages,
        sparse_budget=sc.sparse_budget,
        sparse_anchor=sc.sparse_anchor or "quest",
        sparse_retrieval=sc.sparse_retrieval or "layer",
        collect_routing=sc.collect_routing,
    )
    engine.decode_pipeline_depth = sc.decode_pipeline_depth
    tok = load_tokenizer(sc.model_path, sc.tokenizer_path)
    run_server(engine, tok, host=sc.host, port=sc.port,
               model_name=sc.model_name, api_key=sc.api_key,
               mount_web=sc.mount_web)


@cli.command()
@click.argument("model_path")
@click.argument("out_dir")
@click.option("--stream/--no-stream", default=False,
              help="layer-streamed conversion with resume: bounded memory "
              "for 100s-of-GB checkpoints; re-running skips finished units")
@model_options
def convert(model_path, out_dir, quant, moe_quant, config_path,
            placement_yaml, tokenizer_path, stream):
    """Convert HF/GGUF weights to the packed on-disk format
    (convert_cpu_weights.py analog; --stream = chunked+resume analog of
    convert_cpu_weights.py:1084)."""
    if stream:
        from ktransformers_tpu.engine.local_chat import resolve_spec_provider
        from ktransformers_tpu.models.checkpoint import stream_convert

        spec, provider, exact = resolve_spec_provider(
            model_path, config_path
        )
        stream_convert(
            provider, spec, out_dir, quant=quant, moe_quant=moe_quant,
            exact_gguf=exact,
            progress=lambda m: print(f"  converted {m}", flush=True),
        )
        print(f"\nstream-packed params written to {out_dir}")
        return
    _load(
        model_path, quant, moe_quant, config_path, placement_yaml,
        save_packed=out_dir,
    )
    print(f"\npacked params written to {out_dir}")


@cli.command()
def bench():
    """Run the standard single-chip benchmark."""
    import runpy

    runpy.run_path("bench.py", run_name="__main__")


@cli.command()
def doctor():
    """Environment diagnostics (kt doctor analog)."""
    import jax

    import ktransformers_tpu

    info = {
        "ktransformers_tpu": ktransformers_tpu.__version__,
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "device_count": jax.device_count(),
    }
    try:
        from ktransformers_tpu.ops import pallas as p

        info["pallas_enabled"] = p.maybe_enable()
    except Exception as e:  # pragma: no cover
        info["pallas_enabled"] = f"error: {e}"
    try:
        import jax.numpy as jnp

        x = jnp.ones((128, 128), jnp.bfloat16)
        (x @ x).block_until_ready()
        info["matmul_smoke"] = "ok"
    except Exception as e:  # pragma: no cover
        info["matmul_smoke"] = f"error: {e}"
    print(json.dumps(info, indent=2))


@cli.command()
@click.argument("model_path")
@click.argument("dataset_path")
@model_options
@click.option("--output", "output_path", default="adapter.safetensors",
              show_default=True)
@click.option("--rank", default=8, show_default=True)
@click.option("--alpha", default=16.0, show_default=True)
@click.option("--lr", default=1e-4, show_default=True)
@click.option("--epochs", default=1, show_default=True)
@click.option("--batch-size", default=4, show_default=True)
@click.option("--seq-len", default=512, show_default=True)
def sft(model_path, dataset_path, quant, moe_quant, config_path,
        placement_yaml, tokenizer_path, output_path, rank, alpha, lr,
        epochs, batch_size, seq_len):
    """LoRA fine-tune on a JSON dataset (kt sft analog); saves a
    safetensors adapter."""
    from ktransformers_tpu.engine.local_chat import load_tokenizer
    from ktransformers_tpu.sft.data import load_sft_dataset
    from ktransformers_tpu.sft.lora import LoRAConfig, init_lora, save_lora
    from ktransformers_tpu.sft.train import TrainConfig, Trainer

    spec, params = _load(
        model_path, quant, moe_quant, config_path, placement_yaml
    )
    tok = load_tokenizer(model_path, tokenizer_path)
    pl = init_lora(params, spec, LoRAConfig(rank=rank, alpha=alpha))
    trainer = Trainer(pl, spec, TrainConfig(learning_rate=lr, seq_len=seq_len))
    step = 0
    for epoch in range(epochs):
        for input_ids, labels in load_sft_dataset(
            dataset_path, tok, seq_len=seq_len, batch_size=batch_size
        ):
            loss = trainer.train_step(input_ids, labels)
            step += 1
            print(f"epoch {epoch} step {step} loss {loss:.4f}", file=sys.stderr)
    save_lora(trainer.params, output_path)
    print(f"adapter saved to {output_path}")


@cli.group()
def models():
    """Model registry (kt model list/show analog)."""


@models.command("list")
def models_list():
    """Known model presets with size and v5e-fit estimates."""
    from ktransformers_tpu.models.registry import list_models

    rows = list_models()
    wn = max(len(r["name"]) for r in rows)
    print(f"{'name':{wn}}  params  active  quant         gb      chips")
    for r in rows:
        fit = "1 (fits)" if r["fits_v5e"] else str(r["min_v5e_chips"])
        print(
            f"{r['name']:{wn}}  {r['params_b']:>5.1f}B  {r['active_b']:>5.1f}B"
            f"  {r['quant']:<12}  {r['total_gb']:>6.1f}  {fit}"
        )


@cli.command("placements")
@click.argument("name", required=False)
def placements_cmd(name):
    """List shipped placement-rule files, or print one by preset name
    (the stock optimize_rules/ library analog; use with --placement)."""
    from ktransformers_tpu.placement.library import (
        RULES_DIR,
        available_placements,
    )

    if name is None:
        for n in available_placements():
            print(n)
        return
    path = os.path.join(RULES_DIR, name + ".yaml")
    if not os.path.exists(path):
        raise click.ClickException(
            f"no shipped placement {name!r}; see `kt placements`"
        )
    with open(path) as f:
        print(f.read(), end="")


@models.command("show")
@click.argument("name")
def models_show(name):
    """Full spec summary + TPU run recommendation for one preset."""
    from ktransformers_tpu.models.registry import REGISTRY, show_model

    if name not in REGISTRY:
        raise click.ClickException(
            f"unknown model {name!r}; see `kt models list`"
        )
    print(json.dumps(show_model(name), indent=2))


@cli.command()
@click.argument("model_path")
@click.argument("out_dir")
@model_options
def quant(model_path, out_dir, quant, moe_quant, config_path,
          placement_yaml, tokenizer_path):
    """Quantize a checkpoint to packed QTensors and report what was
    produced (reference `kt quant` / convert quant modes analog).

    Same on-disk format as `kt convert`; prints a per-kind tensor count
    and byte total so the kind choice and resulting footprint are visible
    before any serving run. Accuracy at a kind is measured with
    `kt eval-ppl` on the packed output."""
    import jax

    from ktransformers_tpu.quant.formats import QTensor

    spec, params = _load(
        model_path, quant, moe_quant, config_path, placement_yaml,
        save_packed=out_dir,
    )
    kinds: dict[str, dict] = {}
    for x in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, QTensor)
    ):
        if isinstance(x, QTensor):
            k, nb = x.kind, sum(
                a.size * a.dtype.itemsize for a in jax.tree.leaves(x)
            )
        else:
            k, nb = str(x.dtype), x.size * x.dtype.itemsize
        d = kinds.setdefault(k, {"tensors": 0, "gb": 0.0})
        d["tensors"] += 1
        d["gb"] += nb / 1e9
    for d in kinds.values():
        d["gb"] = round(d["gb"], 3)
    print(json.dumps({"out_dir": out_dir, "kinds": kinds}, indent=2))


@cli.command()
@click.option("--model", "preset", default="deepseek-v2-lite",
              show_default=True, help="registry preset to plan for")
@click.option("--quant", default=None, help="override dense quant kind")
@click.option("--moe-quant", default=None, help="override expert kind")
@click.option("--output", default=None, help="write the plan JSON here")
@click.option("--emit-server-config", "server_config_out", default=None,
              help="also write a ServerConfig file consumable by "
              "`kt serve --config-file`")
def tune(preset, quant, moe_quant, output, server_config_out):
    """Plan serving knobs for a model on this device (reference tuner
    analog: kt-kernel's kernel/config search, README.md:548-559).

    Static planning from the registry size model: page size, scheduler
    shape, resident-vs-offload, chip count; calibrated against the
    measured v5e kernel rates recorded in this repo's benches."""
    from ktransformers_tpu.models.registry import (
        REGISTRY, V5E_HBM_GB, estimate_bytes,
    )

    if preset not in REGISTRY:
        raise click.ClickException(
            f"unknown model {preset!r}; see `kt models list`"
        )
    e = REGISTRY[preset]
    qk, mk = quant or e.quant, moe_quant or e.moe_quant
    spec = e.spec()
    est = estimate_bytes(spec, qk, mk)
    # measured on-chip rates (STATUS.md): gathered W4A8 MoE ~630 GB/s,
    # dense int8 ~800 GB/s; decode is bandwidth-bound
    eff_bw = 0.75 * 819e9
    decode_tps = eff_bw / (est["active_gb_per_token"] * 1e9)
    kv_per_tok = (
        spec.attention.kv_lora_rank + spec.attention.qk_rope_head_dim
        if spec.attention.kind == "mla"
        else 2 * spec.attention.num_kv_heads * spec.attention.head_dim
    ) * 2 * spec.num_layers  # bf16
    free_gb = max(0.5, V5E_HBM_GB * 0.92 - est["total_gb"])
    max_kv_tokens = int(free_gb * 1e9 / kv_per_tok)
    plan = {
        "model": preset,
        "quant": qk,
        "moe_quant": mk,
        "weights_gb": est["total_gb"],
        "mode": "resident" if est["fits_v5e"] else "host-offload or EP "
        f"over >={est['min_v5e_chips']} chips",
        "est_decode_tok_s_single": round(decode_tps, 1),
        "kv_bytes_per_token": kv_per_tok,
        "max_kv_tokens_on_chip": max_kv_tokens,
        "serve": {
            "page_size": 64,
            "num_pages": max(64, max_kv_tokens // 64),
            "max_batch_size": 8 if est["fits_v5e"] else 64,
            "prefill_chunk": 256,
        },
    }
    out = json.dumps(plan, indent=2)
    print(out)
    if output:
        with open(output, "w") as f:
            f.write(out)
    if server_config_out:
        sc = {
            "quant": qk,
            "moe_quant": mk,
            "offload": not est["fits_v5e"],
            **plan["serve"],
        }
        with open(server_config_out, "w") as f:
            f.write(json.dumps(sc, indent=2))
        print(f"server config written to {server_config_out}",
              file=sys.stderr)


@cli.command("eval-ppl")
@click.argument("model_path")
@click.argument("text_file")
@model_options
@click.option("--chunk", default=512, show_default=True)
@click.option("--max-tokens", default=8192, show_default=True)
def eval_ppl(model_path, text_file, quant, moe_quant, config_path,
             placement_yaml, tokenizer_path, chunk, max_tokens):
    """Teacher-forced perplexity over a text file (quant-parity harness,
    doc/en/benchmark.md analog)."""
    from ktransformers_tpu.engine.local_chat import load_tokenizer
    from ktransformers_tpu.utils.eval import perplexity

    spec, params = _load(
        model_path, quant, moe_quant, config_path, placement_yaml
    )
    tok = load_tokenizer(model_path, tokenizer_path)
    with open(text_file) as f:
        ids = list(tok.encode(f.read()))[:max_tokens]
    ppl = perplexity(params, spec, ids, chunk=chunk)
    print(json.dumps({"perplexity": round(ppl, 4), "tokens": len(ids)}))


@cli.command("eval-mc")
@click.argument("endpoint")
@click.argument("dataset_json")
@click.option("--limit", default=None, type=int)
def eval_mc(endpoint, dataset_json, limit):
    """Multiple-choice accuracy against an OpenAI-compatible endpoint
    (mmlu_test.py analog)."""
    from ktransformers_tpu.utils.eval import mmlu_eval_http

    print(json.dumps(mmlu_eval_http(endpoint, dataset_json, limit=limit)))


if __name__ == "__main__":
    cli()
