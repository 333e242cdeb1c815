"""Evaluation utility tests (ppl chunking invariance; HTTP MC harness)."""

import json

import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.models.init import init_params
from ktransformers_tpu.models.spec import spec_from_hf_config
from ktransformers_tpu.utils.eval import perplexity

from tests.test_generate import TINY_DS


def test_perplexity_chunk_invariant():
    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    ids = list(np.random.default_rng(0).integers(0, 96, 40))
    p1 = perplexity(params, spec, ids, chunk=40, compute_dtype=jnp.float32)
    p2 = perplexity(params, spec, ids, chunk=7, compute_dtype=jnp.float32)
    assert np.isfinite(p1) and p1 > 1
    assert abs(p1 - p2) / p1 < 1e-3  # chunking must not change the result


def test_mmlu_http(engine_server):
    from ktransformers_tpu.utils.eval import mmlu_eval_http

    url, tmpdir = engine_server
    data = [
        {"question": "2+2?", "choices": ["3", "4"], "answer": 1},
        {"question": "color of sky?", "choices": ["blue", "green"], "answer": 0},
    ]
    path = f"{tmpdir}/ds.json"
    with open(path, "w") as f:
        json.dump(data, f)
    res = mmlu_eval_http(url, path)
    assert res["n"] == 2 and 0.0 <= res["accuracy"] <= 1.0


import pytest  # noqa: E402


@pytest.fixture
def engine_server(tmp_path):
    """A real aiohttp server on a localhost port, torn down afterwards."""
    import socket
    import threading
    import asyncio

    from aiohttp import web

    from ktransformers_tpu.serving.engine import ServeEngine
    from ktransformers_tpu.serving.scheduler import SchedulerConfig
    from ktransformers_tpu.serving.server import OpenAIServer

    spec = spec_from_hf_config(dict(TINY_DS))
    params = init_params(spec, seed=0, quant="bf16")
    eng = ServeEngine(
        params, spec,
        SchedulerConfig(max_batch_size=2, prefill_chunk=8, page_size=8,
                        max_pages_per_query=16),
        num_pages=128, cache_dtype=jnp.float32, compute_dtype=jnp.float32,
    )
    eng.start()
    srv = OpenAIServer(eng)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    loop = asyncio.new_event_loop()
    runner = web.AppRunner(srv.app)

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    import time
    import urllib.request

    url = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            urllib.request.urlopen(url + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.05)
    yield url, str(tmp_path)
    loop.call_soon_threadsafe(loop.stop)
    eng.stop()
