"""Generator: chunked prefill + jitted decode with donated KV cache.

Reference analog: archive/ktransformers/util/utils.py `prefill_and_generate`
(chunked prefill loop, utils.py:496-511) + CUDAGraphRunner decode
(cuda_graph_runner.py). CUDA-graph capture maps to `jax.jit` with donated
cache buffers: the same fixed-shape step is compiled once and replayed.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.engine.sampler import SamplingConfig, sample
from ktransformers_tpu.ops.rope import precompute_rope_tables


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 128
    prefill_chunk: int = 256  # reference: chunk_size / chunked_prefill_size
    sampling: SamplingConfig = SamplingConfig()
    eos_token_id: int | None = None
    seed: int = 0


class Generator:
    """Owns the jitted steps for one (spec, params, batch, max_len) shape set.

    Compiled entries are cached per query-length bucket, mirroring the
    reference's per-batch-size CUDA graph buckets (model_runner.py:58-69).
    """

    def __init__(
        self,
        params,
        spec: ModelSpec,
        max_len: int = 2048,
        batch: int = 1,
        cache_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
    ):
        from ktransformers_tpu.ops import pallas as pallas_ops
        from ktransformers_tpu.utils.device_prep import prepare_params

        params = prepare_params(params, pallas_ops.maybe_enable(), spec)
        self.params = params
        self.spec = spec
        self.max_len = max_len
        self.batch = batch
        self.cache_dtype = cache_dtype
        self.compute_dtype = compute_dtype
        self.rope_tables = precompute_rope_tables(spec.rope)
        self._steps = {}  # q_len -> jitted fn

    def new_cache(self) -> KVCache:
        return KVCache.create(
            self.spec, self.batch, self.max_len, dtype=self.cache_dtype
        )

    def _step(self, q_len: int):
        if q_len not in self._steps:
            spec = self.spec
            rope_tables = self.rope_tables
            compute_dtype = self.compute_dtype

            @partial(jax.jit, donate_argnums=(2,))
            def step(params, tokens, cache):
                return forward(
                    params,
                    spec,
                    tokens,
                    cache,
                    rope_tables=rope_tables,
                    compute_dtype=compute_dtype,
                )

            # late-bind self.params: the first decode step may relayout it
            self._steps[q_len] = lambda *a, _s=step: _s(self.params, *a)
        return self._steps[q_len]

    def _decode_step(self, sampling: SamplingConfig):
        """Fused decode step: forward + sampling inside one jit, so the host
        loop only moves one int32 per token (the reference keeps sampling on
        device inside the CUDA graph for the same reason)."""
        key_ = ("decode", sampling)
        if key_ not in self._steps:
            spec = self.spec
            rope_tables = self.rope_tables
            compute_dtype = self.compute_dtype

            @partial(jax.jit, donate_argnums=(2,))
            def step(params, tok, cache, key):
                logits, cache = forward(
                    params,
                    spec,
                    tok,
                    cache,
                    rope_tables=rope_tables,
                    compute_dtype=compute_dtype,
                )
                key, sub = jax.random.split(key)
                nxt = sample(logits[:, -1], sub, sampling)
                return nxt, cache, key

            self._steps[key_] = lambda *a, _s=step: _s(self.params, *a)
        return self._steps[key_]

    def _decode_steps(self, sampling: SamplingConfig, k: int):
        """k fused decode steps in ONE jitted program (lax.scan over the
        step body, cache as carry): the host dispatches once and reads back
        k tokens. On the axon runtime a dispatch costs ~2 ms of host/tunnel
        work, so single-step decode is dispatch-bound once the device step
        drops under that; the scan amortizes it k-fold. Exact same math and
        PRNG sequence as k calls of _decode_step (reference analog: CUDA
        graph replay batching, cuda_graph_runner.py).

        Returns fn(tok [B], cache, key) -> (toks [B, k], cache, key)."""
        key_ = ("decode_multi", sampling, k)
        if key_ not in self._steps:
            spec = self.spec
            rope_tables = self.rope_tables
            compute_dtype = self.compute_dtype

            @partial(jax.jit, donate_argnums=(2,))
            def steps(params, tok, cache, key):
                # PURE Python unroll — no lax.scan wrapper. Even a
                # fully-unrolled scan (length=k, unroll=k) keeps a while
                # op around the body, and on this runtime that wrapper
                # costs ~9 ms per program (r4 decode_multi_lab: scan k=2
                # = 12.3 ms/program vs single-step 3.5 ms; the per-
                # program fixed cost is ~3 ms and a decode step's real
                # content is ~0.6 ms)
                toks = []
                for _ in range(k):
                    logits, cache = forward(
                        params,
                        spec,
                        tok[:, None],
                        cache,
                        rope_tables=rope_tables,
                        compute_dtype=compute_dtype,
                    )
                    key, sub = jax.random.split(key)
                    tok = sample(logits[:, -1], sub, sampling)
                    toks.append(tok)
                return jnp.stack(toks, axis=1), cache, key

            self._steps[key_] = lambda *a, _s=steps: _s(self.params, *a)
        return self._steps[key_]

    def _decode_step_penalized(self, sampling: SamplingConfig):
        """Decode step variant carrying [B, V] generated-token counts and a
        prompt-occurrence mask on device (penaltylib analog: repetition
        penalty sees prompt+output, presence/frequency see output only)."""
        key_ = ("decode_pen", sampling)
        if key_ not in self._steps:
            spec = self.spec
            rope_tables = self.rope_tables
            compute_dtype = self.compute_dtype

            @partial(jax.jit, donate_argnums=(2, 4))
            def step(params, tok, cache, key, counts, prompt_mask):
                logits, cache = forward(
                    params,
                    spec,
                    tok,
                    cache,
                    rope_tables=rope_tables,
                    compute_dtype=compute_dtype,
                )
                key, sub = jax.random.split(key)
                nxt = sample(
                    logits[:, -1], sub, sampling,
                    token_counts=counts, prompt_mask=prompt_mask,
                )
                b = nxt.shape[0]
                counts = counts.at[jnp.arange(b), nxt].add(1)
                return nxt, cache, key, counts

            self._steps[key_] = lambda *a, _s=step: _s(self.params, *a)
        return self._steps[key_]

    _prefill_chunk = 256

    def _prefill_step_fn(self, q_len: int):
        """Prefill-chunk step: logits for the LAST position only (the
        other rows' lm_head output is never read — ~1.3 ms at S=512)."""
        key_ = ("prefill", q_len)
        if key_ not in self._steps:
            spec = self.spec
            rope_tables = self.rope_tables
            compute_dtype = self.compute_dtype

            @partial(jax.jit, donate_argnums=(2,))
            def step(params, tokens, cache):
                return forward(
                    params,
                    spec,
                    tokens,
                    cache,
                    rope_tables=rope_tables,
                    compute_dtype=compute_dtype,
                    logits_last_only=True,
                )

            self._steps[key_] = lambda *a, _s=step: _s(self.params, *a)
        return self._steps[key_]

    def prefill(self, cache: KVCache, tokens: jnp.ndarray):
        """Chunked prefill of tokens [B, S]; returns (last_logits [B, V], cache)."""
        _, s = tokens.shape
        logits = None
        i = 0
        while i < s:
            n = min(self._prefill_chunk, s - i)
            logits, cache = self._prefill_step_fn(n)(
                tokens[:, i : i + n], cache
            )
            i += n
        return logits[:, -1], cache

    def generate(
        self,
        prompt_ids,
        cfg: GenerateConfig = GenerateConfig(),
        on_token=None,
    ) -> list[list[int]]:
        """Generate for a batch of prompts (list of token-id lists or [B, S]
        array of equal-length prompts). Returns generated ids per sequence."""
        self._prefill_chunk = cfg.prefill_chunk
        if isinstance(prompt_ids, (list, tuple)) and isinstance(
            prompt_ids[0], (list, tuple)
        ):
            lens = {len(p) for p in prompt_ids}
            assert len(lens) == 1, "batched generate requires equal prompt lengths"
            prompt = jnp.asarray(np.array(prompt_ids, np.int32))
        else:
            prompt = jnp.asarray(prompt_ids, jnp.int32)
            if prompt.ndim == 1:
                prompt = prompt[None]
        b, s = prompt.shape
        assert b == self.batch, (b, self.batch)
        assert s + cfg.max_new_tokens <= self.max_len

        cache = self.new_cache()
        last_logits, cache = self.prefill(cache, prompt)

        key = jax.random.PRNGKey(cfg.seed)
        out = [[] for _ in range(b)]
        finished = np.zeros(b, bool)
        use_counts = cfg.sampling.needs_counts
        v = last_logits.shape[-1]
        if use_counts:
            decode = self._decode_step_penalized(cfg.sampling)
            counts = jnp.zeros((b, v), jnp.int32)
            pmask_np = np.zeros((b, v), bool)
            for bi, row in enumerate(np.asarray(prompt)):
                pmask_np[bi, row] = True
            prompt_mask = jnp.asarray(pmask_np)
        else:
            decode = self._decode_step(cfg.sampling)
            counts = prompt_mask = None

        key, sub = jax.random.split(key)
        tok = sample(
            last_logits, sub, cfg.sampling,
            token_counts=counts, prompt_mask=prompt_mask,
        )
        if use_counts:
            counts = counts.at[jnp.arange(b), tok].add(1)

        # Software pipeline, depth D (default 8): keep D steps in flight
        # before blocking on the oldest token's readback; each dispatched
        # step starts its device->host token copy immediately, so by the
        # time the loop blocks on a token the bytes have landed and the
        # tunnel RTT amortizes over D tokens (the serving engine's decode
        # pipelining, engine.py). Measured on the 16B bench model over the
        # axon tunnel: depth 1 = 32 tok/s, 3 = 77, 6 = 153, 8+ = ~185
        # (plateau; the chained-loop ceiling is ~275). Cost: EOS observed
        # D-1 steps late (a few wasted device steps per sequence).
        import os

        # r5 depth sweep (scripts/ab_decode2.py, honest readbacks):
        # 8 -> 229-295 tok/s, 16 -> 319, 24+ -> ~350 plateau (the
        # delivery cap moves to device content + per-program overhead).
        depth = max(1, int(os.environ.get("KT_GENERATE_PIPELINE", "24")))
        # Multi-token dispatches (KT_DECODE_CHUNK, opt-in): each dispatch
        # runs `chunk` decode steps in one program (_decode_steps), so
        # per-dispatch host cost amortizes chunk-fold on top of the depth-D
        # readback pipeline. DEFAULT 1: on the axon runtime programs past a
        # size cliff (~10 MB HLO) dispatch at 100-400 ms regardless of
        # device time (measured round 3: full-model k=2 scan 387 ms/call vs
        # 3.7 ms single-step), so chunking only helps small models or
        # non-tunneled runtimes. Penalized sampling keeps chunk=1 (its
        # counts update is a distinct step signature).
        chunk = (
            1
            if use_counts
            else max(1, int(os.environ.get("KT_DECODE_CHUNK", "1")))
        )
        decode_multi = (
            self._decode_steps(cfg.sampling, chunk) if chunk > 1 else None
        )
        pending = [tok[:, None]]  # chunks of [B, k] device tokens
        dispatched = 1  # tokens produced on device (incl. prefill sample)
        resolved = 0
        while resolved < cfg.max_new_tokens:
            while (
                dispatched < cfg.max_new_tokens
                and not finished.all()
                and len(pending) < depth
            ):
                if use_counts:
                    nxt, cache, key, counts = decode(
                        tok[:, None], cache, key, counts, prompt_mask
                    )
                    toks = nxt[:, None]
                elif chunk > 1:
                    toks, cache, key = decode_multi(tok, cache, key)
                    nxt = toks[:, -1]
                else:
                    nxt, cache, key = decode(tok[:, None], cache, key)
                    toks = nxt[:, None]
                tok = nxt
                try:
                    # start the device->host copy now: by the time this
                    # chunk's blocking resolve comes around the bytes have
                    # landed (the serving engine's pipelining trick)
                    toks.copy_to_host_async()
                except Exception:  # pragma: no cover - backend-dependent
                    pass
                pending.append(toks)
                dispatched += toks.shape[1]
            if not pending:
                break  # every row finished; drop speculative leftovers
            chunk_np = np.asarray(pending.pop(0))
            for ci in range(chunk_np.shape[1]):
                if resolved >= cfg.max_new_tokens or finished.all():
                    break
                tok_np = chunk_np[:, ci]
                resolved += 1
                for bi in range(b):
                    if not finished[bi]:
                        out[bi].append(int(tok_np[bi]))
                        if (
                            cfg.eos_token_id is not None
                            and tok_np[bi] == cfg.eos_token_id
                        ):
                            finished[bi] = True
                if on_token is not None:
                    on_token(tok_np)
            if finished.all():
                break
        return out
