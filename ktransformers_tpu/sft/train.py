"""LoRA SFT trainer: cross-entropy over (input_ids, labels) batches, AdamW
on the LoRA leaves only, quantized base frozen.

Reference analog: the LLaMA-Factory x kt-kernel training step (SURVEY.md
§3.4): KTMoEFunction forward/backward + PEFT optimizer over fused LoRA
buffers. Here the backward is plain autodiff through the MoE ops and the
optimizer is optax; data parallelism = `dp` mesh axis via sharded batches.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ktransformers_tpu.models.model import KVCache, forward
from ktransformers_tpu.models.spec import ModelSpec
from ktransformers_tpu.sft.lora import merge_lora_params, split_lora

IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    max_grad_norm: float = 1.0
    seq_len: int = 512
    # rematerialize layer activations in the backward: peak activation
    # memory drops from O(L * S * H) to O(S * H) at ~1.3x FLOPs — the
    # trade that makes long-sequence SFT fit (reference ForwardCache,
    # sft_moe.hpp:249-278)
    remat: bool = True


def loss_fn(params, spec: ModelSpec, input_ids, labels, compute_dtype,
            remat: bool = False):
    """Next-token CE: logits[t] (the distribution after consuming token t)
    is scored against labels[t+1], i.e. logits[:, :-1] vs labels[:, 1:]
    (the HF/reference shift convention). labels == IGNORE_INDEX are masked
    (prompt tokens)."""
    b, s = input_ids.shape
    cache = KVCache.create(spec, b, s, dtype=compute_dtype)
    logits, _ = forward(
        params, spec, input_ids, cache, compute_dtype=compute_dtype,
        remat=remat,
    )
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    labels = labels[:, 1:]
    tgt = jnp.where(labels == IGNORE_INDEX, 0, labels)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = (labels != IGNORE_INDEX).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class Trainer:
    def __init__(
        self,
        params_with_lora,
        spec: ModelSpec,
        cfg: TrainConfig = TrainConfig(),
        compute_dtype=jnp.float32,
        mesh=None,  # jax.sharding.Mesh: distributed training. Batches
        # shard over `dp`; optimizer moments shard over `dp` too (the
        # ZeRO-1 role: each data-parallel rank owns a slice of the
        # optimizer state, GSPMD inserts the reduce-scatter/all-gather
        # pair — reference: the dist-training gap in python/sft/).
        # Base-param ep/tp shardings compose via parallel/shardings.py +
        # parallel_context, exactly as in inference.
    ):
        self.spec = spec
        self.cfg = cfg
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.lora, self.base = split_lora(params_with_lora)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(
                cfg.learning_rate,
                b1=cfg.b1,
                b2=cfg.b2,
                weight_decay=cfg.weight_decay,
            ),
        )
        self.opt_state = self.tx.init(
            jax.tree.map(lambda x: x, self.lora, is_leaf=lambda x: x is None)
        )
        if mesh is not None:
            self.opt_state = jax.tree.map(
                lambda x: jax.device_put(x, self._zero1_sharding(x)),
                self.opt_state,
            )
        self._step = None

    def _zero1_sharding(self, x):
        """dp-shard the leading axis of an optimizer moment when it
        divides; scalars/odd shapes replicate."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ktransformers_tpu.parallel.mesh import AXIS_DP

        dp = self.mesh.shape.get(AXIS_DP, 1)
        if (
            hasattr(x, "ndim") and x.ndim >= 1 and dp > 1
            and x.shape[0] % dp == 0
        ):
            return NamedSharding(
                self.mesh, P(AXIS_DP, *([None] * (x.ndim - 1)))
            )
        return NamedSharding(self.mesh, P())

    def _batch_sharding(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ktransformers_tpu.parallel.mesh import AXIS_DP

        return NamedSharding(self.mesh, P(AXIS_DP, None))

    def _build_step(self):
        spec, cdt, tx = self.spec, self.compute_dtype, self.tx
        remat = self.cfg.remat
        mesh = self.mesh

        @jax.jit
        def step(lora, base, opt_state, input_ids, labels):
            def lf(lora):
                params = merge_lora_params(lora, base)
                return loss_fn(params, spec, input_ids, labels, cdt, remat)

            loss, grads = jax.value_and_grad(lf)(lora)
            updates, opt_state = tx.update(grads, opt_state, lora)
            if mesh is not None:
                # keep the moments dp-sharded through the update (else
                # GSPMD may drift them to replicated after a few steps)
                opt_state = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, self._zero1_sharding(x)
                    ),
                    opt_state,
                )
            lora = optax.apply_updates(lora, updates)
            return loss, lora, opt_state

        return step

    def train_step(self, input_ids, labels) -> float:
        if self._step is None:
            self._step = self._build_step()
        input_ids = jnp.asarray(input_ids, jnp.int32)
        labels = jnp.asarray(labels, jnp.int32)
        if self.mesh is not None:
            sh = self._batch_sharding()
            input_ids = jax.device_put(input_ids, sh)
            labels = jax.device_put(labels, sh)
        loss, self.lora, self.opt_state = self._step(
            self.lora, self.base, self.opt_state, input_ids, labels,
        )
        return float(loss)

    @property
    def params(self):
        """Current merged params (for eval/generation)."""
        return merge_lora_params(self.lora, self.base)
