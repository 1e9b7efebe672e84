"""The compiled training step: loss + grads + optimizer under pjit.

TPU-native replacement for the reference hot loop body (reference:
my_affectgpt/tasks/base_task.py:101-198: autocast forward → GradScaler
backward → DDP all-reduce → optimizer): here the entire step — forward,
backward, optional gradient accumulation and the dp-axis gradient
reduction — is one XLA program. bf16 compute needs no loss scaling
(GradScaler is a CUDA-fp16 artifact); grads/optimizer state are fp32.

Only the `trainable` pytree (LoRA + mergers + projections) is
differentiated; frozen params (LLM base, encoders) are captured as
constants — the reference's requires_grad split (affectgpt.py:104-133).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax

from affectgpt_tpu.models import affectgpt
from affectgpt_tpu.parallel import mesh as mesh_lib


@chex.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: Any
    opt_state: Any


def create_train_state(trainable, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        trainable=trainable,
        opt_state=tx.init(trainable),
    )


def make_train_step(
    cfg: affectgpt.AffectGPTConfig,
    tx: optax.GradientTransformation,
    remat: bool = False,
    dropout_seed: Optional[int] = None,
) -> Callable:
    """Returns train_step(state, frozen, batch) -> (state, metrics).

    dropout_seed: enables train-mode dropout (the reference trains with
    model.train() — LoRA dropout 0.05 active, runner_base.py:461 +
    affectgpt.py:123). The per-step key is fold_in(seed, state.step):
    deterministic, resume-stable, and identical across processes (the
    mask of a dp-sharded batch is one logical array, so multihost loss
    stays bit-equal to single-process). None = eval-mode forward (what
    parity oracles pin).

    Mask bits come from the "rbg" PRNG (threefry key derivation +
    XLA RngBitGenerator for the bit stream): jax's default threefry
    stream costs 33% of step throughput at 3B b8 on one v5e (the LoRA
    masks are 252 [b,t,d]-shaped bernoullis per step); rbg cuts that to
    the 11% mask-apply floor (TPU-measured same-session A/B: 26.97
    samples/s dropout-off, 23.97 rbg, 18.09 threefry). Bits are
    deterministic per backend (all parity/resume tests run on one
    backend); AFFECTGPT_DROPOUT_PRNG=threefry opts back into
    backend-portable masks."""
    import os as _os

    _impl = _os.environ.get("AFFECTGPT_DROPOUT_PRNG", "rbg")

    def loss_fn(trainable, frozen, batch, dropout_rng):
        return affectgpt.forward_loss(
            frozen, trainable, cfg, batch, remat=remat, dropout_rng=dropout_rng
        )

    def train_step(state: TrainState, frozen, batch) -> Tuple[TrainState, Dict]:
        dropout_rng = (
            jax.random.fold_in(jax.random.key(dropout_seed, impl=_impl), state.step)
            if dropout_seed is not None
            else None
        )
        loss, grads = jax.value_and_grad(loss_fn)(
            state.trainable, frozen, batch, dropout_rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(step=state.step + 1, trainable=trainable, opt_state=opt_state)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def compile_train_step(
    mesh,
    cfg: affectgpt.AffectGPTConfig,
    tx: optax.GradientTransformation,
    state: TrainState,
    frozen,
    remat: bool = False,
    dropout_seed: Optional[int] = None,
):
    """jit the step with explicit shardings: params/opt-state per the tp
    rules, batch split over dp, state donated (in-place HBM update)."""
    step_fn = make_train_step(cfg, tx, remat=remat, dropout_seed=dropout_seed)

    # Optimizer-state leaves inherit their parameter's sharding: the optax
    # state pytree embeds the param subtree paths (mu/nu/...), so the same
    # path-regex rules apply directly.
    state_sh = TrainState(
        step=mesh_lib.replicated(mesh),
        trainable=mesh_lib.param_shardings(mesh, state.trainable),
        opt_state=mesh_lib.param_shardings(mesh, state.opt_state),
    )
    frozen_sh = mesh_lib.param_shardings(mesh, frozen)

    compiled = jax.jit(
        step_fn,
        in_shardings=(state_sh, frozen_sh, None),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )
    return compiled


def shard_state(mesh, state: TrainState) -> TrainState:
    return TrainState(
        step=jax.device_put(state.step, mesh_lib.replicated(mesh)),
        trainable=mesh_lib.shard_params(mesh, state.trainable),
        opt_state=jax.device_put(
            state.opt_state, mesh_lib.param_shardings(mesh, state.opt_state)
        ),
    )
