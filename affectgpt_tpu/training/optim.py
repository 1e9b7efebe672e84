"""Optimizer and LR schedules.

Parity with the reference training hyper-parameters:
- `linear_warmup_cosine_lr` / `linear_warmup_step_lr` at iteration
  resolution (reference: my_affectgpt/common/optims.py:13-121).
- AdamW with a no-weight-decay group for ndim<2 / bias / norm params
  (reference: runners/runner_base.py:116-149).
- Gradient accumulation via optax.MultiSteps (reference accum_grad_iters,
  tasks/base_task.py:167-173).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from affectgpt_tpu import registry


@registry.register_lr_scheduler("linear_warmup_cosine_lr")
def linear_warmup_cosine_lr(
    init_lr: float,
    min_lr: float,
    warmup_steps: int,
    total_steps: int,
    warmup_start_lr: float = -1.0,
    **_,
) -> optax.Schedule:
    warmup_start = warmup_start_lr if warmup_start_lr >= 0 else init_lr

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = warmup_start + (init_lr - warmup_start) * jnp.minimum(step, warmup_steps) / max(warmup_steps, 1)
        progress = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        cosine = min_lr + 0.5 * (init_lr - min_lr) * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cosine)

    return schedule


@registry.register_lr_scheduler("linear_warmup_step_lr")
def linear_warmup_step_lr(
    init_lr: float,
    min_lr: float,
    warmup_steps: int,
    decay_rate: float = 1.0,
    steps_per_epoch: int = 1,
    warmup_start_lr: float = -1.0,
    **_,
) -> optax.Schedule:
    warmup_start = warmup_start_lr if warmup_start_lr >= 0 else init_lr

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = warmup_start + (init_lr - warmup_start) * jnp.minimum(step, warmup_steps) / max(warmup_steps, 1)
        epoch = jnp.floor(step / max(steps_per_epoch, 1))
        stepped = jnp.maximum(init_lr * (decay_rate ** epoch), min_lr)
        return jnp.where(step < warmup_steps, warm, stepped)

    return schedule


def _no_decay_mask(params):
    """True (decay) for matrices; False for vectors/scalars — the
    reference's ndim<2 / bias / norm exclusion rule."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def freeze_mask_from_flags(trainable, model_cfg_node: dict):
    """Boolean pytree: False = frozen (no update). Implements the reference's
    frozen_* switches (reference: affectgpt.py:126-356, runner_base.py:116-149)
    as an optimizer mask instead of requires_grad mutation."""
    import jax

    flags = model_cfg_node or {}

    def subtree_mask(tree, value):
        return jax.tree.map(lambda _: value, tree)

    mask = {}
    for key, sub in trainable.items():
        if key == "lora":
            mask[key] = subtree_mask(sub, not flags.get("frozen_llm", False))
        elif key == "multi":
            frozen = flags.get("frozen_multi_Qformer", False) and flags.get(
                "frozen_multi_llama_proj", False
            )
            mask[key] = subtree_mask(sub, not frozen)
        elif key == "mergers":
            mask[key] = {}
            for m, msub in sub.items():
                if m in ("video", "image"):
                    frozen = flags.get("frozen_video_Qformer", False) and flags.get(
                        "frozen_video_proj", False
                    )
                elif m == "audio":
                    frozen = flags.get("frozen_audio_Qformer", False) and flags.get(
                        "frozen_audio_proj", False
                    )
                else:  # au
                    frozen = flags.get("frozen_au_proj", False)
                mask[key][m] = subtree_mask(msub, not frozen)
        else:
            mask[key] = subtree_mask(sub, True)
    return mask


def apply_freeze_mask(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Frozen leaves receive NO update at all — including adamw's decoupled
    weight decay, which would otherwise drift them by lr*wd*param per step.
    Matches the reference, which excludes requires_grad=False params from
    the optimizer entirely (runner_base.py:126)."""
    labels = jax.tree.map(lambda keep: "train" if keep else "freeze", mask)
    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)


def make_optimizer(
    schedule: optax.Schedule,
    weight_decay: float = 0.05,
    beta2: float = 0.999,
    max_grad_norm: Optional[float] = None,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    if accum_steps > 1:
        # MultiSteps applies the inner update once per k micro-iterations,
        # so adamw's schedule count ticks at UPDATE resolution while the
        # runner (and the reference, per-iteration scheduler.step) index
        # the schedule by micro-iteration. Rescale so the lr applied at
        # update u equals the iteration-resolution schedule at u·k —
        # otherwise warmup lasts k× longer and the cosine never decays
        # past 1/k of its range.
        inner_schedule = lambda count: schedule(count * accum_steps)  # noqa: E731
    else:
        inner_schedule = schedule
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=inner_schedule,
            b1=0.9,
            b2=beta2,
            weight_decay=weight_decay,
            mask=_no_decay_mask,
        )
    )
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
