"""Checkpointing: trainable-only state with 3-tier overlay loading.

Parity with the reference semantics (reference: runners/runner_base.py:
600-688 — trainable-params-only state_dict, optimizer/scaler/epoch
bundle, `checkpoint_%06d_loss_%s` naming, resume; and affectgpt.py:
1099-1120 — `ckpt < ckpt_2 < ckpt_3` non-strict overlay at model build).
Storage is Orbax (async-capable, sharding-aware) instead of torch.save.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def checkpoint_name(epoch: int, loss: Optional[float] = None) -> str:
    loss_str = f"{loss:.4f}" if loss is not None else "nan"
    return f"checkpoint_{epoch:06d}_loss_{loss_str}"


def save_checkpoint(
    output_dir: str,
    epoch: int,
    trainable: Any,
    opt_state: Any = None,
    step: int = 0,
    loss: Optional[float] = None,
    config: Optional[dict] = None,
    best_val: Optional[float] = None,
) -> str:
    """Save trainable params (+ optimizer state for resume). Frozen weights
    are never written — the reference's requires_grad filter.

    Multihost: EVERY process must call this (the shard gather is a
    collective); only process 0 touches the filesystem."""
    path = os.path.abspath(os.path.join(output_dir, checkpoint_name(epoch, loss)))

    def fetch(tree):
        if jax.process_count() <= 1:
            return jax.device_get(tree)
        from jax.experimental import multihost_utils

        def leaf(x):
            # replicated leaves are directly fetchable on every host; only
            # cross-host-sharded leaves (tp-split) need the collective
            # gather (tiled=True reassembles the global value). The branch
            # predicate depends only on sharding metadata, so every process
            # takes the same collective sequence.
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                if x.is_fully_replicated:
                    return jax.device_get(x)
                return multihost_utils.process_allgather(x, tiled=True)
            return jax.device_get(x)

        return jax.tree.map(leaf, tree)

    payload = {
        "trainable": fetch(trainable),
        "epoch": np.int64(epoch),
        "step": np.int64(step),
    }
    if opt_state is not None:
        payload["opt_state"] = fetch(opt_state)
    if best_val is not None and np.isfinite(best_val):
        payload["best_val"] = np.float64(best_val)
    # Orbax save is itself a collective in multiprocess runs (internal
    # global sync) — EVERY process calls it; orbax writes host-replicated
    # numpy values from the primary host only. force=True overwrites an
    # existing checkpoint of the same name (torch.save semantics — a
    # re-run over the same output_dir otherwise dies on the deterministic
    # epoch-0 checkpoint name).
    _checkpointer().save(path, payload, force=True)
    if config is not None and jax.process_index() == 0:
        # the function's contract: only process 0 touches the filesystem
        # outside orbax (concurrent json.dump from every host can corrupt
        # the file on a shared filesystem)
        import json

        with open(os.path.join(path, "config.json"), "w") as handle:
            json.dump(config, handle, default=str)
    return path


def load_checkpoint(path: str, template: Any = None) -> dict:
    """Restore a checkpoint. `template` (optional) is a pytree of the same
    STRUCTURE as the saved payload: orbax restores plain dicts/lists by
    default, which destroys optax NamedTuple structure (MultiStepsState /
    ScaleByAdamState) — pass a template to get the real structure back
    (required before feeding opt_state to a compiled step)."""
    if template is None:
        return _checkpointer().restore(os.path.abspath(path))
    return _checkpointer().restore(os.path.abspath(path), item=template)


def _overlay(base: Any, update: Any, _path: str = "", _unknown: Optional[list] = None) -> Any:
    """Non-strict merge: leaves present in `update` replace `base`,
    missing subtrees keep base values (strict=False load_state_dict).
    Keys absent from `base` are still inserted (reference non-strict
    semantics) but collected into `_unknown` so callers can warn — a
    silently-inserted dead subtree means the live weights at that slot
    stayed at random init."""
    if isinstance(base, dict) and isinstance(update, dict):
        out = dict(base)
        for key, value in update.items():
            if key in base:
                out[key] = _overlay(base[key], value, f"{_path}/{key}", _unknown)
            else:
                if _unknown is not None:
                    _unknown.append(f"{_path}/{key}")
                out[key] = value
        return out
    if isinstance(base, list) and isinstance(update, list) and len(base) == len(update):
        return [_overlay(b, u, f"{_path}[{i}]", _unknown) for i, (b, u) in enumerate(zip(base, update))]
    return update if update is not None else base


def _migrate_legacy_mergers(update: Any) -> Any:
    """Pre-round-3 checkpoints keyed trainable["mergers"] by MODALITY
    (frame/face/audio/image/au); the live tree keys them by GROUP
    (video/audio/image/au) because frame and face share ONE video merger,
    matching the reference (affectgpt.MERGER_GROUP; reference
    affectgpt.py:929-932). Map frame→video and drop face so an old
    checkpoint restores into the shared merger instead of leaving it at
    random init behind dead frame/face keys."""
    if not (isinstance(update, dict) and isinstance(update.get("mergers"), dict)):
        return update
    mergers = update["mergers"]
    if "frame" not in mergers and "face" not in mergers:
        return update
    migrated = {k: v for k, v in mergers.items() if k not in ("frame", "face")}
    source = None
    if "video" not in migrated:
        # prefer frame (it and face fed the same shared merger with summed
        # grads, so either copy is the trained merger); a face-only legacy
        # run must migrate face → video rather than dropping its only
        # trained merger and leaving video at random init
        source = "frame" if "frame" in mergers else "face"
        migrated["video"] = mergers[source]
    import logging

    logging.getLogger(__name__).warning(
        "checkpoint: legacy modality-keyed mergers migrated (%s->video%s); "
        "re-save to silence this",
        source or "none",
        ", face weights dropped" if ("face" in mergers and source != "face") else "",
    )
    out = dict(update)
    out["mergers"] = migrated
    return out


def apply_checkpoint_overlays(trainable: Any, *ckpt_paths: Optional[str]) -> Any:
    """Reference 3-tier composition: apply ckpt, ckpt_2, ckpt_3 in order,
    later tiers winning (affectgpt.py:1099-1120)."""
    import logging

    for path in ckpt_paths:
        if not path:
            continue
        payload = load_checkpoint(path)
        unknown: list = []
        trainable = _overlay(
            trainable, _migrate_legacy_mergers(payload["trainable"]), _unknown=unknown
        )
        if unknown:
            logging.getLogger(__name__).warning(
                "checkpoint %s: %d key(s) absent from the live trainable tree "
                "were inserted verbatim (first: %s) — the live weights at those "
                "slots are unchanged",
                path, len(unknown), unknown[0],
            )
    return trainable


def list_checkpoints(output_dir: str):
    """Sorted (epoch, path) pairs under a run directory."""
    found = []
    for path in glob.glob(os.path.join(output_dir, "checkpoint_*")):
        match = re.search(r"checkpoint_(\d+)_loss", os.path.basename(path))
        if match:
            found.append((int(match.group(1)), path))
    return sorted(found)


def discover_checkpoint_root(result_root: str) -> Optional[str]:
    """Pick the run directory with the most checkpoints (the reference's
    auto-discovery, inference_hybird.py:32-54)."""
    best, best_count = None, 0  # a dir with ZERO checkpoints never wins
    for candidate in glob.glob(os.path.join(result_root, "*")):
        if not os.path.isdir(candidate):
            continue
        count = len(list_checkpoints(candidate))
        if count > best_count:
            best, best_count = candidate, count
    return best
