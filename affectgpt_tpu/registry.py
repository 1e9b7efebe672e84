"""Minimal namespaced registry.

TPU-first replacement for the reference's global class registry
(reference: my_affectgpt/common/registry.py:9-389). Same capability —
name → factory maps for builders, tasks, models, encoders, processors,
lr schedulers — but a plain module-level table with decorator helpers
instead of a god object; model selection happens at trace time from a
typed config, so the registry only resolves names, never holds state.
"""

from __future__ import annotations

from typing import Callable, Dict

_NAMESPACES = (
    "builder",
    "task",
    "processor",
    "model",
    "lr_scheduler",
    "runner",
    "visual_encoder",
    "acoustic_encoder",
    "dataset",
)

_REGISTRY: Dict[str, Dict[str, Callable]] = {ns: {} for ns in _NAMESPACES}


def register(namespace: str, name: str) -> Callable:
    if namespace not in _REGISTRY:
        raise KeyError(f"Unknown registry namespace: {namespace}")

    def deco(obj):
        existing = _REGISTRY[namespace].get(name)
        if existing is not None and existing is not obj:
            raise KeyError(f"Duplicate registration: {namespace}/{name}")
        _REGISTRY[namespace][name] = obj
        return obj

    return deco


def get(namespace: str, name: str) -> Callable:
    try:
        return _REGISTRY[namespace][name]
    except KeyError:
        known = sorted(_REGISTRY.get(namespace, {}))
        raise KeyError(
            f"{namespace}/{name} not registered; known: {known}"
        ) from None


def names(namespace: str):
    return sorted(_REGISTRY[namespace])


# Convenience decorators matching the reference's registration points.
def register_builder(name):
    return register("builder", name)


def register_task(name):
    return register("task", name)


def register_model(name):
    return register("model", name)


def register_processor(name):
    return register("processor", name)


def register_lr_scheduler(name):
    return register("lr_scheduler", name)


def register_visual_encoder(name):
    return register("visual_encoder", name)


def register_acoustic_encoder(name):
    return register("acoustic_encoder", name)


def register_dataset(name):
    return register("dataset", name)


def register_runner(name):
    return register("runner", name)
