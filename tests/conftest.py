"""Test harness: run everything on a virtual 8-device CPU mesh so multi-chip
sharding logic is exercised without TPU hardware.

Note: this image pre-imports jax via a sitecustomize hook with
JAX_PLATFORMS=axon (remote TPU relay). Backend selection is lazy, so we
override the platform and XLA flags here, before any device is touched —
plain `setdefault` would silently leave tests running over the relay.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices


@pytest.fixture(autouse=True)
def _reset_tp_serving():
    """qwen2.TP_SERVING is a sticky process-global set by mesh-sharded
    engine constructors (Pallas decode kernels have no GSPMD rule); reset
    it per test so a sharded-engine test cannot disable the fused-kernel
    paths for tests that run after it."""
    from affectgpt_tpu.models import qwen2

    qwen2.TP_SERVING = False
    yield
    qwen2.TP_SERVING = False
