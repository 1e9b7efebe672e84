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

# Remove the axon (remote TPU relay) backend factory entirely: tests are
# CPU-only and a registered-but-unused relay client has been observed to
# take the whole process down mid-run (silent SIGKILL-style death).
try:  # noqa: SIM105
    from jax._src import xla_bridge as _xb

    for _name in list(getattr(_xb, "_backend_factories", {})):
        if _name not in ("cpu",):
            _xb._backend_factories.pop(_name, None)
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices
