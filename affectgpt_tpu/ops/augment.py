"""Device-side video RandAugment.

Parity with the reference's VideoRandomAugment (reference:
my_affectgpt/processors/randaugment.py, 398 LoC of host-side numpy/PIL
ops) recast as a jit-compiled augmentation: N ops are drawn per clip
from a pool of photometric/geometric transforms and applied identically
to every frame (temporal consistency, like the reference). All branches
are static-shape; the op choice is a lax.switch.

Inputs are float32 RGB in [0, 255], [T, H, W, C]; output same.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _blend(a, b, factor):
    return jnp.clip(a + (b - a) * factor, 0.0, 255.0)


def _identity(frames, magnitude):
    return frames


def _brightness(frames, magnitude):
    return _blend(jnp.zeros_like(frames), frames, 1.0 + magnitude)


def _contrast(frames, magnitude):
    mean = jnp.mean(frames, axis=(-3, -2, -1), keepdims=True)
    return _blend(mean, frames, 1.0 + magnitude)


def _color(frames, magnitude):
    grey = jnp.mean(frames, axis=-1, keepdims=True)
    return _blend(grey, frames, 1.0 + magnitude)


def _sharpness(frames, magnitude):
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    t, h, w, c = frames.shape
    x = jnp.transpose(frames, (0, 3, 1, 2)).reshape(t * c, 1, h, w)
    smooth = jax.lax.conv_general_dilated(
        x, kernel[None, None], (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    smooth = jnp.transpose(smooth.reshape(t, c, h, w), (0, 2, 3, 1))
    return _blend(smooth, frames, 1.0 + magnitude)


def _posterize(frames, magnitude):
    bits = jnp.clip(8.0 - jnp.abs(magnitude) * 4.0, 1.0, 8.0)
    scale = 2.0 ** (8.0 - jnp.floor(bits))
    return jnp.floor(frames / scale) * scale


def _solarize(frames, magnitude):
    threshold = 256.0 - jnp.abs(magnitude) * 128.0
    return jnp.where(frames < threshold, frames, 255.0 - frames)


def _translate(frames, magnitude, axis):
    shift = (magnitude * frames.shape[axis]).astype(jnp.int32)
    return jnp.roll(frames, shift, axis=axis)


_OPS = (
    _identity,
    _brightness,
    _contrast,
    _color,
    _sharpness,
    _posterize,
    _solarize,
    lambda frames, magnitude: _translate(frames, magnitude * 0.2, axis=1),  # vertical
    lambda frames, magnitude: _translate(frames, magnitude * 0.2, axis=2),  # horizontal
)


@partial(jax.jit, static_argnames=("num_ops",))
def rand_augment(
    rng: jax.Array,
    frames: jnp.ndarray,
    num_ops: int = 2,
    magnitude: float = 0.5,
) -> jnp.ndarray:
    """Apply `num_ops` randomly chosen ops with random signed magnitudes
    (consistent across the clip's frames). frames [T, H, W, C] in [0,255]."""
    out = frames.astype(jnp.float32)
    for i in range(num_ops):
        k_op, k_mag, rng = jax.random.split(jax.random.fold_in(rng, i), 3)
        op_idx = jax.random.randint(k_op, (), 0, len(_OPS))
        mag = jax.random.uniform(k_mag, (), minval=-magnitude, maxval=magnitude)
        out = jax.lax.switch(op_idx, [partial(op, magnitude=mag) for op in _OPS], out)
    return jnp.clip(out, 0.0, 255.0)
