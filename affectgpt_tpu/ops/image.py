"""Device-side image preprocessing kernels (JAX/XLA).

Replaces the reference's host-side OpenCV/torchvision transforms
(reference: my_affectgpt/processors/video_processor.py:378-488 Alpro
train/eval processors; :262-296 cv2 face resize) with jit-compiled
device code so frames go uint8-over-PCIe once and everything after
lives in HBM. All functions are shape-static and batch/vmap friendly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from affectgpt_tpu import constants

CLIP_MEAN = jnp.asarray(constants.CLIP_IMAGE_MEAN, dtype=jnp.float32)
CLIP_STD = jnp.asarray(constants.CLIP_IMAGE_STD, dtype=jnp.float32)


def resize(frames: jnp.ndarray, out_hw: Tuple[int, int], method: str = "bicubic") -> jnp.ndarray:
    """Resize [..., H, W, C] images to [..., h, w, C]. Identity sizes skip
    the resample entirely (jax.image.resize still runs the full filter for
    same-size outputs — measurable on the realtime path where decoded
    frames usually arrive pre-sized at 224²)."""
    *lead, h, w, c = frames.shape
    if (h, w) == tuple(out_hw):
        return frames.astype(jnp.float32)
    out_shape = (*lead, out_hw[0], out_hw[1], c)
    return jax.image.resize(frames.astype(jnp.float32), out_shape, method=method)


def normalize_clip(frames: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [..., H, W, C] in [0,255] → CLIP-normalized float32."""
    frames = frames.astype(jnp.float32) / 255.0
    return (frames - CLIP_MEAN) / CLIP_STD


def center_crop(frames: jnp.ndarray, size: int) -> jnp.ndarray:
    """Center-crop [..., H, W, C] to [..., size, size, C]."""
    h, w = frames.shape[-3], frames.shape[-2]
    top = (h - size) // 2
    left = (w - size) // 2
    return frames[..., top : top + size, left : left + size, :]


def random_resized_crop(
    rng: jax.Array,
    frames: jnp.ndarray,
    out_size: int = 224,
    scale: Tuple[float, float] = (0.5, 1.0),
    method: str = "cubic",
) -> jnp.ndarray:
    """Train-time augmentation with the reference's RandomResizedCrop
    semantics (scale 0.5-1.0, aspect 3/4-4/3, bicubic; reference:
    video_processor.py:402-431) recast for XLA static shapes: instead of a
    dynamic-shape crop + resize, the crop box is realized as a single
    `jax.image.scale_and_translate` with traced float scale/translation —
    one compiled kernel supports every (continuous) crop geometry.
    frames: [T, H, W, C] (one clip, consistent crop across time, like the
    reference's per-clip transform).
    """
    t, H, W, c = frames.shape
    k_scale, k_ratio, ky, kx = jax.random.split(rng, 4)

    area = jax.random.uniform(k_scale, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k_ratio, (), minval=jnp.log(3.0 / 4.0), maxval=jnp.log(4.0 / 3.0)
    )
    ratio = jnp.exp(log_ratio)
    ch = jnp.clip(jnp.sqrt(area / ratio) * H, 1.0, float(H))
    cw = jnp.clip(jnp.sqrt(area * ratio) * W, 1.0, float(W))

    y0 = jax.random.uniform(ky, ()) * (H - ch)
    x0 = jax.random.uniform(kx, ()) * (W - cw)

    # output pixel o samples input at o·(crop/out) + origin:
    # scale = out/crop, translation = -origin·scale.
    sy = out_size / ch
    sx = out_size / cw
    scale_vec = jnp.stack([sy, sx])
    translation = jnp.stack([-y0 * sy, -x0 * sx])
    return jax.image.scale_and_translate(
        frames.astype(jnp.float32),
        (t, out_size, out_size, c),
        (1, 2),
        scale_vec,
        translation,
        method=method,
    )


def preprocess_frames_train(
    rng: jax.Array, frames_u8: jnp.ndarray, out_size: int = 224
) -> jnp.ndarray:
    """[T, H, W, C] uint8 → [C, T, S, S] float32, train transform
    (RandomResizedCrop + normalize; reference AlproVideoTrainProcessor)."""
    out = random_resized_crop(rng, frames_u8.astype(jnp.float32), out_size)
    out = normalize_clip(out)
    return jnp.transpose(out, (3, 0, 1, 2))


def preprocess_frames_eval(frames_u8: jnp.ndarray, out_size: int = 224) -> jnp.ndarray:
    """[T, H, W, C] uint8 → [C, T, S, S] float32, eval transform
    (resize + normalize; reference AlproVideoEvalProcessor)."""
    out = resize(frames_u8.astype(jnp.float32), (out_size, out_size))
    out = normalize_clip(out)
    return jnp.transpose(out, (3, 0, 1, 2))
