"""Device-side baseline-JPEG decode back half.

The host C++ decoder (native/videodec.cpp) keeps only the inherently
serial entropy decode; everything per-pixel — dequantization, the 8x8
iDCT, chroma upsampling, YCbCr→RGB — runs here as batched XLA ops:

- the iDCT over all blocks of all frames is ONE [N, 64] x [64, 64]
  matmul (MXU work; the [64,64] operator is C⊗C for the T.81 A.3.3
  basis), not a per-block scalar loop;
- chroma upsampling is the same center-aligned separable bilinear the
  host path uses (libjpeg-style "fancy" filter for the 2x factors),
  expressed as two clamped gathers per axis;
- color conversion + rounding match native/videodec.cpp:idct8x8 and
  :decode (lround == floor(x+0.5) on the value ranges involved), so
  device frames equal host frames to ≤1 LSB (float rounding order).

Reference equivalence: the reference delegates JPEG to decord/OpenCV on
the host (video_processor.py); this split is TPU-native beyond-reference
capability — frames are *born on device* where ops/image.py's
resize/normalize already runs.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _idct_operator() -> np.ndarray:
    """[64, 64] operator M with P_flat = K_flat @ M: K natural-order
    frequency coefficients (v*8+u), P row-major pixels (y*8+x)."""
    cs = np.zeros((8, 8), np.float32)  # cs[x, u]
    for x in range(8):
        for u in range(8):
            cu = 0.353553390593 if u == 0 else 0.5
            cs[x, u] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    m = np.einsum("yv,xu->vuyx", cs, cs).reshape(64, 64)
    return m.astype(np.float32)


_IDCT_M = _idct_operator()


def _round_half_up(x: jnp.ndarray) -> jnp.ndarray:
    # lround for the post-clamp ranges used here (ties at negative halves
    # land below 0 and clamp anyway)
    return jnp.floor(x + 0.5)


def _upsample_axis(plane: jnp.ndarray, out_len: int, sub_len: int,
                   factor_num: int, factor_den: int, axis: int) -> jnp.ndarray:
    """Center-aligned bilinear upsample along `axis` from sub_len valid
    samples to out_len (native/videodec.cpp:506-522 sample()): identity
    when the factors match."""
    if factor_num == factor_den:
        return jax.lax.slice_in_dim(plane, 0, out_len, axis=axis)
    f = (np.arange(out_len) + 0.5) * factor_num / factor_den - 0.5
    i0 = np.floor(f).astype(np.int32)
    a = (f - i0).astype(np.float32)
    i0c = np.clip(i0, 0, sub_len - 1)
    i1c = np.clip(i0 + 1, 0, sub_len - 1)
    lo = jnp.take(plane, jnp.asarray(i0c), axis=axis)
    hi = jnp.take(plane, jnp.asarray(i1c), axis=axis)
    shape = [1] * plane.ndim
    shape[axis] = out_len
    aa = jnp.asarray(a).reshape(shape)
    return lo * (1.0 - aa) + hi * aa


@partial(jax.jit, static_argnames=("width", "height", "sampling"))
def decode_mjpeg_frames(
    coefs: jnp.ndarray,  # [n, blocks, 64] int16 natural-order coefficients
    quants: jnp.ndarray,  # [ncomp, 64] uint16/int32 natural-order tables
    width: int,
    height: int,
    sampling: Tuple[Tuple[int, int], ...],  # ((h, v) per component)
) -> jnp.ndarray:
    """Finish the JPEG decode on device → [n, height, width, 3] uint8 RGB.

    Block layout matches videodec_read_coeffs: components concatenated,
    each row-major over its padded (mcuy*v, mcux*h) block grid."""
    n = coefs.shape[0]
    ncomp = len(sampling)
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    # one fused iDCT matmul over every block of every frame/component;
    # dequant scales vary per component, applied on the int coefficients
    planes = []
    base = 0
    for c, (h, v) in enumerate(sampling):
        bx, by = mcux * h, mcuy * v
        k = coefs[:, base : base + by * bx, :].astype(jnp.float32)
        base += by * bx
        k = k * quants[c].astype(jnp.float32)[None, None, :]
        # HIGHEST: the TPU MXU's default bf16 passes would cost ~6 of the
        # 8 mantissa bits on coef·quant values up to ±2^14 — ±1-LSB pixel
        # parity with the host path needs the full-f32 (x3/x6) matmul
        p = jnp.dot(k.reshape(n * by * bx, 64), jnp.asarray(_IDCT_M),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        # match the host path exactly: plane pixels are rounded + clamped
        # to uint8 BEFORE upsampling/color (videodec.cpp:298-299)
        p = jnp.clip(_round_half_up(p) + 128.0, 0.0, 255.0)
        plane = p.reshape(n, by, bx, 8, 8).transpose(0, 1, 3, 2, 4)
        plane = plane.reshape(n, by * 8, bx * 8)
        if (h, v) != (hmax, vmax):
            sub_w = -(-width * h // hmax)
            sub_h = -(-height * v // vmax)
            plane = _upsample_axis(plane, height, sub_h, v, vmax, axis=1)
            plane = _upsample_axis(plane, width, sub_w, h, hmax, axis=2)
        else:
            plane = plane[:, :height, :width]
        planes.append(plane)

    if ncomp == 1:
        g = jnp.clip(planes[0], 0.0, 255.0).astype(jnp.uint8)
        return jnp.stack([g, g, g], axis=-1)

    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(_round_half_up(rgb), 0.0, 255.0).astype(jnp.uint8)
