"""CLIP ViT-L/14 encoder microbench on one TPU chip.

Isolates the realtime path's dominant cost (encoder compute ≈ 60 GFLOPs
per clip side; bench_realtime measured ~24% MFU round-2) and A/Bs
attention implementations:
  CLIP_ATTN=xla    full-softmax fp32 logits (round-2 default)
  CLIP_ATTN=flash  fused Pallas flash attention (no [b,h,257,257] HBM tensor)
  CLIP_ATTN=auto   VMEM-resident attention-sublayer megakernel (default)
and MLP implementations:
  CLIP_MLP=auto    fused LN+fc1+gelu / fc2+residual pair (default;
                   measured 822.3 img/s / 67.6% MFU vs 744.0 / 61.2% xla)
  CLIP_MLP=xla     op-by-op

Run: CLIP_ATTN=flash CLIP_IMAGES=2048 python scripts/bench_clip_encoder.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

IMAGES = int(os.environ.get("CLIP_IMAGES", 2048))
PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    from affectgpt_tpu.models import clip_vit

    if os.environ.get("CLIP_NOATTN"):
        # attribution probe: skip the attention sublayer entirely (wrong
        # math) to split matmul/LN time from attention time
        def _no_attn_block(block, x, num_heads, eps, mask=None, valid_len=None):
            from affectgpt_tpu.models import nn as _nn

            h = _nn.layernorm(block["ln2"], x, eps)
            return x + _nn.dense(block["mlp_out"], clip_vit.quick_gelu(_nn.dense(block["mlp_in"], h)))

        clip_vit._apply_block = _no_attn_block

    cfg = clip_vit.ClipVisionConfig.vit_l_14()
    params = clip_vit.init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if os.environ.get("CLIP_W8A8"):
        from affectgpt_tpu.ops import quant

        params = quant.quantize_encoder_tree(params)
    images = jnp.asarray(
        np.random.RandomState(0).randn(IMAGES, 224, 224, 3) * 0.5, jnp.bfloat16
    )

    fn = jax.jit(lambda p, im: clip_vit.encode_image(p, cfg, im))
    out = fn(params, images)
    np.asarray(out)  # compile + fence

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(params, images))
    dt = (time.perf_counter() - t0) / iters

    n = cfg.num_patches + 1
    per_layer = 4 * 2 * n * cfg.width**2 + 2 * 2 * n * cfg.width * cfg.mlp_dim \
        + 2 * 2 * n * n * cfg.width
    flops = IMAGES * (per_layer * cfg.num_layers + 2 * n * (cfg.patch_size**2 * 3) * cfg.width)
    tflops = flops / dt / 1e12
    print(json.dumps({
        "metric": f"CLIP ViT-L images/s ({IMAGES} imgs, attn={os.environ.get('CLIP_ATTN', 'auto')}, w8a8={bool(os.environ.get('CLIP_W8A8'))})",
        "value": round(IMAGES / dt, 1),
        "unit": "images/s",
        "ms_per_batch": round(dt * 1e3, 1),
        "tflops": round(tflops, 1),
        "mfu": round(tflops / PEAK_TFLOPS, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
