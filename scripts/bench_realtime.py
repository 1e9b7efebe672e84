"""Fully-REALTIME tri-modal throughput on one TPU chip.

The main bench measures the preextracted path (reference best case,
~41 clips/s). This one measures the realtime path the reference runs at
~13.7 clips/s (uniform sampling, MER-UniBench/README.md:321): raw frames
+ face crops through CLIP ViT-L/14 and raw audio clips through
HuBERT-large ON DEVICE, then mergers → splice → 32-token greedy decode —
one compiled program per batch.

Caveat vs the reference number: the GPU figure includes host-side video
decode; here frames are already in host memory (the ingest ladder decodes
on host, overlapped by the loader prefetch), so this measures the
device compute path. Encoder weights are random — throughput identical
to converted checkpoints.

Run: python scripts/bench_realtime.py      (one TPU process at a time)
Env: RT_BATCH (64), RT_FRAMES (8), RT_NEW (32), RT_W8A8=1 (int8 encoders).
     RT_SKIP=visual|audio drops one encoder side — attribution sweeps.
     RT_HYBRID=1: frame features preextracted (no frame-CLIP pass), face +
     audio still realtime — the reference's frame-preextracted mode
     (~40 s / 411 clips ≈ 10.3 clips/s, MER-UniBench/README.md:323).
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

REFERENCE_REALTIME_CLIPS_PER_SEC = 13.7  # 411 clips / ~30 s, 1 CUDA GPU

BATCH = int(os.environ.get("RT_BATCH", 64))
FRAMES = int(os.environ.get("RT_FRAMES", 8))
NEW = int(os.environ.get("RT_NEW", 32))
PROMPT_LEN = 128
SAMPLES = 32000  # 2 s @ 16 kHz per audio clip (reference clip length)


def main():
    from affectgpt_tpu.inference import chat as chat_mod
    from affectgpt_tpu.inference import generate as gen
    from affectgpt_tpu.models import affectgpt, clip_vit, hubert
    from bench import build, make_clip_batch, qwen_3b_config

    tiny = bool(os.environ.get("RT_TINY"))  # CPU smoke mode
    if tiny:
        from dataclasses import replace as _replace

        from affectgpt_tpu.models import qwen2 as _q

        cfg, frozen, trainable = build(_q.QwenConfig.tiny(vocab_size=1024))
        # encoder output dims must match the merger input dims
        vision_cfg = _replace(clip_vit.ClipVisionConfig.tiny(), projection_dim=cfg.visual_dim)
        audio_cfg = _replace(hubert.HubertConfig.tiny(), hidden_size=cfg.acoustic_dim)
    else:
        cfg, frozen, trainable = build(qwen_3b_config())
        vision_cfg = clip_vit.ClipVisionConfig.vit_l_14()
        audio_cfg = hubert.HubertConfig.large()
    frozen = dict(frozen)
    frozen["visual_encoder"] = clip_vit.init_vision_params(
        jax.random.PRNGKey(2), vision_cfg, dtype=jnp.bfloat16
    )
    frozen["acoustic_encoder"] = hubert.init_params(
        jax.random.PRNGKey(3), audio_cfg, dtype=jnp.bfloat16
    )
    if os.environ.get("RT_W8A8"):
        # int8 encoder serving: the towers are compute-bound — int8×int8
        # MXU matmuls run at 2× the bf16 rate on v5e
        from affectgpt_tpu.ops import quant

        frozen["visual_encoder"] = quant.quantize_encoder_tree(frozen["visual_encoder"])
        frozen["acoustic_encoder"] = quant.quantize_encoder_tree(frozen["acoustic_encoder"])
    print(f"# device: {jax.devices()[0]}", flush=True)

    rng = np.random.RandomState(0)
    hw = 28 if tiny else 224
    samples = 800 if tiny else SAMPLES
    skip = os.environ.get("RT_SKIP", "")
    hybrid = os.environ.get("RT_HYBRID", "0") == "1"
    raw = {}
    if skip != "visual":
        if not hybrid:  # hybrid: frame features arrive preextracted
            raw["frame"] = jnp.asarray(
                rng.randint(0, 255, (BATCH, FRAMES, hw, hw, 3)), jnp.uint8
            )
        raw["face"] = jnp.asarray(
            rng.randint(0, 255, (BATCH, FRAMES, hw, hw, 3)), jnp.uint8
        )
    if skip != "audio":
        raw["audio"] = jnp.asarray(
            rng.randn(BATCH, FRAMES, 1, samples) * 0.1, jnp.bfloat16
        )
    pre_frame = (
        jnp.asarray(rng.randn(BATCH, FRAMES, cfg.visual_dim), jnp.bfloat16)
        if hybrid and skip != "visual" else None
    )
    # reuse the main bench's prompt/offsets (patch ids zeroed host-side)
    input_ids, _, offsets = make_clip_batch(cfg, BATCH)
    lengths = jnp.full((BATCH,), PROMPT_LEN, jnp.int32)
    gcfg = gen.GenerateConfig(max_new_tokens=NEW, do_sample=False, eos_token_id=0)
    max_len = PROMPT_LEN + NEW + 32

    @jax.jit
    def realtime_clip_to_tokens(frozen, trainable, raw, pre_frame, input_ids, lengths):
        feats = chat_mod.encode_media_features(
            frozen, cfg, raw, vision_cfg=vision_cfg, audio_cfg=audio_cfg
        )
        if pre_frame is not None:  # hybrid: preextracted frame features
            feats["frame"] = pre_frame
        feats = {m: f.astype(jnp.bfloat16) for m, f in feats.items()}
        embeds = affectgpt.build_inputs_embeds(
            frozen, trainable, cfg, input_ids, feats, offsets
        )
        return gen.generate(
            frozen["llm"], cfg.llm, gcfg, embeds, lengths, jax.random.PRNGKey(0),
            max_len=max_len, lora=None,
        )

    tokens, _ = realtime_clip_to_tokens(frozen, trainable, raw, pre_frame, input_ids, lengths)
    np.asarray(tokens)  # compile + fence (axon: block_until_ready lies)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        tokens, _ = realtime_clip_to_tokens(
            frozen, trainable, raw, pre_frame, input_ids, lengths)
        np.asarray(tokens)
    dt = time.perf_counter() - t0
    cps = BATCH * iters / dt
    print(
        json.dumps(
            {
                "metric": (
                    "tri-modal REALTIME clips/sec/chip ("
                    + ("tiny-smoke" if tiny else "CLIP-L + HuBERT-large on device, 3B LLM")
                    + f", {FRAMES} frames+faces, {NEW}-tok decode, batch {BATCH}"
                    + (f", skip={skip}" if skip else "")
                    + (", HYBRID frame-preextracted" if hybrid else "")
                    + ")"
                ),
                "value": round(cps, 2),
                "unit": "clips/s",
                "vs_realtime_baseline": round(cps / REFERENCE_REALTIME_CLIPS_PER_SEC, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
