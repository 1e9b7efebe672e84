"""Training-step throughput on one TPU chip (preextracted path).

The reference trains with batch_size 1/GPU on 3×80 GB GPUs and publishes
no steps/s (BASELINE.md "Operational — training"); this records the TPU
side of that table: samples/s for the production LoRA-SFT step (frozen
3B-class LLM + trainable mergers/LoRA, preextracted CLIP/HuBERT features,
AdamW + frozen-mask, bf16 weights / f32 optimizer).

Run: python scripts/bench_train.py            (defaults: batch 16/32 sweep)
     TRAIN_BENCH_BATCH=8 python scripts/bench_train.py

Axon-relay rules apply (CLAUDE.md): one TPU process at a time; every
timing boundary fetches the scalar loss to force a device→host fence.
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

SEQ_LEN = int(os.environ.get("TRAIN_BENCH_SEQ", 256))
# b16 at seq 256 OOMs one v5e: the CE loss holds [b, t, vocab] fp32 logits
# (+ grad) ≈ 2.5 GB each at b16 on top of the 6.8 GB frozen tree
BATCHES = [int(b) for b in os.environ.get("TRAIN_BENCH_BATCH", "4,8").split(",")]
# "1" full per-layer remat | "0" none | "dots" save non-batched matmul
# outputs (backward skips the layer-forward recompute; costs ~110 MB/layer
# of saved activations at 3B b8 t256)
_REMAT_ENV = os.environ.get("TRAIN_BENCH_REMAT", "1")
REMAT = "dots" if _REMAT_ENV == "dots" else bool(int(_REMAT_ENV))


def main():
    import optax

    from affectgpt_tpu.models import affectgpt
    from affectgpt_tpu.training import train_step as ts
    from bench import qwen_3b_config

    from affectgpt_tpu.models import qwen2

    llm_cfg = (
        qwen2.QwenConfig.tiny(vocab_size=1024)  # CPU smoke mode
        if os.environ.get("TRAIN_BENCH_TINY")
        else qwen_3b_config()
    )
    cfg = affectgpt.AffectGPTConfig(
        llm=llm_cfg,
        video_fusion_type="attention", audio_fusion_type="attention",
        multi_fusion_type="attention",
        num_video_query_token=8, num_audio_query_token=8, num_multi_query_token=1,
    )
    frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    tx = optax.adamw(1e-5, weight_decay=0.05)
    state = ts.create_train_state(trainable, tx)
    # TRAIN_BENCH_DROPOUT=1 measures the production-runner configuration
    # (train-mode LoRA dropout, reference peft 0.05); default off keeps the
    # harness comparable with earlier recorded sweeps
    dropout_seed = 42 if os.environ.get("TRAIN_BENCH_DROPOUT", "0") == "1" else None
    step_fn = jax.jit(
        ts.make_train_step(cfg, tx, remat=REMAT, dropout_seed=dropout_seed),
        donate_argnums=(0,),
    )

    print(f"# device: {jax.devices()[0]}", flush=True)
    results = {}
    for b in BATCHES:
        rng = np.random.RandomState(0)
        ids = rng.randint(1, 1000, (b, SEQ_LEN)).astype(np.int32)
        offsets = {"multi": 2, "audio": 5, "face": 20, "frame": 30}
        q = {"multi": 1, "audio": 8, "face": 8, "frame": 8}
        labels = ids.copy()
        for m, off in offsets.items():
            ids[:, off : off + q[m]] = 0
            labels[:, off : off + q[m]] = -100
        labels[:, : SEQ_LEN // 2] = -100  # prompt half masked
        batch = {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((b, SEQ_LEN), jnp.float32),
            "labels": jnp.asarray(labels),
            "features": {
                "frame": jnp.asarray(rng.randn(b, 8, cfg.visual_dim), jnp.bfloat16),
                "face": jnp.asarray(rng.randn(b, 8, cfg.visual_dim), jnp.bfloat16),
                "audio": jnp.asarray(rng.randn(b, 8, cfg.acoustic_dim), jnp.bfloat16),
            },
            "offsets": {m: jnp.full((b,), off, jnp.int32) for m, off in offsets.items()},
        }
        state_b = jax.tree.map(jnp.copy, state)
        state_b, metrics = step_fn(state_b, frozen, batch)  # compile + warmup
        float(metrics["loss"])
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state_b, metrics = step_fn(state_b, frozen, batch)
            float(metrics["loss"])  # fence (relay: block_until_ready lies)
        dt = time.perf_counter() - t0
        results[b] = b * iters / dt
        print(
            json.dumps(
                {
                    "metric": (
                        "LoRA-SFT train samples/s/chip "
                        f"({'tiny-smoke' if os.environ.get('TRAIN_BENCH_TINY') else '3B-class'}, "
                        f"seq {SEQ_LEN}, batch {b})"
                    ),
                    "value": round(results[b], 2),
                    "unit": "samples/s",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
