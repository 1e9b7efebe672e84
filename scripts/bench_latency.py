"""Batch-1 clip→label latency (the reference's interactive mode).

Measures p50/p90 of one clip through the full preextracted path
(mergers → splice → prefill → 32-token greedy decode) on one chip, for
bf16 and int8 weights with merged-LoRA serving. Round-1 reference point:
314 ms bf16 / 182 ms int8 p50 (unmerged). Note the axon relay adds
~30-40 ms fixed dispatch+fetch overhead per call on this rig; real TPU
hosts sit below these numbers.

Run: python scripts/bench_latency.py   (one TPU process at a time)
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

PROMPT_LEN, NEW, MAX_LEN = 128, 32, 192


def main():
    from affectgpt_tpu.inference import generate as gen
    from affectgpt_tpu.models import affectgpt, qwen2
    from bench import build, make_clip_batch, qwen_3b_config

    cfg, frozen, trainable = build(qwen_3b_config())
    input_ids, feats, offsets = make_clip_batch(cfg, 1)
    lengths = jnp.full((1,), PROMPT_LEN, jnp.int32)
    gcfg = gen.GenerateConfig(max_new_tokens=NEW, do_sample=False, eos_token_id=0)
    print(f"# device: {jax.devices()[0]}", flush=True)

    variants = {
        "bf16": frozen["llm"],
        "int8": jax.jit(lambda p: qwen2.quantize_params(p, bits=8))(frozen["llm"]),
        "int4": jax.jit(lambda p: qwen2.quantize_params(p, bits=4))(frozen["llm"]),
    }

    for tag, llm in variants.items():
        @jax.jit
        def one_clip(llm, trainable, input_ids, feats, offsets, lengths):
            embeds = affectgpt.build_inputs_embeds(
                {"llm": llm}, trainable, cfg, input_ids, feats, offsets
            )
            return gen.generate(
                llm, cfg.llm, gcfg, embeds, lengths, jax.random.PRNGKey(0),
                max_len=MAX_LEN, lora=None,
            )

        toks, _ = one_clip(llm, trainable, input_ids, feats, offsets, lengths)
        np.asarray(toks)
        times = []
        for _ in range(20):
            t0 = time.perf_counter()
            toks, _ = one_clip(llm, trainable, input_ids, feats, offsets, lengths)
            np.asarray(toks)
            times.append(time.perf_counter() - t0)
        times = np.array(times) * 1e3
        print(
            json.dumps(
                {
                    "metric": f"batch-1 clip→label latency [{tag}, merged-LoRA] (3B, 128-tok prompt, 32-tok decode)",
                    "p50_ms": round(float(np.percentile(times, 50)), 1),
                    "p90_ms": round(float(np.percentile(times, 90)), 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
