"""A/B microbench: bf16 vs int8 KV cache on one TPU chip.

Same program as bench.py's clip_to_tokens but parameterized on
generate(cache_dtype=...) and a longer decode (96 new tokens) so the
decode phase — the only phase the quantized cache affects — dominates.
Run exclusively (one TPU process): python scripts/bench_kv_int8.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # reuse the model/build/batch helpers

BATCH = 256
NEW_TOKENS = 96
MAX_LEN = 256


def run(cache_dtype, cfg, frozen, trainable, inputs):
    from affectgpt_tpu.inference import generate as gen
    from affectgpt_tpu.models import affectgpt

    input_ids, feats, offsets, lengths = inputs
    gcfg = gen.GenerateConfig(max_new_tokens=NEW_TOKENS, do_sample=False, eos_token_id=0)

    @jax.jit
    def clip_to_tokens(frozen, trainable, input_ids, feats, offsets, lengths, rng):
        embeds = affectgpt.build_inputs_embeds(
            frozen, trainable, cfg, input_ids, feats, offsets
        )
        return gen.generate(
            frozen["llm"], cfg.llm, gcfg, embeds, lengths, rng,
            max_len=MAX_LEN, lora=trainable["lora"], cache_dtype=cache_dtype,
        )

    rng = jax.random.PRNGKey(0)
    tokens, _ = clip_to_tokens(frozen, trainable, input_ids, feats, offsets, lengths, rng)
    ref = np.asarray(tokens)  # device->host fence (axon relay)

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        tokens, _ = clip_to_tokens(
            frozen, trainable, input_ids, feats, offsets, lengths, jax.random.fold_in(rng, i)
        )
        np.asarray(tokens)
    dt = time.perf_counter() - t0
    return BATCH * iters / dt, ref


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    llm_cfg = bench.qwen_3b_config()
    cfg, frozen, trainable = bench.build(llm_cfg)
    input_ids, feats, offsets = bench.make_clip_batch(cfg, BATCH)
    lengths = jnp.full((BATCH,), bench.PROMPT_LEN, jnp.int32)
    inputs = (input_ids, feats, offsets, lengths)

    out = {}
    toks = {}
    for name, dtype in [("bf16", None), ("int8", jnp.int8)]:
        out[name], toks[name] = run(dtype, cfg, frozen, trainable, inputs)
        print(json.dumps({"cache": name, "clips_per_s": round(out[name], 2),
                          "batch": BATCH, "new_tokens": NEW_TOKENS}), flush=True)
    match = float((toks["bf16"] == toks["int8"]).mean())
    print(json.dumps({"greedy_token_match": round(match, 4),
                      "speedup": round(out["int8"] / out["bf16"], 4)}), flush=True)


if __name__ == "__main__":
    main()
