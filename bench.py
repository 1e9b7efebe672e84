"""Benchmark: tri-modal clip→label throughput on one TPU chip.

Measures the production inference path on preextracted features — the
configuration behind the reference's best published throughput
(~41 clips/s on one CUDA GPU for 411 MER2023 clips, fully preextracted;
AffectGPT/MER-UniBench/README.md:324): per clip, temporal mergers over
CLIP(768)/HuBERT(1024) features + audio-video pre-fusion + splice into a
~128-token prompt + batched greedy decode of 32 tokens with KV cache.

The LLM geometry defaults to Qwen2.5-3B-class (the reference's documented
single-GPU alternative, reference config.py:14) so weights + KV cache fit
one v5e chip in bf16; the 7B flagship shards over a mesh (see
__graft_entry__.dryrun_multichip). Batch is the main lever the reference
leaves on the table (it decodes batch-1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeat bench runs skip the (remote) compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_CLIPS_PER_SEC = 41.0  # fully preextracted, 1 CUDA GPU (baseline)

# env overrides for sweeps (defaults are the recorded configuration)
GEOMETRY = os.environ.get("BENCH_GEOMETRY", "3b")  # "3b" bf16 | "7b" int4 flagship
BATCH = int(os.environ.get("BENCH_BATCH", 384 if GEOMETRY == "3b" else 256))
PROMPT_LEN = int(os.environ.get("BENCH_PROMPT_LEN", 128))
NEW_TOKENS = int(os.environ.get("BENCH_NEW_TOKENS", 32))
MAX_LEN = max(int(os.environ.get("BENCH_MAX_LEN", 192)), PROMPT_LEN + NEW_TOKENS)
# 7b weight precision: 4 (group-128 int4, default — bf16 doesn't fit) or 8
BITS = int(os.environ.get("BENCH_BITS", 4))
# 3b mixed-precision decode: quantize a second decode-only weight copy
# (generate(decode_llm=...); bf16 prefill stays). 0 = off (default).
DECODE_BITS = int(os.environ.get("BENCH_DECODE_BITS", 0))
# KV-cache dtype: "int8" halves decode cache reads (lossy; off by default)
KV = os.environ.get("BENCH_KV", "")
# decode attention: "pallas" = fused single-kernel chain (qwen2.DECODE_ATTENTION)
DECODE_ATTN = os.environ.get("BENCH_DECODE_ATTN", "")


def qwen_3b_config():
    from affectgpt_tpu.models import qwen2

    return qwen2.QwenConfig(
        vocab_size=151936, hidden_size=2048, intermediate_size=11008,
        num_layers=36, num_heads=16, num_kv_heads=2, head_dim=128,
    )


def build(llm_cfg, dtype=jnp.bfloat16, quant_bits=None, fused=False):
    from affectgpt_tpu.models import affectgpt, qwen2

    cfg = affectgpt.AffectGPTConfig(
        llm=llm_cfg,
        video_fusion_type="attention", audio_fusion_type="attention",
        multi_fusion_type="attention",
        num_video_query_token=8, num_audio_query_token=8, num_multi_query_token=1,
    )
    if quant_bits is None:
        frozen = affectgpt.init_frozen(jax.random.PRNGKey(0), cfg, dtype=dtype)
    else:
        # 7B flagship: weights born quantized on device (the bf16 master tree
        # would not fit one v5e HBM; see qwen2.init_quantized_params)
        frozen = {
            "llm": qwen2.init_quantized_params(
                jax.random.PRNGKey(0), cfg.llm, bits=quant_bits, dtype=dtype,
                fused=fused,
            )
        }
    trainable = affectgpt.init_trainable(jax.random.PRNGKey(1), cfg, dtype=dtype)
    return cfg, frozen, trainable


def make_clip_batch(cfg, b):
    rng = np.random.RandomState(0)
    input_ids = rng.randint(1, 1000, (b, PROMPT_LEN)).astype(np.int32)
    offsets = {"multi": 2, "audio": 5, "face": 20, "frame": 30}
    q = {
        "multi": cfg.num_multi_query_token, "audio": cfg.num_audio_query_token,
        "face": cfg.num_video_query_token, "frame": cfg.num_video_query_token,
    }
    for m, off in offsets.items():
        input_ids[:, off : off + q[m]] = 0
    feats = {
        "frame": jnp.asarray(rng.randn(b, 8, cfg.visual_dim), jnp.bfloat16),
        "face": jnp.asarray(rng.randn(b, 8, cfg.visual_dim), jnp.bfloat16),
        "audio": jnp.asarray(rng.randn(b, 8, cfg.acoustic_dim), jnp.bfloat16),
    }
    return (
        jnp.asarray(input_ids),
        feats,
        {m: jnp.full((b,), off, jnp.int32) for m, off in offsets.items()},
    )


def main():
    from affectgpt_tpu.inference import generate as gen
    from affectgpt_tpu.models import affectgpt

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)

    if DECODE_ATTN:
        from affectgpt_tpu.models import qwen2 as _q

        _q.DECODE_ATTENTION = DECODE_ATTN
    if os.environ.get("BENCH_DECODE_MLP"):
        from affectgpt_tpu.models import qwen2 as _q

        _q.DECODE_MLP = os.environ["BENCH_DECODE_MLP"]
    if os.environ.get("BENCH_DECODE_QKV"):
        from affectgpt_tpu.models import qwen2 as _q

        _q.DECODE_QKV = os.environ["BENCH_DECODE_QKV"]
    if os.environ.get("BENCH_DECODE_ATTN_O"):
        from affectgpt_tpu.models import qwen2 as _q

        _q.DECODE_ATTN_O = os.environ["BENCH_DECODE_ATTN_O"]
    if os.environ.get("BENCH_PREFILL_ATTN"):
        from affectgpt_tpu.models import qwen2 as _q

        _q.PREFILL_ATTENTION = os.environ["BENCH_PREFILL_ATTN"]
    if GEOMETRY == "7b":
        from affectgpt_tpu.models import qwen2

        llm_cfg = qwen2.QwenConfig.qwen25_7b()
        layers_override = int(os.environ.get("BENCH_LAYERS", 0))
        if layers_override:  # decode cost-structure sweeps (per-layer vs fixed)
            llm_cfg = qwen2.QwenConfig(**{**llm_cfg.__dict__, "num_layers": layers_override})
        # BENCH_FUSED=1: qkv + gate/up concatenated layout (wins at b<=256,
        # OOMs earlier — measured; default off, matching inference_hybird).
        # BENCH_FUSED=qkv: qkv-only fusion (8× smaller prefill dequant
        # transient than the gateup concat — the b352 OOM fix candidate).
        fused_env = os.environ.get("BENCH_FUSED", "0")
        fused = "qkv" if fused_env == "qkv" else bool(int(fused_env or 0))
        cfg, frozen, trainable = build(llm_cfg, quant_bits=BITS, fused=fused)
    else:
        llm_cfg = qwen_3b_config()
        cfg, frozen, trainable = build(llm_cfg)
    gcfg = gen.GenerateConfig(max_new_tokens=NEW_TOKENS, do_sample=False, eos_token_id=0)

    input_ids, feats, offsets = make_clip_batch(cfg, BATCH)
    lengths = jnp.full((BATCH,), PROMPT_LEN, jnp.int32)

    decode_llm = None
    if DECODE_BITS and GEOMETRY != "7b":
        from affectgpt_tpu.models import qwen2 as _q

        # quantize on device (jit) — the bf16 master is already resident
        decode_llm = jax.jit(lambda p: _q.quantize_params(p, bits=DECODE_BITS))(
            frozen["llm"]
        )

    @jax.jit
    def clip_to_tokens(frozen, trainable, decode_llm, input_ids, feats, offsets, lengths, rng):
        embeds = affectgpt.build_inputs_embeds(
            frozen, trainable, cfg, input_ids, feats, offsets
        )
        # lora=None: the serving path folds LoRA into the weights at load
        # time (qwen2.merge_lora, inference_hybird default) — identical
        # outputs, no per-step adapter matmuls
        return gen.generate(
            frozen["llm"], cfg.llm, gcfg, embeds, lengths, rng,
            max_len=MAX_LEN, lora=None, decode_llm=decode_llm,
            cache_dtype=jnp.int8 if KV == "int8" else None,
        )

    rng = jax.random.PRNGKey(0)
    # warmup + compile. NOTE: on the axon relay backend block_until_ready is
    # not a reliable fence — a device→host transfer is, so every timing
    # boundary fetches the (tiny) token array.
    tokens, nv = clip_to_tokens(
        frozen, trainable, decode_llm, input_ids, feats, offsets, lengths, rng
    )
    np.asarray(tokens)

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        tokens, nv = clip_to_tokens(
            frozen, trainable, decode_llm, input_ids, feats, offsets, lengths,
            jax.random.fold_in(rng, i),
        )
        np.asarray(tokens)
    dt = time.perf_counter() - t0

    clips_per_sec = BATCH * iters / dt
    print(
        json.dumps(
            {
                "metric": (
                    "tri-modal preextracted clips/sec/chip "
                    + (
                        f"(7B flagship LLM, int{BITS} weights, {NEW_TOKENS}-tok decode, batch {BATCH})"
                        if GEOMETRY == "7b"
                        else (
                            "(3B-class LLM, bf16"
                            + (f" prefill + int{DECODE_BITS} decode" if DECODE_BITS else "")
                            + f", {NEW_TOKENS}-tok decode, batch {BATCH})"
                        )
                    )
                ),
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / REFERENCE_CLIPS_PER_SEC, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
