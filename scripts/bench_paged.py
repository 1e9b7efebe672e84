"""Paged continuous-batching vs dense batch serving on one TPU chip.

Publishes the paged-vs-dense clips/s comparison at serving batch (the
round-2 gap: the engine existed but had no measured number). Same 3B
merged-LoRA serving weights and clip workload as bench.py; the dense path
decodes fixed batches through the compiled generate(); the paged path
streams the same requests through PagedBatchServer (slots ≪ requests,
admission as slots free).

The engine decodes in multi-step bursts (paged_decode_burst: lax.scan of
the decode step with in-graph sampling) so the host↔relay round trips —
token upload, dispatch, argmax, token fetch, 98 ms/token when paid per
step — amortize over PAGED_BURST tokens.

Run: python scripts/bench_paged.py [--repeats N]
Env: PAGED_REQUESTS (256), PAGED_SLOTS (64), PAGED_NEW (32),
     PAGED_DENSE_BATCH (256), PAGED_BURST (8), PAGED_BLOCK (16),
     PAGED_GEOMETRY=7b + PAGED_BITS (8) for the int8 flagship geometry
     (LoRA unmerged — quantized weights can't absorb the merge),
     PAGED_KV=int8 for quantized pools (2× tokens-in-flight per HBM byte),
     PAGED_PREFILL_BATCH (256) — cap requests per admission; set 128 for
     the 7B s384 capacity configs (bounds prefill HBM temps, see CLAUDE.md).
     PAGED_PREFILL_CHUNK (0=off) — chunked prefill: cap each admission at
     N prompt TOKENS so decodes stall at most one chunk between bursts
     (TTFT lever; A/B with the sla line).
     PAGED_REPEATS / --repeats N (1): run the paged streaming phase N
     times and report median ± spread — the harness has a measured ±6%
     run-to-run variance (CLAUDE.md), so any paged A/B under that MUST
     use repeats ≥ 3 to be decidable; the detail fields come from the
     median-throughput run.
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

REQUESTS = int(os.environ.get("PAGED_REQUESTS", 256))
SLOTS = int(os.environ.get("PAGED_SLOTS", 64))
NEW = int(os.environ.get("PAGED_NEW", 32))
DENSE_BATCH = int(os.environ.get("PAGED_DENSE_BATCH", 256))
BURST = int(os.environ.get("PAGED_BURST", 8))
PROMPT_LEN = 128


def _parse_repeats() -> int:
    """--repeats N / PAGED_REPEATS — validated at import time, BEFORE the
    multi-minute model build + warmup compile, so a malformed flag fails
    in milliseconds instead of after an exclusive TPU session."""
    repeats = int(os.environ.get("PAGED_REPEATS", 1))
    if "--repeats" in sys.argv:
        i = sys.argv.index("--repeats")
        if i + 1 >= len(sys.argv):
            raise SystemExit("usage: bench_paged.py [--repeats N] — missing N")
        try:
            repeats = int(sys.argv[i + 1])
        except ValueError:
            raise SystemExit(
                f"usage: bench_paged.py [--repeats N] — got {sys.argv[i + 1]!r}"
            ) from None
    return max(repeats, 1)


REPEATS = _parse_repeats()


class _Tok:
    eos_token_id = 0


def main():
    from affectgpt_tpu.inference import generate as gen
    from affectgpt_tpu.inference.paged import PagedBatchServer, PagedConfig
    from affectgpt_tpu.inference.server import Request
    from bench import build, make_clip_batch, qwen_3b_config

    geom = os.environ.get("PAGED_GEOMETRY", "3b")
    if geom == "7b":
        # flagship geometry: weights born int8-quantized on device (the
        # bf16 master tree would not fit one v5e HBM) — LoRA stays
        # unmerged (merge requires the bf16 "w" layout)
        from affectgpt_tpu.models import qwen2 as _q7

        cfg, frozen, trainable = build(
            _q7.QwenConfig.qwen25_7b(),
            quant_bits=int(os.environ.get("PAGED_BITS", 8)),
        )
    else:
        cfg, frozen, trainable = build(qwen_3b_config())
    if geom == "3b" and int(os.environ.get("PAGED_MERGE", 1)):
        # merged-LoRA serving for BOTH paths (inference_hybird default):
        # the paged decode step otherwise pays ~400 small adapter dots
        from affectgpt_tpu.models import qwen2

        frozen = {**frozen, "llm": qwen2.merge_lora(frozen["llm"], trainable["lora"], cfg.llm)}
        trainable = {**trainable, "lora": None}
    print(f"# device: {jax.devices()[0]}", flush=True)
    input_ids, feats, offsets = make_clip_batch(cfg, DENSE_BATCH)

    # ---- dense path: fixed batches through compiled generate ----
    from affectgpt_tpu.models import affectgpt

    lengths = jnp.full((DENSE_BATCH,), PROMPT_LEN, jnp.int32)
    gcfg = gen.GenerateConfig(max_new_tokens=NEW, do_sample=False, eos_token_id=0)
    max_len = PROMPT_LEN + NEW + 32

    @jax.jit
    def dense_answer(frozen, trainable, input_ids):
        embeds = affectgpt.build_inputs_embeds(
            frozen, trainable, cfg, input_ids, feats, offsets
        )
        return gen.generate(
            frozen["llm"], cfg.llm, gcfg, embeds, lengths, jax.random.PRNGKey(0),
            max_len=max_len, lora=trainable["lora"],
        )

    tokens, _ = dense_answer(frozen, trainable, input_ids)
    np.asarray(tokens)  # compile + fence
    n_batches = -(-REQUESTS // DENSE_BATCH)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        np.asarray(dense_answer(frozen, trainable, input_ids)[0])
    dense_dt = time.perf_counter() - t0
    dense_cps = n_batches * DENSE_BATCH / dense_dt
    print(json.dumps({"dense_clips_per_s": round(dense_cps, 1),
                      "batch": DENSE_BATCH}), flush=True)

    # ---- paged path: stream the same requests through the engine ----
    # PAGED_MAX_TOKENS over-provisions per-sequence tables beyond the
    # workload's need (capacity configs size tables for max_seq_len while
    # live sequences stay short) — the regime gather-width bucketing
    # (PAGED_GATHER_BUCKET) exists for.
    max_tokens = int(os.environ.get("PAGED_MAX_TOKENS", PROMPT_LEN + NEW))
    block = int(os.environ.get("PAGED_BLOCK", 16))
    pcfg = PagedConfig(
        block_size=block,
        num_blocks=SLOTS * (-(-max_tokens // block)) + 64,
        max_blocks_per_seq=-(-max_tokens // block),
    )
    pool_dtype = (
        jnp.int8 if os.environ.get("PAGED_KV") == "int8"
        else frozen["llm"]["embed_tokens"]["table"].dtype
    )
    server = PagedBatchServer(
        frozen, trainable, cfg, _Tok(), pcfg=pcfg, max_slots=SLOTS,
        dtype=pool_dtype, do_sample=False,
        decode_burst=BURST,
        prefill_batch=int(os.environ.get("PAGED_PREFILL_BATCH", 256)),
        # chunked prefill: bound each admission to ≤ N prompt tokens so
        # in-flight decodes stall at most one chunk between bursts
        # (0 = off, the default)
        prefill_chunk_tokens=(
            int(os.environ["PAGED_PREFILL_CHUNK"])
            if int(os.environ.get("PAGED_PREFILL_CHUNK", 0)) else None
        ),
    )
    feats_np = {m: np.asarray(v) for m, v in feats.items()}
    ids_np = np.asarray(input_ids)

    def stream_requests(base_rid: int, count: int):
        """Submit `count` requests, drain, return (cps, stats, sla, dt)."""
        server.results.clear()
        server.stats = {k: 0 for k in server.stats}
        server.clock.__init__()
        for i in range(count):
            server.submit(Request(
                request_id=base_rid + i, input_ids=ids_np[i % DENSE_BATCH],
                features={m: v[i % DENSE_BATCH] for m, v in feats_np.items()},
                offsets={m: int(np.asarray(o)[i % DENSE_BATCH]) for m, o in offsets.items()},
                max_new_tokens=NEW,
            ))
        t0 = time.perf_counter()
        server.run_until_drained()
        dt = time.perf_counter() - t0
        return count / dt, dict(server.stats), server.clock.summary(), dt

    # warm the compiled programs (full-bucket prefill + decode step)
    stream_requests(10_000, SLOTS)

    runs = [stream_requests(r * REQUESTS, REQUESTS) for r in range(REPEATS)]
    runs.sort(key=lambda r: r[0])
    paged_cps, stats, sla, paged_dt = runs[len(runs) // 2]  # median run
    cps_list = [round(r[0], 1) for r in runs]
    occupancy = stats["decode_slot_tokens"] / max(stats["decode_steps"] * SLOTS, 1)
    print(json.dumps({
        "metric": f"paged vs dense clips/s ({geom.upper()}, {REQUESTS} reqs, slots {SLOTS}, {NEW} new)",
        "value": round(paged_cps, 1),
        "unit": "clips/s",
        "repeats": len(runs),
        "runs_clips_per_s": cps_list,  # sorted; value = median
        "spread_pct": round(100 * (cps_list[-1] - cps_list[0]) / max(paged_cps, 1e-9), 1),
        "dense_clips_per_s": round(dense_cps, 1),
        "paged_over_dense": round(paged_cps / dense_cps, 3),
        "decode_steps": stats["decode_steps"],
        "decode_bursts": stats.get("decode_bursts", 0),
        "burst": BURST,
        "slot_occupancy": round(occupancy, 3),
        "ms_per_token_step": round(paged_dt * 1e3 / max(stats["decode_steps"], 1), 2),
        "t_prefill_s": round(stats["t_prefill"], 2),
        "t_decode_s": round(stats["t_decode"], 2),
        "t_host_s": round(paged_dt - stats["t_prefill"] - stats["t_decode"], 2),
    }), flush=True)
    # request-level SLA distribution of the median run (TTFT includes
    # queueing behind the earlier admissions — the continuous-batching
    # trade the engine makes)
    print(json.dumps({"sla": sla}), flush=True)


if __name__ == "__main__":
    main()
