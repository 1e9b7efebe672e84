"""Speculative-decoding TPU A/B: plain greedy vs prompt-lookup speculative.

Decode-heavy configuration (the real MER-UniBench reasoning workload
decodes up to 300 tokens; the main bench's 32 tokens is the label-only
mode). Without pretrained weights, acceptance is bracketed honestly:

- random weights  → near-zero acceptance → measures the overhead floor
  (speculation should be ~free: weights are read once per verify step
  either way).
- rigged 2-column lm_head (model emits from a 2-token alphabet, like
  templated emotion descriptions repeat phrases) → high acceptance →
  measures the attainable ceiling.

Run: python scripts/bench_speculative.py  (one TPU process at a time!)
Env: SPEC_BATCH (128), SPEC_PROMPT (128), SPEC_NEW (128), SPEC_DRAFT (4).
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

BATCH = int(os.environ.get("SPEC_BATCH", 128))
PROMPT = int(os.environ.get("SPEC_PROMPT", 128))
NEW = int(os.environ.get("SPEC_NEW", 128))
DRAFT = int(os.environ.get("SPEC_DRAFT", 4))


def main():
    from affectgpt_tpu.inference import generate as gen
    from bench import qwen_3b_config

    from affectgpt_tpu.models import qwen2

    cfg = qwen_3b_config()
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    print(f"# device: {jax.devices()[0]}", flush=True)

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, 1000, (BATCH, PROMPT)), jnp.int32)
    lengths = jnp.full((BATCH,), PROMPT, jnp.int32)
    max_len = PROMPT + NEW + DRAFT
    gcfg = gen.GenerateConfig(max_new_tokens=NEW, do_sample=False, eos_token_id=0)

    def timed(fn, *args, **kw):
        toks, _ = fn(*args, **kw)
        np.asarray(toks)  # compile + fence
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            toks, _ = fn(*args, **kw)
            np.asarray(toks)
        return (time.perf_counter() - t0) / iters, np.asarray(toks)

    def run_pair(tag, p):
        embeds = qwen2.embed_tokens(p, ids).astype(jnp.bfloat16)
        t_ref, tok_ref = timed(
            gen.generate, p, cfg, gcfg, embeds, lengths, jax.random.PRNGKey(1),
            max_len=max_len,
        )
        t_spec, tok_spec = timed(
            gen.generate_speculative, p, cfg, gcfg, embeds, lengths, ids,
            max_len=max_len, draft_len=DRAFT,
        )
        _, nv, iters = gen.generate_speculative(
            p, cfg, gcfg, embeds, lengths, ids,
            max_len=max_len, draft_len=DRAFT, return_stats=True,
        )
        tpi = float(np.asarray(nv).mean()) / max(int(iters), 1)
        exact = bool((tok_ref == tok_spec).all())
        print(
            json.dumps(
                {
                    "metric": f"speculative decode A/B [{tag}] (3B, b{BATCH}, {NEW} new, D={DRAFT})",
                    "plain_s": round(t_ref, 3),
                    "spec_s": round(t_spec, 3),
                    "speedup": round(t_ref / t_spec, 3),
                    "tokens_per_iter": round(tpi, 2),
                    "token_exact": exact,
                }
            ),
            flush=True,
        )

    run_pair("random weights / ~0 acceptance", params)

    # rigged model: zero every decoder projection (hidden == embedding →
    # next token is a deterministic map of the last token) AND restrict the
    # head to two antipodal columns, collapsing the map's state space to
    # {42, 43} — the orbit cycles within 2 steps, so prompt-lookup drafts
    # accept the way templated real outputs do
    def zero_proj(layer):
        out = dict(layer)
        for n in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"):
            d = {"w": jnp.zeros_like(layer[n]["w"])}
            if "b" in layer[n]:
                d["b"] = jnp.zeros_like(layer[n]["b"])
            out[n] = d
        return out

    rigged = dict(params)
    rigged["layers"] = [zero_proj(l) for l in params["layers"]]
    w = jnp.zeros(params["lm_head"]["w"].shape, jnp.bfloat16)
    v = jnp.asarray(rng.randn(w.shape[0]), jnp.bfloat16)
    rigged["lm_head"] = {"w": w.at[:, 42].set(v).at[:, 43].set(-v)}
    run_pair("rigged 2-cycle model / high acceptance", rigged)


if __name__ == "__main__":
    main()
