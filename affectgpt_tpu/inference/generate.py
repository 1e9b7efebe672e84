"""Compiled autoregressive generation: batched prefill + KV-cache decode.

Replaces the reference's HF `llama_model.generate` call inside `Chat`
(reference: my_affectgpt/conversation/conversation_video.py:303-388,
sampling, top-p 0.9, ≤1200 new tokens, '###'/eos stopping) with a
TPU-native engine:

- The whole decode loop is ONE compiled program (lax.scan over steps),
  not per-token Python dispatch.
- Batched decoding of prompts with different lengths via left-packing:
  rows are rolled so every prompt ends at the same column, so each
  decode step writes one shared cache column (a single fused
  dynamic_update_slice) — the reference decodes strictly batch-1.
- Top-p (nucleus) sampling and greedy both on device; fp32 logits.
- Stop handling: eos plus up to N single-token stop ids on device;
  multi-token stop strings ('###') are trimmed host-side, matching the
  reference's post-processing (conversation_video.py:380-385).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from affectgpt_tpu.models import qwen2


@dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 300
    temperature: float = 1.0
    top_p: float = 0.9
    do_sample: bool = True
    eos_token_id: int = 0
    # extra ids that terminate a row (single-token stops); -1 entries ignored
    stop_token_ids: Tuple[int, ...] = ()
    # HF RepetitionPenaltyLogitsProcessor semantics; 1.0 = off (free).
    # The reference's AU agent generates with 1.1 (my_affectgpt/models/
    # au_agent.py:191); its multimodal path uses the 1.0 default
    # (conversation_video.py:304).
    repetition_penalty: float = 1.0


def apply_repetition_penalty(
    logits: jnp.ndarray, seen: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """Exact HF RepetitionPenaltyLogitsProcessor math on [b, vocab] logits:
    for every token already present in the sequence (`seen` bool mask),
    score<0 → score*penalty, else score/penalty (transformers
    logits_process.py RepetitionPenaltyLogitsProcessor.__call__)."""
    logits = logits.astype(jnp.float32)
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, penalized, logits)


def _seen_from_prompt(prompt_ids, prompt_lengths, b, t_pad, vocab):
    """[b, vocab] bool presence mask of prompt tokens (padding excluded —
    the reference tokenizes unpadded batch-1 prompts, au_agent.py:181, so
    pad ids never reach HF's penalty there either)."""
    valid = jnp.arange(t_pad)[None, :] < prompt_lengths[:, None]
    # scatter invalid positions into a sacrificial column, then drop it
    clamped = jnp.where(valid, prompt_ids, vocab).astype(jnp.int32)
    seen = jnp.zeros((b, vocab + 1), bool)
    seen = seen.at[jnp.arange(b)[:, None], clamped].set(True)
    return seen[:, :vocab]


def top_p_mask(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Boolean keep-mask over [b, vocab] logits with EXACTLY the HF
    TopPLogitsWarper semantics the reference samples through
    (conversation_video.py:303-388 generates with do_sample, top_p=0.9):
    ascending sort, remove tokens whose ascending cumulative probability
    is <= 1 - top_p (inclusive threshold), always keep the top token
    (min_tokens_to_keep=1), remove by SORTED POSITION — ties at the
    nucleus boundary keep only as many members as the mass budget allows,
    not the whole tie class (the prior threshold-logit formulation kept
    every tied token; tests/test_generate.py pins the HF warper)."""
    sorted_idx = jnp.argsort(logits, axis=-1)  # ascending, stable
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    cumulative = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cumulative <= (1.0 - top_p)
    remove_sorted = remove_sorted.at[..., -1].set(False)
    batch_idx = jnp.arange(logits.shape[0])[:, None]
    remove = jnp.zeros_like(remove_sorted).at[batch_idx, sorted_idx].set(remove_sorted)
    return ~remove


def top_p_sample(rng: jax.Array, logits: jnp.ndarray, top_p: float, temperature: float) -> jnp.ndarray:
    """Nucleus sampling over [b, vocab] fp32 logits (temperature scaling
    first, then the HF-semantics nucleus mask — the warper order HF
    generate applies)."""
    logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    masked = jnp.where(top_p_mask(logits, top_p), logits, -jnp.inf)
    return jax.random.categorical(rng, masked, axis=-1)


def _left_pack(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Roll each row right by (t - len) so content ends at the last column."""
    t = x.shape[1]
    return jax.vmap(lambda row, s: jnp.roll(row, s, axis=0))(x, t - lengths)


@partial(
    jax.jit,
    static_argnames=("llm_cfg", "gen_cfg", "max_len", "cache_dtype"),
)
def generate(
    frozen_llm: dict,
    llm_cfg: qwen2.QwenConfig,
    gen_cfg: GenerateConfig,
    prompt_embeds: jnp.ndarray,
    prompt_lengths: jnp.ndarray,
    rng: jax.Array,
    max_len: int,
    lora: Optional[dict] = None,
    decode_llm: Optional[dict] = None,
    cache_dtype=None,
    prompt_ids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate continuations for a batch of spliced prompt embeddings.

    prompt_embeds [b, t_pad, d] right-padded; prompt_lengths [b].
    max_len must be >= t_pad + max_new_tokens (KV-cache capacity).
    prompt_ids [b, t_pad] (right-padded, optional): only consulted when
    gen_cfg.repetition_penalty != 1.0 — HF penalizes prompt AND generated
    tokens, so full parity needs the ids; without them only generated
    tokens are penalized (documented delta). Multimodal patch positions
    may carry placeholder ids; the reference only uses the penalty on the
    text-only AU-agent path where ids are exact.
    decode_llm: optional second weight copy used ONLY inside the decode
    scan — pass int8-quantized weights (qwen2.quantize_params) to run
    bf16 prefill (compute-bound, MXU wants bf16) with int8 decode
    (weight-bandwidth-bound, halves the per-step HBM read). Costs one
    extra resident copy of the decoder weights.
    cache_dtype: KV-cache dtype override; jnp.int8 selects the quantized
    cache (per-row scales, half the decode cache read — see
    qwen2.init_cache). Default: the prompt embedding dtype.
    Returns (tokens [b, max_new_tokens], num_valid [b]) where tokens after
    the stop position are pad (eos).
    """
    b, t_pad, _ = prompt_embeds.shape
    assert max_len >= t_pad + gen_cfg.max_new_tokens

    # left-pack so all rows end at column t_pad-1
    embeds = _left_pack(prompt_embeds, prompt_lengths)
    pad_len = t_pad - prompt_lengths  # [b]
    key_valid = jnp.arange(t_pad)[None, :] >= pad_len[:, None]  # [b, t_pad]
    positions = jnp.maximum(jnp.arange(t_pad)[None, :] - pad_len[:, None], 0)

    # ---- prefill ----
    cache = qwen2.init_cache(llm_cfg, b, max_len, dtype=cache_dtype or embeds.dtype)
    causal = jnp.arange(max_len)[None, None, :] <= jnp.arange(t_pad)[None, :, None]
    key_valid_full = jnp.pad(key_valid, ((0, 0), (0, max_len - t_pad)))
    prefill_mask = causal & key_valid_full[:, None, :]
    logits, cache = qwen2.forward(
        frozen_llm, llm_cfg, embeds, prefill_mask,
        lora=lora, positions=positions, cache=cache, cache_index=jnp.int32(0),
        last_token_only=True,  # left-packed: every prompt ends at the last column
    )
    last_logits = logits[:, -1, :]

    stop_ids = jnp.asarray(
        (gen_cfg.eos_token_id,) + tuple(gen_cfg.stop_token_ids), dtype=jnp.int32
    )
    step_llm = decode_llm if decode_llm is not None else frozen_llm

    use_rp = gen_cfg.repetition_penalty != 1.0  # static: off costs nothing
    if use_rp:
        vocab = last_logits.shape[-1]
        if prompt_ids is not None:
            seen0 = _seen_from_prompt(prompt_ids, prompt_lengths, b, t_pad, vocab)
        else:
            seen0 = jnp.zeros((b, vocab), bool)
    else:
        seen0 = jnp.zeros((b, 1), bool)  # inert carry placeholder

    def step(carry, step_idx):
        cache, cur_logits, done, rng, cur_pos, seen = carry
        rng, sample_key = jax.random.split(rng)
        if use_rp:
            cur_logits = apply_repetition_penalty(
                cur_logits, seen, gen_cfg.repetition_penalty
            )
        if gen_cfg.do_sample:
            token = top_p_sample(sample_key, cur_logits, gen_cfg.top_p, gen_cfg.temperature)
        else:
            token = jnp.argmax(cur_logits, axis=-1)
        token = jnp.where(done, gen_cfg.eos_token_id, token).astype(jnp.int32)
        if use_rp:  # the emitted token joins the penalized set for later steps
            seen = seen.at[jnp.arange(b), token].set(True)
        new_done = done | jnp.any(token[:, None] == stop_ids[None, :], axis=-1)

        # embed + one decode step at shared cache column
        tok_embeds = qwen2.embed_tokens(step_llm, token)[:, None, :].astype(embeds.dtype)
        write_idx = t_pad + step_idx
        key_mask = (jnp.arange(max_len)[None, None, :] <= write_idx) & jnp.concatenate(
            [key_valid, jnp.ones((b, max_len - t_pad), dtype=bool)], axis=1
        )[:, None, :]
        logits_d, cache = qwen2.forward(
            step_llm, llm_cfg, tok_embeds, key_mask,
            lora=lora, positions=cur_pos[:, None], cache=cache,
            cache_index=write_idx,
        )
        return (cache, logits_d[:, 0, :], new_done, rng, cur_pos + 1, seen), token

    init_pos = prompt_lengths.astype(jnp.int32)  # next position per row
    init = (cache, last_logits, jnp.zeros((b,), dtype=bool), rng, init_pos, seen0)
    (_, _, done, _, _, _), tokens = jax.lax.scan(
        step, init, jnp.arange(gen_cfg.max_new_tokens, dtype=jnp.int32)
    )
    tokens = tokens.T  # [b, max_new_tokens]

    is_stop = jnp.any(tokens[:, :, None] == stop_ids[None, None, :], axis=-1)
    # valid length = index of first stop token (or all tokens)
    num_valid = jnp.where(
        jnp.any(is_stop, axis=1),
        jnp.argmax(is_stop, axis=1),
        gen_cfg.max_new_tokens,
    )
    return tokens, num_valid


@partial(
    jax.jit,
    static_argnames=("llm_cfg", "gen_cfg", "max_len", "draft_len", "cache_dtype", "return_stats"),
)
def generate_speculative(
    frozen_llm: dict,
    llm_cfg: qwen2.QwenConfig,
    gen_cfg: GenerateConfig,
    prompt_embeds: jnp.ndarray,
    prompt_lengths: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    max_len: int,
    lora: Optional[dict] = None,
    draft_len: int = 4,
    cache_dtype=None,
    return_stats: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prompt-lookup speculative GREEDY decoding — exact same tokens as
    `generate(do_sample=False)`, fewer weight sweeps per token.

    Decode is HBM-bound: every step re-reads all decoder weights to emit
    ONE token. Here each loop iteration verifies `draft_len` lookahead
    tokens in a single forward (t = draft_len+1 — the weights are read
    once either way), so at draft-acceptance rate a the decode-phase
    weight traffic drops ~(1+a·draft_len)×; at zero acceptance it emits
    1 token/iteration like plain decode (the extra t on the MXU is ~free
    in an HBM-bound phase). Drafts come from prompt-lookup (vLLM/HF
    "prompt lookup decoding"): the continuation of the most recent earlier
    occurrence of the last token in the id history — emotion-description
    outputs are templated and self-repeating, so real-checkpoint
    acceptance is high. Greedy acceptance is exact in exact arithmetic
    (bitwise-identical to `generate(do_sample=False)` in f32 — covered by
    parity tests); in bf16 a t=D+1 verify block and a t=1 step can tile
    matmuls differently, so near-tie argmaxes may rarely flip (standard
    for speculative implementations). Sampling requests should use
    `generate`.

    prompt_ids [b, t_pad] right-padded token ids of the prompt (patch
    positions may be 0 — they simply never produce useful lookups).
    Returns (tokens [b, max_new_tokens], num_valid [b]) like `generate`.
    """
    assert not gen_cfg.do_sample, "speculative decoding is greedy-only"
    assert gen_cfg.repetition_penalty == 1.0, (
        "repetition_penalty is not supported on the speculative path "
        "(the reference only penalizes on the sampled AU-agent path)"
    )
    b, t_pad, _ = prompt_embeds.shape
    max_new = gen_cfg.max_new_tokens
    d = draft_len
    assert max_len >= t_pad + max_new + d  # speculative writes overshoot by ≤ d

    # ---- prefill (identical to generate) ----
    embeds = _left_pack(prompt_embeds, prompt_lengths)
    ids_packed = _left_pack(prompt_ids, prompt_lengths)
    pad_len = t_pad - prompt_lengths
    key_valid = jnp.arange(t_pad)[None, :] >= pad_len[:, None]
    positions = jnp.maximum(jnp.arange(t_pad)[None, :] - pad_len[:, None], 0)

    cache = qwen2.init_cache(llm_cfg, b, max_len, dtype=cache_dtype or prompt_embeds.dtype)
    causal = jnp.arange(max_len)[None, None, :] <= jnp.arange(t_pad)[None, :, None]
    key_valid_full = jnp.pad(key_valid, ((0, 0), (0, max_len - t_pad)))
    prefill_mask = causal & key_valid_full[:, None, :]
    logits, cache = qwen2.forward(
        frozen_llm, llm_cfg, embeds, prefill_mask,
        lora=lora, positions=positions, cache=cache, cache_index=jnp.int32(0),
        last_token_only=True,
    )
    t0 = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)  # first new token

    stop_ids = jnp.asarray(
        (gen_cfg.eos_token_id,) + tuple(gen_cfg.stop_token_ids), dtype=jnp.int32
    )
    is_stop = lambda tok: jnp.any(tok[..., None] == stop_ids, axis=-1)

    # id history: left-packed prompt + generated region [t_pad, t_pad+max_new)
    ids_buf = jnp.pad(ids_packed, ((0, 0), (0, max_len - t_pad)))
    key_valid_gen = jnp.concatenate(
        [key_valid, jnp.ones((b, max_len - t_pad), dtype=bool)], axis=1
    )

    def emit(ids_buf, n_emitted, tokens, count, active):
        """Write `count` tokens (prefix of `tokens` [b, d+1]) per active row
        at generation offset n_emitted; rows cap at max_new."""
        offs = t_pad + n_emitted  # [b]
        idx = jnp.arange(d + 1)[None, :]
        cols = offs[:, None] + idx  # [b, d+1] absolute columns
        write = active[:, None] & (idx < count[:, None]) & (cols < t_pad + max_new)
        onehot = (
            jnp.arange(max_len)[None, None, :] == cols[:, :, None]
        ) & write[:, :, None]  # [b, d+1, max_len]
        upd = jnp.einsum("bdm,bd->bm", onehot.astype(jnp.int32), tokens)
        keep = ~jnp.any(onehot, axis=1)
        return jnp.where(keep, ids_buf, upd), n_emitted + jnp.where(
            active, jnp.minimum(count, max_new - n_emitted), 0
        )

    def propose(ids_buf, last_tok, cur_abs):
        """Draft = continuation of the best earlier n-gram match of the
        stream head. Tiering (highest first): 2-gram match with the full
        d-token continuation already written > 1-gram match with full
        continuation > nearest 1-gram match. (Without the full-continuation
        constraint a short-period stream — the high-acceptance case this
        optimizes — always matches ≤2 tokens back and drafts unwritten
        zeros; 2-gram preference is standard prompt-lookup precision.)
        cur_abs [b] = absolute column where last_tok will sit."""
        idxs = jnp.arange(max_len)[None, :]
        hit1 = (ids_buf == last_tok[:, None]) & (idxs < cur_abs[:, None]) & key_valid_gen
        # previous stream token (always written: prompt is non-empty)
        prev = jax.vmap(lambda row, c: row[c])(ids_buf, jnp.maximum(cur_abs - 1, 0))
        # position idx-1 must itself be a valid stream token: the roll wraps
        # the last column to position 0 and left-pad zeros could otherwise
        # spuriously match `prev`, degrading draft quality
        prev_valid = jnp.roll(key_valid_gen, 1, axis=1)
        prev_at = (jnp.roll(ids_buf, 1, axis=1) == prev[:, None]) & prev_valid
        hit2 = hit1 & prev_at & (idxs >= 1)
        full = idxs < cur_abs[:, None] - d
        j2 = jnp.max(jnp.where(hit2 & full, idxs, -1), axis=-1)
        j1 = jnp.max(jnp.where(hit1 & full, idxs, -1), axis=-1)
        j_any = jnp.max(jnp.where(hit1, idxs, -1), axis=-1)
        j = jnp.where(j2 >= 0, j2, jnp.where(j1 >= 0, j1, j_any))  # -1 = none
        found = j >= 0
        start = jnp.where(found, j + 1, 0)

        def take(row, s):
            return jax.lax.dynamic_slice_in_dim(row, s, d, axis=0)

        drafts = jax.vmap(take)(ids_buf, start)  # [b, d]
        # fallback: repeat the last token (harmless; acceptance checks fix it)
        return jnp.where(found[:, None], drafts, last_tok[:, None])

    def body(carry):
        cache, ids_buf, n_emitted, t0, done, _ = carry
        active = ~done
        cur_abs = t_pad + n_emitted  # absolute slot of t0
        drafts = propose(ids_buf, t0, cur_abs)  # [b, d]
        tokens_in = jnp.concatenate([t0[:, None], drafts], axis=1)  # [b, d+1]

        tok_embeds = qwen2.embed_tokens(frozen_llm, tokens_in).astype(prompt_embeds.dtype)
        pos = (prompt_lengths + n_emitted)[:, None] + jnp.arange(d + 1)[None, :]
        # causal key mask: slot index ≤ query's absolute slot, and prompt pads out
        q_abs = cur_abs[:, None] + jnp.arange(d + 1)[None, :]  # [b, d+1]
        key_mask = (
            jnp.arange(max_len)[None, None, :] <= q_abs[:, :, None]
        ) & key_valid_gen[:, None, :]
        logits_v, cache = qwen2.forward(
            frozen_llm, llm_cfg, tok_embeds, key_mask,
            lora=lora, positions=pos, cache=cache, cache_index=cur_abs,
        )
        preds = jnp.argmax(logits_v, axis=-1).astype(jnp.int32)  # [b, d+1]

        # greedy acceptance: drafts[j] survives iff it equals preds[j] and
        # every earlier draft survived and no stop was emitted before it
        match = preds[:, :d] == drafts  # [b, d]
        acc = jnp.cumprod(match.astype(jnp.int32), axis=1)  # [b, d]
        n_acc = jnp.sum(acc, axis=1)  # accepted drafts per row
        # emitted this iteration: t0 (already known), accepted drafts, bonus
        bonus = jnp.take_along_axis(preds, n_acc[:, None], axis=1)[:, 0]
        out_tokens = jnp.concatenate(
            [t0[:, None], jnp.where(acc.astype(bool), drafts, 0)], axis=1
        )  # [b, 1+d]; only first 1+n_acc entries meaningful
        # stop handling: truncate at the first stop token among emitted
        cand = jnp.concatenate([t0[:, None], drafts], axis=1)  # [b, 1+d]
        emit_mask = jnp.concatenate(
            [jnp.ones((b, 1), jnp.int32), acc], axis=1
        )  # which cand entries are emitted
        stops = is_stop(cand) & (emit_mask.astype(bool))
        any_stop = jnp.any(stops, axis=1)
        first_stop = jnp.argmax(stops, axis=1)  # index among cand
        count = jnp.where(any_stop, first_stop + 1, 1 + n_acc)

        ids_buf, n_emitted = emit(ids_buf, n_emitted, out_tokens, count, active)
        # a stop in `bonus` is NOT done yet: the next iteration emits it
        # (generate() likewise emits the stop token into the output)
        new_done = done | (active & any_stop) | (n_emitted >= max_new)
        t0 = jnp.where(done, t0, bonus)
        return cache, ids_buf, n_emitted, t0, new_done, _ + 1

    def cond(carry):
        _, _, n_emitted, _, done, iters = carry
        return jnp.any(~done) & (iters < max_new)

    init = (
        cache, ids_buf, jnp.zeros((b,), jnp.int32), t0,
        jnp.zeros((b,), bool), jnp.int32(0),
    )
    cache, ids_buf, n_emitted, t0, done, iters = jax.lax.while_loop(cond, body, init)

    tokens = ids_buf[:, t_pad : t_pad + max_new]
    gen_stop = is_stop(tokens)
    num_valid = jnp.where(
        jnp.any(gen_stop, axis=1), jnp.argmax(gen_stop, axis=1), n_emitted
    )
    # pad tail with eos like generate(): the stop token at num_valid stays,
    # everything strictly after it becomes eos
    tail = jnp.arange(max_new)[None, :] > num_valid[:, None]
    tokens = jnp.where(tail, gen_cfg.eos_token_id, tokens)
    if return_stats:
        # iters = verify forwards run; tokens/iter ≈ mean emitted / iters
        return tokens, num_valid, iters
    return tokens, num_valid


def trim_output_text(text: str) -> str:
    """Host-side stop-string cleanup matching the reference EXACTLY
    (conversation_video.py:381-388): strip at eos, cut at the LAST '###'
    (the reference uses rsplit('###', 1), not a first-### cut), then take
    the text after the last 'Assistant:' and strip — which also handles a
    leading-space ' Assistant: ...' remnant a startswith check misses."""
    text = text.split("</s>")[0]
    text = text.rsplit("###", 1)[0]
    return text.split("Assistant:")[-1].strip()
