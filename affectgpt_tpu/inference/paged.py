"""Paged KV cache: block-pool storage with per-sequence block tables.

North-star serving requirement (BASELINE.json: "decoder with paged KV
cache"): instead of one dense [slots, max_len] cache (inference/server),
K/V live in a shared pool of fixed-size blocks; each sequence holds an
int32 block table. HBM is sized by *tokens in flight*, not
slots × max_len, so many long-tailed generations fit one chip.

Device side:
- `paged_attention`: queries [b, 1, h, d] attend over gathered pages —
  one gather per layer ([b, blocks_per_seq, block, kv, d]) followed by a
  masked GQA einsum. Block gathers and the attention contraction both
  map onto TPU-friendly dense ops; a Pallas double-buffered gather is
  the planned upgrade (ROADMAP).
- `paged_write`: scatter one token's K/V into (block, offset) slots.

Host side:
- `BlockAllocator`: free-list allocate/free of pool blocks per sequence.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.models import qwen2


@dataclass(frozen=True)
class PagedConfig:
    block_size: int = 16
    num_blocks: int = 256  # pool blocks per layer
    max_blocks_per_seq: int = 16

    @property
    def max_seq_len(self) -> int:
        return self.block_size * self.max_blocks_per_seq


def init_paged_cache(llm_cfg: qwen2.QwenConfig, pcfg: PagedConfig, dtype=jnp.bfloat16):
    """Per-layer block pools: [num_blocks, block_size, kv_heads, head_dim].

    dtype=jnp.int8 selects the quantized pool (per-token/head fp32 scales in
    "k_scale"/"v_scale" side pools, mirroring qwen2.init_cache): 2× the
    tokens-in-flight per HBM byte and half the decode-phase page reads."""

    def layer_buf():  # fresh arrays per layer (donation-safe)
        shape = (pcfg.num_blocks, pcfg.block_size, llm_cfg.num_kv_heads, llm_cfg.head_dim)
        buf = {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}
        if dtype == jnp.int8:
            # Scale-pool layout is geometry-gated:
            # - FLAT [num_blocks, block·kv] (token-major, kv-minor) when
            #   block·kv ≥ 128: a trailing kv(/1) minor dim lane-pads to
            #   128 on TPU — measured 32× HLO-temp expansion (97 MB per
            #   copy at 7B s384/512-tok tables: f32[6208,32,4] → T(8,128))
            #   which OOMed the over-provisioned capacity config outright;
            #   flat block32·kv4 is exactly one 128-lane row (zero pad)
            #   and the same config then runs at 39.2 clips/s.
            # - legacy [num_blocks, block, kv, 1] below that: at 3B
            #   (block32·kv2 = 64) the flat layout's lane-sliver repacks
            #   measured −12% e2e (75.4 vs 86.1 clips/s, s256/512 reqs) —
            #   prefill scale repack + computed-column decode scatter cost
            #   more than the padding they save at small pools.
            if pcfg.block_size * llm_cfg.num_kv_heads >= 128:
                flat = (pcfg.num_blocks, pcfg.block_size * llm_cfg.num_kv_heads)
                buf["k_scale"] = jnp.zeros(flat, dtype=jnp.float32)
                buf["v_scale"] = jnp.zeros(flat, dtype=jnp.float32)
            else:
                buf["k_scale"] = jnp.zeros(shape[:3] + (1,), dtype=jnp.float32)
                buf["v_scale"] = jnp.zeros(shape[:3] + (1,), dtype=jnp.float32)
        return buf

    return [layer_buf() for _ in range(llm_cfg.num_layers)]


class BlockAllocator:
    """Free-list allocator with admission-time reservations: a sequence's
    future decode blocks (up to max_new_tokens) are counted against
    `reserved` when it is admitted, so a later admission can never starve
    an in-flight decode (pool exhaustion mid-step would otherwise abort
    the whole run)."""

    def __init__(self, pcfg: PagedConfig):
        self.pcfg = pcfg
        self.free: List[int] = list(range(pcfg.num_blocks - 1, 0, -1))
        # block 0 is reserved as the null page (block tables pad with 0)
        self.reserved = 0

    def available(self) -> int:
        """Blocks an admission may claim (free minus outstanding reservations)."""
        return len(self.free) - self.reserved

    def reserve(self, n_blocks: int) -> None:
        if n_blocks > self.available():
            raise RuntimeError("paged KV pool exhausted")
        self.reserved += n_blocks

    def release(self, n_blocks: int) -> None:
        assert n_blocks <= self.reserved
        self.reserved -= n_blocks

    def allocate(self, n_tokens: int) -> List[int]:
        n_blocks = -(-n_tokens // self.pcfg.block_size)
        if n_blocks > self.available():
            raise RuntimeError("paged KV pool exhausted")
        return [self.free.pop() for _ in range(n_blocks)]

    def extend(self, table: List[int], new_len: int) -> List[int]:
        """Grow table to cover new_len tokens (current coverage is derived
        from len(table) — blocks are never returned mid-sequence)."""
        need = -(-new_len // self.pcfg.block_size) - len(table)
        for _ in range(need):
            if not self.free:
                raise RuntimeError("paged KV pool exhausted")
            table.append(self.free.pop())
        return table

    def free_table(self, table: List[int]) -> None:
        self.free.extend(b for b in table if b != 0)


@partial(jax.jit, donate_argnames=("pool",))
def paged_write(pool: dict, k_new, v_new, block_ids, offsets) -> dict:
    """Write one token per sequence into a layer pool dict.
    k_new/v_new [b, kv, d]; block_ids/offsets [b]. int8 pools quantize on
    write (per-row scales into the side pools)."""
    if pool["k"].dtype == jnp.int8:
        (k_q, k_s) = qwen2._quantize_kv(k_new)
        (v_q, v_s) = qwen2._quantize_kv(v_new)
        out = {
            "k": pool["k"].at[block_ids, offsets].set(k_q),
            "v": pool["v"].at[block_ids, offsets].set(v_q),
        }
        if pool["k_scale"].ndim == 2:
            # flat scale pools [blocks, block·kv]: row for (offset, head h)
            # is offset·kv + h
            kv = pool["k"].shape[2]
            cols = offsets[:, None] * kv + jnp.arange(kv)[None, :]  # [b, kv]
            out["k_scale"] = pool["k_scale"].at[block_ids[:, None], cols].set(k_s[..., 0])
            out["v_scale"] = pool["v_scale"].at[block_ids[:, None], cols].set(v_s[..., 0])
        else:  # legacy [blocks, block, kv, 1]
            out["k_scale"] = pool["k_scale"].at[block_ids, offsets].set(k_s)
            out["v_scale"] = pool["v_scale"].at[block_ids, offsets].set(v_s)
        return out
    return {
        "k": pool["k"].at[block_ids, offsets].set(k_new.astype(pool["k"].dtype)),
        "v": pool["v"].at[block_ids, offsets].set(v_new.astype(pool["v"].dtype)),
    }


def paged_attention_auto(
    q, pool_k, pool_v, block_tables, seq_lens, num_kv_heads: int,
    k_scale=None, v_scale=None, use_pallas: bool = True,
) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU (double-buffered page DMA via
    scalar-prefetched block tables; int8 pools stream half the page bytes
    with scales folded in-kernel), XLA gather elsewhere. use_pallas=False
    forces the XLA path (required when the pools are tp-sharded: a
    pallas_call is opaque to the SPMD partitioner)."""
    if use_pallas and jax.default_backend() == "tpu":
        from affectgpt_tpu.ops.paged_attention_pallas import paged_attention_pallas

        if k_scale is not None:
            # the kernel streams per-page scale rows as [1, kv, block]
            # side pages; storage is flat [blocks, block·kv] or legacy
            # [blocks, block, kv, 1] (see init_paged_cache) — transpose
            # per call on this opt-in path (the [blocks, kv, block] TEMP
            # pads 8×, vs 256× for a trailing-1 layout; never at rest)
            nb, blk = pool_k.shape[0], pool_k.shape[1]
            if k_scale.ndim == 2:
                k_scale = k_scale.reshape(nb, blk, num_kv_heads).transpose(0, 2, 1)
                v_scale = v_scale.reshape(nb, blk, num_kv_heads).transpose(0, 2, 1)
            else:
                k_scale = k_scale[..., 0].transpose(0, 2, 1)
                v_scale = v_scale[..., 0].transpose(0, 2, 1)
        return paged_attention_pallas(
            q, pool_k, pool_v, block_tables, seq_lens, num_kv_heads,
            k_scale=k_scale, v_scale=v_scale,
        )
    return paged_attention(
        q, pool_k, pool_v, block_tables, seq_lens, num_kv_heads, k_scale, v_scale
    )


def paged_attention(
    q: jnp.ndarray,  # [b, heads, d] one query per sequence
    pool_k: jnp.ndarray,  # [blocks, block, kv, d]
    pool_v: jnp.ndarray,
    block_tables: jnp.ndarray,  # [b, max_blocks_per_seq] int32
    seq_lens: jnp.ndarray,  # [b] tokens valid per sequence
    num_kv_heads: int,
    k_scale=None,  # int8 pools: FLAT [blocks, block·kv] fp32 (token-major)
    v_scale=None,
) -> jnp.ndarray:
    """GQA attention over paged K/V (XLA gather reference). Returns
    [b, heads, d]. int8 pools: scales applied outside the contractions
    (same identities as qwen2._attention); the flat scale gather reshapes
    straight to [b, nblk·blk, kv] (identical element order)."""
    b, heads, d = q.shape
    groups = heads // num_kv_heads
    # gather pages: [b, nblk, blk, kv, d]
    k = pool_k[block_tables]
    v = pool_v[block_tables]
    nblk, blk = k.shape[1], k.shape[2]
    k = k.reshape(b, nblk * blk, num_kv_heads, d)
    v = v.reshape(b, nblk * blk, num_kv_heads, d)
    if k_scale is not None:
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)
        ks = k_scale[block_tables].reshape(b, nblk * blk, num_kv_heads)
        vs = v_scale[block_tables].reshape(b, nblk * blk, num_kv_heads)

    qg = q.reshape(b, num_kv_heads, groups, d)
    logits = jnp.einsum("bhgd,bkhd->bhgk", qg, k, preferred_element_type=jnp.float32)
    if k_scale is not None:
        logits = logits * ks.transpose(0, 2, 1)[:, :, None, :]
    logits = logits / jnp.sqrt(float(d))
    valid = jnp.arange(nblk * blk)[None, :] < seq_lens[:, None]  # [b, T]
    logits = jnp.where(valid[:, None, None, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * vs.transpose(0, 2, 1)[:, :, None, :]
    probs = probs.astype(v.dtype)
    out = jnp.einsum("bhgk,bkhd->bhgd", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(b, heads, d)


def _decode_core(
    frozen_llm: dict,
    llm_cfg: qwen2.QwenConfig,
    pools: list,
    tokens: jnp.ndarray,  # [b]
    positions: jnp.ndarray,  # [b] index of the token being decoded
    block_tables: jnp.ndarray,  # [b, max_blocks]
    pcfg: PagedConfig,
    lora: Optional[dict] = None,
    use_pallas: bool = True,
) -> Tuple[jnp.ndarray, list]:
    """One decode step over the paged cache for all sequences (traceable
    body shared by the compiled single step and the multi-step burst).
    Returns (logits [b, vocab], updated pools)."""
    scaling = llm_cfg.lora_alpha / llm_cfg.lora_r
    compute_dtype = pools[0]["k"].dtype
    if compute_dtype == jnp.int8:  # quantized pool: activations stay at weight dtype
        compute_dtype = frozen_llm["embed_tokens"]["table"].dtype
    x = qwen2.embed_tokens(frozen_llm, tokens)[:, None, :].astype(compute_dtype)
    b = x.shape[0]
    block_idx = positions // pcfg.block_size
    block_ids = jnp.take_along_axis(block_tables, block_idx[:, None], axis=1)[:, 0]
    offsets = positions % pcfg.block_size
    seq_lens = positions + 1

    from affectgpt_tpu.models import nn as _nn
    from affectgpt_tpu.models.qwen2 import _lora_dense, _mlp, _rope

    new_pools = []
    for i, layer in enumerate(frozen_llm["layers"]):
        lora_layer = lora["layers"][i] if lora is not None else None
        lget = (lambda n: lora_layer[n]) if lora_layer is not None else (lambda n: None)
        # fused decode qkv (same dispatch/gating as the dense decode step;
        # q=1 op-dispatch overhead is part of the paged-vs-dense step gap).
        # The input rmsnorm folds into the kernel (ln=) — only the fallback
        # path norms explicitly.
        fused = qwen2._decode_qkv_fused(
            layer, lora_layer, llm_cfg, x[:, 0, :], positions, ln=layer["input_ln"]
        )
        if fused is not None:
            q, k, v = fused  # [b, heads|kv, d], rope applied in-kernel
        else:
            h = _nn.rmsnorm(layer["input_ln"], x, llm_cfg.rms_eps)
            q = _lora_dense(layer["q_proj"], lget("q_proj"), h, scaling).reshape(
                b, 1, llm_cfg.num_heads, llm_cfg.head_dim
            )
            k = _lora_dense(layer["k_proj"], lget("k_proj"), h, scaling).reshape(
                b, 1, llm_cfg.num_kv_heads, llm_cfg.head_dim
            )
            v = _lora_dense(layer["v_proj"], lget("v_proj"), h, scaling).reshape(
                b, 1, llm_cfg.num_kv_heads, llm_cfg.head_dim
            )[:, 0]
            pos2 = positions[:, None]
            q = _rope(q, pos2, llm_cfg.rope_theta)[:, 0]
            k = _rope(k, pos2, llm_cfg.rope_theta)[:, 0]
        new_pool = paged_write(pools[i], k, v, block_ids, offsets)
        new_pools.append(new_pool)
        attn = paged_attention_auto(
            q.reshape(b, llm_cfg.num_heads, llm_cfg.head_dim),
            new_pool["k"], new_pool["v"],
            block_tables, seq_lens, llm_cfg.num_kv_heads,
            k_scale=new_pool.get("k_scale"), v_scale=new_pool.get("v_scale"),
            use_pallas=use_pallas,
        ).reshape(b, 1, llm_cfg.num_heads * llm_cfg.head_dim)
        attn = _lora_dense(layer["o_proj"], lget("o_proj"), attn, scaling, has_bias=False)
        x = x + attn
        y = qwen2._decode_mlp_fused(layer, lora_layer, llm_cfg, x)
        if y is not None:
            x = y
        else:
            h = _nn.rmsnorm(layer["post_attn_ln"], x, llm_cfg.rms_eps)
            x = x + _mlp(layer, lora_layer, llm_cfg, h)

    x = _nn.rmsnorm(frozen_llm["final_ln"], x, llm_cfg.rms_eps)
    if llm_cfg.tie_embeddings:
        logits = jnp.dot(x, frozen_llm["embed_tokens"]["table"].T,
                         preferred_element_type=jnp.float32)
    elif "w" not in frozen_llm["lm_head"]:
        # quantized weights (inference_hybird --int8 {'w_q','scales'} or
        # --int4 {'w_q4','scales'}): route through the same dequant matmul
        # dispatch as qwen2.forward
        logits = _lora_dense(frozen_llm["lm_head"], None, x, 0.0, has_bias=False).astype(
            jnp.float32
        )
    else:
        logits = jnp.dot(x, frozen_llm["lm_head"]["w"], preferred_element_type=jnp.float32)
    return logits[:, 0], new_pools


@partial(
    jax.jit,
    static_argnames=("llm_cfg", "pcfg", "use_pallas"),
    donate_argnames=("pools",),
)
def paged_decode_step(
    frozen_llm: dict,
    llm_cfg: qwen2.QwenConfig,
    pools: list,
    tokens: jnp.ndarray,  # [b]
    positions: jnp.ndarray,  # [b] index of the token being decoded
    block_tables: jnp.ndarray,  # [b, max_blocks]
    pcfg: PagedConfig,
    lora: Optional[dict] = None,
    use_pallas: bool = True,
) -> Tuple[jnp.ndarray, list]:
    """One decode step over the paged cache for all sequences.
    Returns (logits [b, vocab], updated pools).

    Compiled as ONE program: eagerly, the ~500 per-layer op dispatches
    each pay a host→device round trip — through the axon relay that was
    measured at 2.7 s/step (150× slower than the compiled step)."""
    return _decode_core(
        frozen_llm, llm_cfg, pools, tokens, positions, block_tables, pcfg,
        lora=lora, use_pallas=use_pallas,
    )


@partial(
    jax.jit,
    static_argnames=("llm_cfg", "pcfg", "use_pallas", "n_steps", "do_sample",
                     "top_p", "temperature"),
    donate_argnames=("pools",),
)
def paged_decode_burst(
    frozen_llm: dict,
    llm_cfg: qwen2.QwenConfig,
    pools: list,
    tokens: jnp.ndarray,  # [b] last sampled token per slot
    positions: jnp.ndarray,  # [b] position of the token being decoded
    block_tables: jnp.ndarray,  # [b, max_blocks]
    pcfg: PagedConfig,
    rng: jax.Array,
    n_steps: int,
    lora: Optional[dict] = None,
    use_pallas: bool = True,
    do_sample: bool = False,
    top_p: float = 0.9,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, list]:
    """n_steps decode iterations as ONE compiled program, sampling in-graph.

    The per-token host cost of the engine loop (token upload, step
    dispatch, eager argmax over [b, vocab], token fetch — each a relay
    round trip, ~98 ms/step measured) is paid once per burst instead of
    once per token: the lax.scan feeds each sampled token straight into
    the next step on device and the host fetches one [b, n_steps] int32
    array. vLLM's multi-step scheduling is the same trade
    (reference serves via vLLM, evaluation.py:120-122); the cost is that
    EOS/finish bookkeeping happens only at burst boundaries.

    Callers must pre-extend every live block table to cover
    positions + n_steps tokens. Returns (tokens [b, n_steps], pools)."""

    def body(carry, key):
        tokens, positions, pools = carry
        logits, pools = _decode_core(
            frozen_llm, llm_cfg, pools, tokens, positions, block_tables,
            pcfg, lora=lora, use_pallas=use_pallas,
        )
        if do_sample:
            from affectgpt_tpu.inference import generate as _gen

            nxt = _gen.top_p_sample(key, logits, top_p, temperature)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        return (nxt, positions + 1, pools), nxt

    keys = jax.random.split(rng, n_steps)
    (_, _, pools), toks = jax.lax.scan(body, (tokens, positions, pools), keys)
    return toks.T, pools  # [b, n_steps]


class PagedBatchServer:
    """Continuous batching over the paged cache: HBM is bounded by tokens
    in flight (block pool), not slots × max_len. Same request/result
    contract as inference.server.BatchServer; greedy by default,
    top-p sampling with do_sample=True."""

    def __init__(self, frozen, trainable, cfg, tokenizer, pcfg: Optional[PagedConfig] = None,
                 max_slots: int = 8, dtype=None, seed: int = 0,
                 do_sample: bool = False, top_p: float = 0.9, temperature: float = 1.0,
                 prefill_bucket: int = 64, mesh=None, decode_burst: int = 8,
                 admission: str = "reserve", prefill_batch: int = 256,
                 prefill_chunk_tokens: Optional[int] = None):
        from affectgpt_tpu.models import affectgpt as _affectgpt

        if mesh is not None:
            # tp>1 serving: weights by the mesh rules, page pools sharded
            # over kv heads ([blocks, block, kv, d]); GSPMD inserts the
            # collectives. The Pallas page kernel streams local shards only
            # when unsharded — sharded pools take the XLA gather path.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from affectgpt_tpu.parallel import mesh as mesh_lib

            frozen = mesh_lib.shard_params(mesh, frozen)
            trainable = mesh_lib.shard_params(mesh, trainable)
            tp = mesh.shape.get("tp", 1)
            kv_axis = "tp" if cfg.llm.num_kv_heads % max(tp, 1) == 0 else None
            self._pool_sharding = NamedSharding(mesh, P(None, None, kv_axis, None))
            # flat [blocks, block·kv] scale pools: replicated (tiny; GSPMD
            # reconciles with the kv-sharded value pools in the gather math)
            self._scale_sharding = NamedSharding(mesh, P(None, None))
            from affectgpt_tpu.models import qwen2 as _q

            _q.mark_tp_serving()  # Pallas decode kernels have no GSPMD rule
        else:
            self._pool_sharding = None
        self.frozen, self.trainable, self.cfg = frozen, trainable, cfg
        self.tokenizer = tokenizer
        self.pcfg = pcfg or PagedConfig()
        self.max_slots = max_slots
        if dtype is None:
            # match the model weights (same rule as the dense BatchServer):
            # an f32 pool against bf16 weights doubles pool HBM, runs the
            # whole decode core in f32, and silently disqualifies the fused
            # bf16 decode kernels
            dtype = jnp.result_type(jax.tree.leaves(frozen["llm"])[0].dtype)
        self.pools = init_paged_cache(cfg.llm, self.pcfg, dtype=dtype)
        if self._pool_sharding is not None:
            self.pools = jax.tree.map(
                lambda x: jax.device_put(
                    x,
                    self._pool_sharding if x.ndim == 4 else self._scale_sharding,
                ),
                self.pools,
            )
        self.alloc = BlockAllocator(self.pcfg)
        self.slots = [None] * max_slots  # per-slot dict or None
        self.pending: List = []
        self.results = {}
        # compiled per (bucket-batch, bucket-len, signature) — eager
        # admission embedding pays hundreds of relay round trips
        self._build_embeds = jax.jit(
            _affectgpt.build_inputs_embeds, static_argnames=("cfg",)
        )
        self.rng = jax.random.PRNGKey(seed)
        self.do_sample, self.top_p, self.temperature = do_sample, top_p, temperature
        # prompts padded to a bucket multiple → the prefill program is
        # shared across prompt lengths instead of recompiling per length
        self.prefill_bucket = min(prefill_bucket, self.pcfg.max_seq_len)
        # cap on requests per admission: one admission prefills as ONE
        # batched forward, so at large slot counts an uncapped admission
        # (slots → next pow2) dominates HBM temps — 7B int8 pools at 384
        # slots compile a [512, t] prefill and OOM where chunks of 128 fit
        # (TPU-measured: cap 128 runs 42.2 clips/s there vs OOM). Capping
        # costs throughput when HBM allows bigger chunks (3B s256: 99.8 at
        # cap 128 vs 104.7 at 256), so the default stays 256 and capacity
        # configs pass prefill_batch=128 (bench: PAGED_PREFILL_BATCH).
        self.prefill_batch = max(1, prefill_batch)
        # chunked prefill (scheduler-granularity): bound each admission's
        # prefill forward to ≤ chunk TOKENS (sum of admitted prompt
        # lengths), so an in-flight decode stalls at most one
        # chunk-sized prefill between bursts and early requests get their
        # first token without queueing behind a slot-wide admission —
        # the vLLM chunked-prefill trade at admission granularity (the
        # engine's step loop already interleaves admit → decode-burst;
        # this bounds the admit side's exclusive-phase length). None = off:
        # admissions are bounded by prefill_batch/slots/pool only.
        self.prefill_chunk_tokens = prefill_chunk_tokens
        # decode-burst length: tokens decoded per compiled device program
        # (power-of-two-bucketed at run time so the compile count stays
        # O(log burst)). 1 restores per-token host stepping.
        self.decode_burst = max(1, decode_burst)
        # "reserve" (default): admission claims a request's full-lifetime
        # block budget up front — decode can never starve, but a pool
        # sized below slots × max_tokens idles slots. "optimistic":
        # admission claims prompt blocks only; when a decode burst would
        # drain the pool, the youngest slot is recompute-preempted
        # (blocks freed, request requeued at the head — vLLM's recompute
        # preemption trade: higher occupancy for re-prefilled work).
        assert admission in ("reserve", "optimistic"), admission
        self.admission = admission
        if admission == "optimistic":
            # a lone survivor slot must always be able to grow to a full
            # table, or preemption cannot make a burst feasible
            assert self.pcfg.num_blocks - 1 >= self.pcfg.max_blocks_per_seq
        # engine counters (continuous-batching observability); t_* are
        # wall-clock seconds per device-fenced phase — t_prefill spans
        # admission staging → first-token fetch, t_decode spans burst
        # dispatch → token fetch; wall minus both is host bookkeeping
        self.stats = {
            "admissions": 0, "admitted_requests": 0,
            "decode_steps": 0, "decode_slot_tokens": 0, "decode_bursts": 0,
            "preemptions": 0, "t_prefill": 0.0, "t_decode": 0.0,
        }
        from affectgpt_tpu.inference.server import RequestClock

        self.clock = RequestClock()

    def _sample(self, logits: jnp.ndarray) -> jnp.ndarray:
        """logits [b, vocab] → tokens [b] (top-p when sampling, else argmax;
        the reference answer_sample defaults: top-p 0.9)."""
        if not self.do_sample:
            return jnp.argmax(logits, axis=-1)
        from affectgpt_tpu.inference import generate as _gen

        self.rng, key = jax.random.split(self.rng)
        return _gen.top_p_sample(key, logits, self.top_p, self.temperature)

    def submit(self, request) -> None:
        # boundary validation — two classes of request can NEVER be served
        # and would otherwise fail far from the caller:
        # (a) prompt ≥ max_seq_len: the t_bucket clamp would crash _admit
        #     mid-batch (leaking already-allocated blocks), and a prompt of
        #     exactly max_seq_len would decode one token through a clamped
        #     out-of-bounds page write (silent KV corruption of the last
        #     block's first entry);
        # (b) reserve-mode lifetime footprint larger than the whole pool:
        #     the admission check can never pass, so the request would
        #     livelock step() at the head of the queue and run_until_drained
        #     would spin max_steps then silently drop it and everything
        #     queued behind it.
        if len(request.input_ids) >= self.pcfg.max_seq_len:
            raise ValueError(
                f"prompt length {len(request.input_ids)} must be < "
                f"max_seq_len {self.pcfg.max_seq_len} (one position is "
                f"needed for decode)"
            )
        lifetime = len(request.input_ids) + (
            0 if self.admission == "optimistic" else request.max_new_tokens
        )
        need = min(
            -(-lifetime // self.pcfg.block_size), self.pcfg.max_blocks_per_seq
        )
        if need > self.pcfg.num_blocks - 1:  # block 0 is the null page
            raise ValueError(
                f"request needs {need} blocks (prompt {len(request.input_ids)}"
                f" + max_new_tokens {request.max_new_tokens}) but the pool "
                f"has only {self.pcfg.num_blocks - 1} allocatable blocks — "
                f"it could never be admitted"
            )
        self.pending.append(request)
        self.clock.submitted(request.request_id)

    def _admit(self) -> None:
        free = [i for i, s in enumerate(self.slots) if s is None]
        if not free or not self.pending:
            return
        # admit the longest prefix of pending requests that (a) fits the
        # free slots, (b) fits the block pool, and (c) shares one modality
        # signature — names AND shapes, since the whole admission prefills
        # as ONE batched forward via np.stack (a shape mismatch would raise
        # after this batch's blocks were already allocated, leaking them)
        def _sig(req):
            return tuple(sorted((m, tuple(v.shape)) for m, v in req.features.items()))

        signature = _sig(self.pending[0])
        modalities = [m for m, _ in signature]
        batch, blocks_needed, tokens_planned = [], 0, 0
        for req in self.pending:
            if len(batch) >= min(len(free), self.prefill_batch):
                break
            if _sig(req) != signature:
                break
            if (self.prefill_chunk_tokens is not None and batch
                    and tokens_planned + len(req.input_ids) > self.prefill_chunk_tokens):
                break  # chunk budget reached — rest admits after the next burst
            # "reserve": full-lifetime footprint (prompt + every decode
            # token the request may emit, capped by the table size) so the
            # pool can never run dry mid-decode. "optimistic": prompt
            # blocks only — decode growth is resolved by preemption.
            lifetime = len(req.input_ids) + (
                0 if self.admission == "optimistic" else req.max_new_tokens
            )
            need = min(
                -(-lifetime // self.pcfg.block_size),
                self.pcfg.max_blocks_per_seq,
            )
            if blocks_needed + need > self.alloc.available():
                break
            blocks_needed += need
            tokens_planned += len(req.input_ids)
            batch.append(req)
        if not batch:
            return
        del self.pending[: len(batch)]
        self.stats["admissions"] += 1
        self.stats["admitted_requests"] += len(batch)
        t_admit0 = time.perf_counter()

        # batch-size bucket (next power of two) — bounds the number of
        # compiled prefill programs to O(log slots × prompt buckets);
        # dummy rows prefill 1 token into the null page (block 0)
        n_real = len(batch)
        n_bucket = 1
        while n_bucket < n_real:
            n_bucket *= 2
        t_max = max(len(r.input_ids) for r in batch)
        t_bucket = min(-(-t_max // self.prefill_bucket) * self.prefill_bucket,
                       self.pcfg.max_seq_len)
        ids = np.zeros((n_bucket, t_bucket), np.int32)
        lengths = np.ones(n_bucket, np.int32)  # dummy rows: 1 token
        tables, padded_tables, reserves = [], [], []
        for i, req in enumerate(batch):
            ids[i, : len(req.input_ids)] = req.input_ids
            lengths[i] = len(req.input_ids)
            table = self.alloc.allocate(len(req.input_ids))
            if self.admission == "optimistic":
                reserve = 0
            else:
                total = min(
                    -(-(len(req.input_ids) + req.max_new_tokens) // self.pcfg.block_size),
                    self.pcfg.max_blocks_per_seq,
                )
                reserve = total - len(table)
            self.alloc.reserve(reserve)
            reserves.append(reserve)
            padded = np.zeros(self.pcfg.max_blocks_per_seq, np.int32)
            padded[: len(table)] = table
            tables.append(table)
            padded_tables.append(padded)
        n_dummy = n_bucket - n_real
        for _ in range(n_dummy):  # dummy rows: 1 token into the null page
            padded_tables.append(np.zeros(self.pcfg.max_blocks_per_seq, np.int32))
        feats = {
            m: jnp.asarray(np.stack(
                [r.features[m] for r in batch]
                + [np.zeros_like(np.asarray(batch[0].features[m]))] * n_dummy
            ))
            for m in modalities
        }
        offs = {
            m: jnp.asarray(
                [r.offsets.get(m, -1) for r in batch] + [-1] * n_dummy, jnp.int32
            )
            for m in modalities
        }
        embeds = self._build_embeds(
            self.frozen, self.trainable, self.cfg, jnp.asarray(ids), feats, offs,
        )
        last_logits, self.pools = prefill_batch_into_pages(
            self.frozen["llm"], self.cfg.llm, self.pools, embeds,
            jnp.asarray(lengths), np.stack(padded_tables), self.pcfg,
            lora=self.trainable["lora"],
        )
        first_tokens = np.asarray(self._sample(last_logits), np.int32)
        self.stats["t_prefill"] += time.perf_counter() - t_admit0
        for req in batch:
            self.clock.first_token(req.request_id)
        for i, req in enumerate(batch):
            slot = {
                "request_id": req.request_id, "table": tables[i],
                "padded": padded_tables[i], "pos": int(lengths[i]),
                "tokens": [int(first_tokens[i])],
                "remaining": req.max_new_tokens - 1,
                "reserved": reserves[i],
                "request": req,  # kept for recompute preemption requeue
            }
            slot_index = free[i]
            if slot["tokens"][0] == self.tokenizer.eos_token_id or slot["remaining"] <= 0:
                self._finish(slot_index, slot)
            else:
                self.slots[slot_index] = slot

    def _finish(self, index: int, slot: dict) -> None:
        tokens = slot["tokens"]
        if tokens and tokens[-1] == self.tokenizer.eos_token_id:
            tokens = tokens[:-1]
        self.results[slot["request_id"]] = tokens
        self.clock.finished(slot["request_id"], len(tokens))
        self.alloc.release(slot.get("reserved", 0))
        self.alloc.free_table(slot["table"])
        self.slots[index] = None

    def _preempt_for_burst(self, live, k):
        """Optimistic admission's escape hatch: if growing every live table
        by k tokens would drain the free list, recompute-preempt youngest
        slots (max remaining budget = least sunk decode work) until the
        burst fits. Preempted requests requeue at the head and re-prefill
        from their original prompt (generated tokens are discarded — the
        vLLM recompute-preemption semantics)."""

        def burst_blocks(s):
            target = min(s["pos"] + k, self.pcfg.max_seq_len)
            return max(0, -(-target // self.pcfg.block_size) - len(s["table"]))

        # available() (free minus reservations), not len(free): identical
        # under optimistic admission (reserved==0) but stays correct if a
        # reserve-mode engine ever coexists — otherwise the feasibility
        # check would overcount and alloc.extend could raise mid-step.
        while (sum(burst_blocks(s) for _, s in live) > self.alloc.available()
               and len(live) > 1):
            j = max(range(len(live)), key=lambda idx: live[idx][1]["remaining"])
            i, s = live.pop(j)
            self.alloc.release(s.get("reserved", 0))
            self.alloc.free_table(s["table"])
            # insert(0) per victim, preempting youngest-first, leaves the
            # LAST-preempted (oldest, most sunk work) at the queue head —
            # re-admission order is oldest-first, as intended
            self.pending.insert(0, s["request"])
            self.clock.preempted(s["request_id"])
            self.slots[i] = None
            self.stats["preemptions"] += 1
        return live

    def step(self) -> bool:
        self._admit()
        live = [(i, s) for i, s in enumerate(self.slots) if s is not None]
        if not live:
            return bool(self.pending)
        # burst length: bounded by the tightest slot's remaining budget and
        # table capacity, then power-of-two-bucketed so the number of
        # compiled burst programs stays O(log decode_burst). Slots that hit
        # EOS mid-burst waste their tail decodes (vLLM multi-step trade) —
        # through the axon relay the per-step host round trips cost far
        # more (98 → ~12 ms/token measured at burst 8, slots 64).
        k = min(
            self.decode_burst,
            min(s["remaining"] for _, s in live),
            max(1, self.pcfg.max_seq_len - 1 - max(s["pos"] for _, s in live)),
        )
        k = max(1, k)
        while k & (k - 1):  # round down to a power of two
            k &= k - 1
        if self.admission == "optimistic":
            live = self._preempt_for_burst(live, k)
        for _, s in live:
            before = len(s["table"])
            # growth comes out of this slot's admission-time reservation
            target = min(s["pos"] + k, self.pcfg.max_seq_len)
            need = -(-target // self.pcfg.block_size) - before
            if need > 0:
                self.alloc.release(min(need, s["reserved"]))
            self.alloc.extend(s["table"], target)
            s["reserved"] = max(0, s["reserved"] - (len(s["table"]) - before))
            s["padded"][: len(s["table"])] = s["table"]
        # pad the live set to max_slots so the decode step compiles ONCE
        # (live count churns every step under continuous batching; dummy
        # rows decode token 0 at position 0 into the null page — block 0 is
        # reserved for exactly this, and no real table maps it)
        n_pad = self.max_slots - len(live)
        tokens = jnp.asarray(
            [s["tokens"][-1] for _, s in live] + [0] * n_pad, jnp.int32
        )
        positions = jnp.asarray([s["pos"] for _, s in live] + [0] * n_pad, jnp.int32)
        # gather-width bucketing: the decode attention gathers EVERY table
        # column (pool_k[block_tables] is shape-static), so an
        # over-provisioned max_blocks_per_seq (capacity configs size tables
        # for max_seq_len while live sequences are short) reads dead pages
        # every step. Slice tables to the next power-of-two width covering
        # max live pos + burst — ≤ log2(max_blocks) compiled variants.
        width = self.pcfg.max_blocks_per_seq
        if os.environ.get("PAGED_GATHER_BUCKET", "1") != "0":
            need = -(-(max(s["pos"] for _, s in live) + k) // self.pcfg.block_size)
            width = 1
            while width < need:
                width *= 2
            width = min(width, self.pcfg.max_blocks_per_seq)
            self.stats["gather_width_tokens"] = self.stats.get(
                "gather_width_tokens", 0
            ) + width * self.pcfg.block_size * k
        tables = jnp.asarray(np.stack(
            [s["padded"][:width] for _, s in live]
            + [np.zeros(width, np.int32)] * n_pad
        ))
        self.rng, key = jax.random.split(self.rng)
        t_dec0 = time.perf_counter()
        toks, self.pools = paged_decode_burst(
            self.frozen["llm"], self.cfg.llm, self.pools, tokens, positions,
            tables, self.pcfg, key, k, lora=self.trainable["lora"],
            # XLA gather attention by default: at serving batch the Pallas
            # page kernel's (b × pages) grid — one 16 KB page DMA + a tiny
            # dot per step — is per-step-overhead-bound (TPU-measured round
            # 3 @ slots=128/3B: decode 6.56 s vs 2.87 s, 51.8 vs 77.1
            # clips/s e2e). PAGED_ATTN=pallas re-enables the kernel
            # (int8 pools stream half the page bytes).
            use_pallas=(self._pool_sharding is None
                        and os.environ.get("PAGED_ATTN", "xla") == "pallas"),
            do_sample=self.do_sample, top_p=self.top_p,
            temperature=self.temperature,
        )
        toks = np.asarray(toks)  # [b, k] — ONE device→host sync per burst
        t_dec1 = time.perf_counter()
        self.stats["t_decode"] += t_dec1 - t_dec0
        self.stats["decode_steps"] += k
        self.stats["decode_bursts"] += 1
        self.stats["decode_slot_tokens"] += len(live) * k
        for row, (i, s) in enumerate(live):
            for j in range(k):
                token = int(toks[row, j])
                s["tokens"].append(token)
                s["pos"] += 1
                s["remaining"] -= 1
                if (token == self.tokenizer.eos_token_id or s["remaining"] <= 0
                        or s["pos"] >= self.pcfg.max_seq_len - 1):
                    self._finish(i, s)
                    break
        return True

    def run_until_drained(self, max_steps: int = 10_000):
        for _ in range(max_steps):
            if not self.step():
                break
        live = sum(s is not None for s in self.slots)
        if self.pending or live:
            import logging

            logging.getLogger(__name__).warning(
                "run_until_drained exhausted max_steps=%d with %d pending "
                "and %d live slots — results are incomplete",
                max_steps, len(self.pending), live,
            )
        return self.results


@partial(
    jax.jit, static_argnames=("llm_cfg", "pcfg"), donate_argnames=("pools",)
)
def prefill_batch_into_pages(
    frozen_llm: dict,
    llm_cfg: qwen2.QwenConfig,
    pools: list,
    embeds: jnp.ndarray,  # [b, t_pad, d] end-padded rows
    lengths: jnp.ndarray,  # [b] true prompt lengths
    block_tables: np.ndarray,  # [b, max_blocks] int32 (host)
    pcfg: PagedConfig,
    lora: Optional[dict] = None,
) -> Tuple[jnp.ndarray, list]:
    """Prefill a whole admission batch in one compiled forward and scatter
    every row's K/V into its pages. Rows are left-packed so each prompt
    ends at the final column (shared last_token_only lm_head); caches are
    unshifted per row before the page scatter. Padding columns land in the
    masked tail of the last real block or the reserved null page 0.
    Returns (last-token logits [b, vocab], updated pools)."""
    b, t_pad, _ = embeds.shape
    lengths = jnp.asarray(lengths, jnp.int32)
    pad = t_pad - lengths  # [b]
    embeds = jax.vmap(lambda row, s: jnp.roll(row, s, axis=0))(embeds, pad)
    key_valid = jnp.arange(t_pad)[None, :] >= pad[:, None]  # [b, t_pad]
    cache = qwen2.init_cache(llm_cfg, b, t_pad, dtype=pools[0]["k"].dtype)
    causal = jnp.tril(jnp.ones((t_pad, t_pad), dtype=bool))
    mask = causal[None] & key_valid[:, None, :]
    positions = jnp.maximum(jnp.arange(t_pad)[None, :] - pad[:, None], 0)
    logits, cache = qwen2.forward(
        frozen_llm, llm_cfg, embeds, mask, lora=lora,
        positions=positions, cache=cache, cache_index=jnp.int32(0),
        last_token_only=True,
    )
    n_blocks = -(-t_pad // pcfg.block_size)
    scatter_t = n_blocks * pcfg.block_size
    ids = jnp.asarray(block_tables[:, :n_blocks].reshape(-1))

    def unshift_pages(buf):  # [b, kv, t_pad, d] → [b·n_blocks, block, kv, d]
        buf = buf.transpose(0, 2, 1, 3)  # page pools keep time-major layout
        buf = jax.vmap(lambda row, s: jnp.roll(row, -s, axis=0))(buf, pad)
        buf = jnp.pad(buf, ((0, 0), (0, scatter_t - t_pad), (0, 0), (0, 0)))
        return buf.reshape(b * n_blocks, pcfg.block_size, *buf.shape[2:])

    new_pools = []
    for i, layer_cache in enumerate(cache):
        # int8 pools: the dense prefill cache is already quantized (same
        # dtype), so the per-row scales scatter alongside the values. Dense
        # scale pools are [b, kv, t]; page scale pools are FLAT
        # [blocks, block·kv] (token-major), so flatten the unshifted
        # [N, block, kv] pages.
        layer_pool = {}
        for name in pools[i]:
            src = layer_cache[name]
            if src.ndim == 3:
                src = src[..., None]
            pages = unshift_pages(src)  # [N, block, kv, d-or-1]
            if pools[i][name].ndim == 2:  # flat scale pool
                pages = pages[..., 0].reshape(pages.shape[0], -1)
            layer_pool[name] = pools[i][name].at[ids].set(
                pages.astype(pools[i][name].dtype))
        new_pools.append(layer_pool)
    return logits[:, -1], new_pools


def prefill_into_pages(
    frozen_llm: dict,
    llm_cfg: qwen2.QwenConfig,
    pools: list,
    embeds: jnp.ndarray,  # [1, t_pad, d] one sequence (may be end-padded)
    block_table: np.ndarray,  # [max_blocks] int32 (host)
    pcfg: PagedConfig,
    lora: Optional[dict] = None,
    length: Optional[int] = None,
) -> Tuple[jnp.ndarray, list]:
    """Prefill one sequence and scatter its K/V into its pages. Returns
    (last-token logits [vocab], updated pools). Uses the dense forward for
    the prompt (compute-bound) and a page scatter at the end.

    `length` < t_pad means the tail of `embeds` is bucket padding (added so
    the compiled prefill is shared across prompt lengths): the row is
    left-packed internally so the real last token sits at the final column
    (last_token_only), then the cache is unshifted before page scatter.
    Padding columns that land inside the last real block are masked by
    seq_lens at attention time; columns beyond it scatter into the
    reserved null page 0, whose contents are never read unmasked."""
    t_pad = embeds.shape[1]
    length = t_pad if length is None else int(length)
    pad = t_pad - length
    if pad:
        embeds = jnp.roll(embeds, pad, axis=1)
    key_valid = jnp.arange(t_pad) >= pad  # [t_pad]
    cache = qwen2.init_cache(llm_cfg, 1, t_pad, dtype=pools[0]["k"].dtype)
    causal = jnp.tril(jnp.ones((t_pad, t_pad), dtype=bool))
    mask = (causal & key_valid[None, :])[None]
    positions = jnp.maximum(jnp.arange(t_pad) - pad, 0)[None]
    logits, cache = qwen2.forward(
        frozen_llm, llm_cfg, embeds, mask, lora=lora,
        positions=positions, cache=cache, cache_index=jnp.int32(0),
        last_token_only=True,
    )
    n_blocks = -(-t_pad // pcfg.block_size)
    scatter_t = n_blocks * pcfg.block_size
    ids = jnp.asarray(block_table[:n_blocks])
    def unshift(buf):
        # unshift: token 0 back to column 0, then split into pages
        # (dense cache is [1, kv, T, d]; pools keep time-major [.., block, kv, d])
        x = jnp.roll(buf[0].transpose(1, 0, 2), -pad, axis=0)
        x = jnp.pad(x, ((0, scatter_t - t_pad), (0, 0), (0, 0)))
        return x.reshape(n_blocks, pcfg.block_size, *x.shape[1:])

    new_pools = []
    for i, layer_cache in enumerate(cache):
        layer_pool = {}
        for name in pools[i]:
            src = layer_cache[name]
            if src.ndim == 3:  # dense scale pools are [b, kv, t]
                src = src[..., None]
            pages = unshift(src)  # [n_blocks, block, kv, d-or-1]
            if pools[i][name].ndim == 2:  # flat scale pool [blocks, block·kv]
                pages = pages[..., 0].reshape(pages.shape[0], -1)
            layer_pool[name] = pools[i][name].at[ids].set(
                pages.astype(pools[i][name].dtype))
        new_pools.append(layer_pool)
    return logits[0, -1], new_pools
