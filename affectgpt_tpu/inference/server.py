"""Continuous-batching serving engine.

Production-serving capability beyond the reference (which generates
strictly batch-1 through HF generate, conversation_video.py:303-388):
a slot-based scheduler keeps a fixed-capacity KV cache resident in HBM,
admits new requests into free slots as others finish, and advances ALL
active slots one token per compiled decode step. The decode step
compiles ONCE (fixed [max_slots] shapes); prefill + cache splice
compile per power-of-two (admission size, prompt bucket) pair — the
program count stays O(log slots × log prompts) as traffic changes
shape, never per distinct batch.

Design:
- Global cache [layers][max_slots, max_len, kv_heads, head_dim].
- Per-slot state (host): position, remaining budget, done, output tokens.
- Admission: prefill a padded batch of new prompts with the shared-column
  fast path, then splice each row's cache into its slot.
- Decode: per-row cache positions (qwen2 per-row dynamic update),
  key-mask per slot, inactive slots masked out and fed pad tokens.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.inference import generate as gen
from affectgpt_tpu.models import affectgpt, qwen2


@dataclass
class Request:
    request_id: int
    input_ids: np.ndarray  # [t] int32, patch ids zeroed
    features: Dict[str, np.ndarray]  # {m: [tm, dm]}
    offsets: Dict[str, int]
    max_new_tokens: int = 64


class RequestClock:
    """Per-request SLA clock shared by both serving engines: wall-clock
    submit → first token (TTFT, set when the admission prefill's sampled
    token lands on host) → finish. `summary()` gives the request-level
    latency distribution a production deployment alarms on — the piece
    the engine-level phase timers (t_prefill/t_decode) can't see because
    queueing delay accrues while OTHER requests hold the slots."""

    def __init__(self):
        self._t: Dict[int, Dict[str, float]] = {}
        self._done: List[Dict[str, float]] = []

    def submitted(self, request_id: int) -> None:
        self._t[request_id] = {"submit": time.perf_counter()}

    def first_token(self, request_id: int) -> None:
        rec = self._t.get(request_id)
        if rec is not None and "first" not in rec:
            rec["first"] = time.perf_counter()

    def preempted(self, request_id: int) -> None:
        """Recompute preemption discards a slot's generated tokens, so the
        stamped first token was never delivered — clear it so TTFT reflects
        the first token of the SURVIVING generation after re-prefill."""
        rec = self._t.get(request_id)
        if rec is not None:
            rec.pop("first", None)

    def finished(self, request_id: int, n_tokens: int) -> None:
        rec = self._t.pop(request_id, None)
        if rec is None:
            return
        now = time.perf_counter()
        self._done.append({
            "ttft": rec.get("first", now) - rec["submit"],
            "e2e": now - rec["submit"],
            "tokens": float(n_tokens),
            "submit_abs": rec["submit"], "finish_abs": now,
        })

    def summary(self) -> Dict[str, float]:
        if not self._done:
            return {"requests": 0}
        ttft = np.array([d["ttft"] for d in self._done])
        e2e = np.array([d["e2e"] for d in self._done])
        toks = np.array([d["tokens"] for d in self._done])
        pct = lambda a, q: float(np.percentile(a, q))
        return {
            "requests": len(self._done),
            "ttft_p50_ms": round(pct(ttft, 50) * 1e3, 1),
            "ttft_p95_ms": round(pct(ttft, 95) * 1e3, 1),
            "ttft_max_ms": round(float(ttft.max()) * 1e3, 1),
            "e2e_p50_ms": round(pct(e2e, 50) * 1e3, 1),
            "e2e_p95_ms": round(pct(e2e, 95) * 1e3, 1),
            "e2e_max_ms": round(float(e2e.max()) * 1e3, 1),
            "mean_tokens": round(float(toks.mean()), 1),
            # generated tokens over the submit→finish window of the whole
            # trace (engine throughput as a client would measure it)
            "gen_tokens_per_s": round(float(toks.sum() / max(
                max(d["finish_abs"] for d in self._done)
                - min(d["submit_abs"] for d in self._done), 1e-9)), 1),
        }


@dataclass
class SlotState:
    request_id: int = -1
    position: int = 0  # next cache column to write
    remaining: int = 0
    done: bool = True
    tokens: List[int] = field(default_factory=list)


@partial(jax.jit, static_argnames=("cfg", "max_len"))
def _prefill(frozen, trainable, cfg, input_ids, features, offsets, lengths, max_len):
    embeds = affectgpt.build_inputs_embeds(frozen, trainable, cfg, input_ids, features, offsets)
    b, t_pad, _ = embeds.shape
    embeds = jax.vmap(lambda row, s: jnp.roll(row, s, axis=0))(embeds, t_pad - lengths)
    pad_len = t_pad - lengths
    key_valid = jnp.arange(t_pad)[None, :] >= pad_len[:, None]
    positions = jnp.maximum(jnp.arange(t_pad)[None, :] - pad_len[:, None], 0)
    cache = qwen2.init_cache(cfg.llm, b, max_len, dtype=embeds.dtype)
    causal = jnp.arange(max_len)[None, None, :] <= jnp.arange(t_pad)[None, :, None]
    key_valid_full = jnp.pad(key_valid, ((0, 0), (0, max_len - t_pad)))
    mask = causal & key_valid_full[:, None, :]
    logits, cache = qwen2.forward(
        frozen["llm"], cfg.llm, embeds, mask, lora=trainable["lora"],
        positions=positions, cache=cache, cache_index=jnp.int32(0),
        last_token_only=True,
    )
    # left-packed rows end at the last column: shift each row's cache left so
    # token 0 sits at column 0 (slot-local canonical layout).
    # per-row cache is [kv, T, d] — time on axis 1.
    def unshift(buf, s):
        return jnp.roll(buf, -s, axis=1)

    cache = [
        {"k": jax.vmap(unshift)(layer["k"], pad_len), "v": jax.vmap(unshift)(layer["v"], pad_len)}
        for layer in cache
    ]
    return logits[:, -1, :], cache


@partial(jax.jit, donate_argnames=("cache",))
def _splice_cache(cache, new_cache, slot_ids):
    """Write each new row's cache into its slot of the global cache."""
    return [
        {
            "k": layer["k"].at[slot_ids].set(new_layer["k"].astype(layer["k"].dtype)),
            "v": layer["v"].at[slot_ids].set(new_layer["v"].astype(layer["v"].dtype)),
        }
        for layer, new_layer in zip(cache, new_cache)
    ]


@partial(jax.jit, static_argnames=("cfg", "do_sample"), donate_argnames=("cache",))
def _decode_step(frozen, trainable, cfg, cache, tokens, positions, active, rng, do_sample, top_p, temperature):
    """One token for every slot. tokens [S], positions [S] (next cache
    column per slot), active [S] bool. do_sample is STATIC: a traced
    jnp.where would bake the full [S, vocab] top-p sort+scatter into the
    greedy program too, paying it every decode step for discarded work."""
    max_len = cache[0]["k"].shape[2]  # cache layout [slots, kv, T, d]
    embeds = qwen2.embed_tokens(frozen["llm"], tokens)[:, None, :].astype(cache[0]["k"].dtype)
    key_mask = (jnp.arange(max_len)[None, None, :] <= positions[:, None, None]) & active[:, None, None]
    logits, cache = qwen2.forward(
        frozen["llm"], cfg.llm, embeds, key_mask, lora=trainable["lora"],
        positions=positions[:, None], cache=cache, cache_index=positions,
    )
    logits = logits[:, 0, :]
    if do_sample:
        sampled = gen.top_p_sample(rng, logits, top_p, temperature).astype(jnp.int32)
    else:
        sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return sampled, cache


class BatchServer:
    """Synchronous continuous-batching server over the compiled decode."""

    def __init__(self, frozen, trainable, cfg: affectgpt.AffectGPTConfig, tokenizer,
                 max_slots: int = 8, max_len: int = 512,
                 do_sample: bool = False, top_p: float = 0.9, temperature: float = 1.0,
                 seed: int = 0, prefill_bucket: int = 64, mesh=None):
        if mesh is not None:
            # tp>1 single-program serving: weights sharded by the training
            # mesh rules (col/row-parallel), KV cache sharded over kv heads;
            # GSPMD propagates through the three compiled programs and
            # inserts the collectives over ICI. Same request/result contract.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from affectgpt_tpu.parallel import mesh as mesh_lib

            frozen = mesh_lib.shard_params(mesh, frozen)
            trainable = mesh_lib.shard_params(mesh, trainable)
            tp = mesh.shape.get("tp", 1)
            kv_axis = "tp" if cfg.llm.num_kv_heads % max(tp, 1) == 0 else None
            self._cache_sharding = NamedSharding(mesh, P(None, kv_axis, None, None))
            from affectgpt_tpu.models import qwen2 as _q

            _q.mark_tp_serving()  # Pallas decode kernels have no GSPMD rule
        else:
            self._cache_sharding = None
        self.frozen, self.trainable, self.cfg = frozen, trainable, cfg
        self.tokenizer = tokenizer
        self.max_slots, self.max_len = max_slots, max_len
        # prompts are padded up to a bucket multiple so the compiled prefill
        # is reused across admissions (otherwise every distinct prompt
        # length triggers a fresh XLA compile)
        self.prefill_bucket = prefill_bucket
        self.do_sample, self.top_p, self.temperature = do_sample, top_p, temperature
        self.rng = jax.random.PRNGKey(seed)
        dtype = jnp.result_type(jax.tree.leaves(frozen["llm"])[0].dtype)
        self.cache = qwen2.init_cache(cfg.llm, max_slots, max_len, dtype=dtype)
        if self._cache_sharding is not None:
            self.cache = jax.tree.map(
                lambda x: jax.device_put(x, self._cache_sharding), self.cache
            )
        self.slots = [SlotState() for _ in range(max_slots)]
        self.next_tokens = np.zeros(max_slots, np.int32)
        self.pending: List[Request] = []
        self.results: Dict[int, List[int]] = {}
        self._stops = {tokenizer.eos_token_id}
        self.clock = RequestClock()

    # -- API -----------------------------------------------------------------
    def submit(self, request: Request) -> None:
        # validate at the boundary: an over-long prompt admitted anyway
        # would (a) crash _admit AFTER the batch was dequeued (requests
        # lost) at > max_len, or (b) at exactly max_len leave no cache
        # column for the first decode write — the clamped update would
        # silently overwrite the last prompt token's K/V
        if len(request.input_ids) >= self.max_len:
            raise ValueError(
                f"prompt length {len(request.input_ids)} must be < max_len "
                f"{self.max_len} (one cache column is needed for decode)"
            )
        self.pending.append(request)
        self.clock.submitted(request.request_id)

    def run_until_drained(self, max_steps: int = 10_000) -> Dict[int, List[int]]:
        for _ in range(max_steps):
            if not self.step():
                break
        if self.pending or any(not s.done for s in self.slots):
            import logging

            logging.getLogger(__name__).warning(
                "run_until_drained exhausted max_steps=%d with %d pending "
                "and %d live slots — results are incomplete",
                max_steps, len(self.pending),
                sum(not s.done for s in self.slots),
            )
        return self.results

    # -- scheduling ------------------------------------------------------------
    def _free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self.slots) if s.done]

    def _admit(self) -> None:
        free = self._free_slots()
        if not free or not self.pending:
            return
        # admit the longest prefix of pending that shares one modality
        # SIGNATURE (names AND shapes): the admission prefills as one
        # batched forward, so a mixed batch would KeyError on np.stack
        # after the requests were already dequeued (engine dead, requests
        # lost) — same discipline as the paged engine's _admit
        signature = tuple(
            sorted((m, tuple(v.shape)) for m, v in self.pending[0].features.items())
        )
        batch = []
        for req in self.pending:
            if len(batch) >= len(free):
                break
            if tuple(sorted((m, tuple(v.shape)) for m, v in req.features.items())) != signature:
                break
            batch.append(req)
        del self.pending[: len(batch)]
        slots = free[: len(batch)]

        # batch-size bucket (next power of two): slots free one at a time
        # under continuous batching, so admissions happen at every size
        # 1..max_slots — unbucketed, each would compile a fresh prefill
        # (~minutes each at 3B scale over the relay). Dummy rows prefill
        # 1 pad token and scatter to slot id == max_slots, which JAX's
        # out-of-bounds scatter DROPS — no real slot is touched.
        n_real = len(batch)
        n_bucket = 1
        while n_bucket < n_real:
            n_bucket *= 2
        n_dummy = n_bucket - n_real
        t_max = max(len(r.input_ids) for r in batch)
        t_pad = min(-(-t_max // self.prefill_bucket) * self.prefill_bucket,
                    self.max_len)
        ids = np.zeros((n_bucket, t_pad), np.int32)
        lengths = np.ones(n_bucket, np.int32)  # dummy rows: 1 token
        offsets: Dict[str, np.ndarray] = {}
        features: Dict[str, np.ndarray] = {}
        for m, _ in signature:
            features[m] = np.stack(
                [r.features[m] for r in batch]
                + [np.zeros_like(batch[0].features[m])] * n_dummy
            )
            offsets[m] = np.array(
                [r.offsets.get(m, -1) for r in batch] + [-1] * n_dummy, np.int32
            )
        for i, req in enumerate(batch):
            ids[i, : len(req.input_ids)] = req.input_ids
            lengths[i] = len(req.input_ids)

        last_logits, new_cache = _prefill(
            self.frozen, self.trainable, self.cfg, jnp.asarray(ids),
            {m: jnp.asarray(v) for m, v in features.items()},
            {m: jnp.asarray(v) for m, v in offsets.items()},
            jnp.asarray(lengths), self.max_len,
        )
        slot_ids = np.full(n_bucket, self.max_slots, np.int32)  # dummies → dropped
        slot_ids[:n_real] = slots
        self.cache = _splice_cache(self.cache, new_cache, jnp.asarray(slot_ids))

        # first token per admitted request comes from the prefill logits
        self.rng, key = jax.random.split(self.rng)
        if self.do_sample:
            first = gen.top_p_sample(key, last_logits, self.top_p, self.temperature)
        else:
            first = jnp.argmax(last_logits, axis=-1)
        first = np.asarray(first, np.int32)
        for req in batch:
            self.clock.first_token(req.request_id)
        for i, (slot, req) in enumerate(zip(slots, batch)):
            state = self.slots[slot]
            state.request_id = req.request_id
            state.position = int(lengths[i])
            state.remaining = req.max_new_tokens - 1
            state.done = False
            state.tokens = [int(first[i])]
            self.next_tokens[slot] = first[i]
            if int(first[i]) in self._stops or state.remaining <= 0:
                self._finish(slot)

    def _finish(self, slot: int) -> None:
        state = self.slots[slot]
        tokens = state.tokens
        if tokens and tokens[-1] in self._stops:
            tokens = tokens[:-1]
        self.results[state.request_id] = tokens
        self.clock.finished(state.request_id, len(tokens))
        state.done = True

    def step(self) -> bool:
        """Admit + advance one decode step. Returns False when idle."""
        self._admit()
        active = np.array([not s.done for s in self.slots])
        if not active.any():
            return bool(self.pending)

        self.rng, key = jax.random.split(self.rng)
        positions = np.array([s.position for s in self.slots], np.int32)
        sampled, self.cache = _decode_step(
            self.frozen, self.trainable, self.cfg, self.cache,
            jnp.asarray(self.next_tokens), jnp.asarray(positions),
            jnp.asarray(active), key,
            self.do_sample, self.top_p, self.temperature,
        )
        sampled = np.asarray(sampled)
        for i, state in enumerate(self.slots):
            if state.done:
                continue
            token = int(sampled[i])
            state.tokens.append(token)
            state.position += 1
            state.remaining -= 1
            self.next_tokens[i] = token
            if token in self._stops or state.remaining <= 0 or state.position >= self.max_len - 1:
                self._finish(i)
        return True
