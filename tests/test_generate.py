"""Generation engine tests: greedy batched decode vs per-sample reference."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.inference import generate as gen
from affectgpt_tpu.models import qwen2

CFG = qwen2.QwenConfig.tiny()
PARAMS = qwen2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def greedy_reference(embeds, n_steps, eos_id):
    """Naive greedy decode with full re-forward each step (no cache)."""
    tokens = []
    cur = embeds
    for _ in range(n_steps):
        logits, _ = qwen2.forward(PARAMS, CFG, cur, jnp.ones((1, cur.shape[1])))
        tok = int(jnp.argmax(logits[0, -1]))
        tokens.append(tok)
        if tok == eos_id:
            break
        cur = jnp.concatenate([cur, qwen2.embed_tokens(PARAMS, jnp.array([[tok]]))], axis=1)
    return tokens


class TestGenerate:
    def test_greedy_matches_no_cache_reference(self):
        gcfg = gen.GenerateConfig(max_new_tokens=6, do_sample=False, eos_token_id=257)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 5), 0, CFG.vocab_size)
        embeds = qwen2.embed_tokens(PARAMS, ids)
        tokens, n_valid = gen.generate(
            PARAMS, CFG, gcfg, embeds, jnp.array([5]), jax.random.PRNGKey(2), max_len=16,
        )
        ref = greedy_reference(embeds, 6, 257)
        got = np.asarray(tokens[0])[: len(ref)]
        np.testing.assert_array_equal(got, np.asarray(ref))

    def test_batched_ragged_prompts_match_single(self):
        """Two prompts of different lengths decoded together must equal
        their individual decodes (validates left-packing + masks)."""
        gcfg = gen.GenerateConfig(max_new_tokens=5, do_sample=False, eos_token_id=257)
        ids_a = jax.random.randint(jax.random.PRNGKey(3), (1, 7), 0, 256)
        ids_b = jax.random.randint(jax.random.PRNGKey(4), (1, 4), 0, 256)

        emb_a = qwen2.embed_tokens(PARAMS, ids_a)
        emb_b = qwen2.embed_tokens(PARAMS, ids_b)
        # batch: right-pad b to 7 with zero-embeds
        emb_b_padded = jnp.pad(emb_b, ((0, 0), (0, 3), (0, 0)))
        batch_embeds = jnp.concatenate([emb_a, emb_b_padded], axis=0)
        lengths = jnp.array([7, 4])

        tok_batch, _ = gen.generate(
            PARAMS, CFG, gcfg, batch_embeds, lengths, jax.random.PRNGKey(5), max_len=16,
        )
        tok_a, _ = gen.generate(
            PARAMS, CFG, gcfg, emb_a, jnp.array([7]), jax.random.PRNGKey(5), max_len=16,
        )
        tok_b, _ = gen.generate(
            PARAMS, CFG, gcfg, emb_b, jnp.array([4]), jax.random.PRNGKey(5), max_len=16,
        )
        np.testing.assert_array_equal(np.asarray(tok_batch[0]), np.asarray(tok_a[0]))
        np.testing.assert_array_equal(np.asarray(tok_batch[1]), np.asarray(tok_b[0]))

    def test_stop_token_freezes_row(self):
        gcfg = gen.GenerateConfig(max_new_tokens=8, do_sample=False, eos_token_id=257)
        ids = jax.random.randint(jax.random.PRNGKey(6), (1, 3), 0, 256)
        embeds = qwen2.embed_tokens(PARAMS, ids)
        tokens, n_valid = gen.generate(
            PARAMS, CFG, gcfg, embeds, jnp.array([3]), jax.random.PRNGKey(7), max_len=16,
        )
        toks = np.asarray(tokens[0])
        nv = int(n_valid[0])
        if nv < 8:  # if a stop fired, everything after must be eos
            assert np.all(toks[nv:] == 257) or toks[nv] == 257

    def test_top_p_sampling_valid_tokens(self):
        gcfg = gen.GenerateConfig(max_new_tokens=4, do_sample=True, top_p=0.9, eos_token_id=257)
        ids = jax.random.randint(jax.random.PRNGKey(8), (2, 4), 0, 256)
        embeds = qwen2.embed_tokens(PARAMS, ids)
        tokens, _ = gen.generate(
            PARAMS, CFG, gcfg, embeds, jnp.array([4, 4]), jax.random.PRNGKey(9), max_len=12,
        )
        assert np.all(np.asarray(tokens) >= 0)
        assert np.all(np.asarray(tokens) < CFG.vocab_size)

    def test_top_p_restricts_support(self):
        # one dominant logit → top_p=0.5 must always pick it
        logits = jnp.full((1, 10), -10.0).at[0, 3].set(10.0)
        for seed in range(5):
            tok = gen.top_p_sample(jax.random.PRNGKey(seed), logits, 0.5, 1.0)
            assert int(tok[0]) == 3

    def test_trim_output_text(self):
        assert gen.trim_output_text("happy, sad###Human: more") == "happy, sad"
        assert gen.trim_output_text("Assistant: joy</s>") == "joy"
        # reference parity (conversation_video.py:381-388): rsplit at the
        # LAST '###', and 'Assistant:' handled via split()[-1].strip() so a
        # leading space doesn't defeat the remnant drop
        assert gen.trim_output_text(" Assistant: The person appears happy.###") \
            == "The person appears happy."
        assert gen.trim_output_text("a###b###Human:") == "a###b"
        ref = lambda r: r.rsplit("###", 1)[0].split("Assistant:")[-1].strip()  # noqa: E731
        for s in ["x###y", "Assistant: a### Assistant: b###", "no markers",
                  "###", "  padded  ", "a###"]:
            assert gen.trim_output_text(s) == ref(s), s


class TestTopPWarperParity:
    """Pin top_p_mask's kept-token SET against transformers'
    TopPLogitsWarper — the exact warper the reference samples through
    (conversation_video.py:303-388, do_sample=True top_p=0.9)."""

    @staticmethod
    def _hf_keep(logits: np.ndarray, top_p: float) -> np.ndarray:
        import torch
        from transformers.generation.logits_process import TopPLogitsWarper

        warper = TopPLogitsWarper(top_p=top_p)
        scores = torch.tensor(logits, dtype=torch.float32)
        out = warper(None, scores)
        return np.asarray(out > -1e9 * 0.9)  # filter_value is -inf

    def _assert_parity(self, logits: np.ndarray, top_p: float):
        mine = np.asarray(gen.top_p_mask(jnp.asarray(logits, jnp.float32), top_p))
        hf = self._hf_keep(logits, top_p)
        np.testing.assert_array_equal(mine, hf, err_msg=f"top_p={top_p}")

    def test_random_logits_many_top_p(self):
        rng = np.random.default_rng(0)
        for top_p in (0.1, 0.5, 0.9, 0.95, 0.999, 1.0):
            logits = rng.normal(size=(4, 64)).astype(np.float32) * 3.0
            self._assert_parity(logits, top_p)

    def test_one_hot_degenerate(self):
        logits = np.full((2, 16), -30.0, np.float32)
        logits[0, 3] = 30.0
        logits[1, 0] = 30.0
        for top_p in (0.01, 0.9):
            self._assert_parity(logits, top_p)

    def test_mass_exactly_top_p(self):
        """Cumulative mass hitting exactly 1-top_p at a boundary — the
        inclusive-threshold semantics (<=) must match HF."""
        # probs [0.5, 0.25, 0.125, 0.125] → ascending cum 0.125, 0.25, 0.5, 1.0
        probs = np.array([[0.5, 0.25, 0.125, 0.125]], np.float32)
        logits = np.log(probs)
        for top_p in (0.875, 0.75, 0.5, 0.874999, 0.875001):
            self._assert_parity(logits, top_p)

    def test_ties_at_threshold_keep_count(self):
        """Equal logits straddling the nucleus boundary: HF removes by
        sorted position, so only the kept COUNT (and the non-tied kept
        members) are well-defined — tie order inside torch.sort is
        unspecified. Assert count + superset/subset structure."""
        logits = np.log(np.array([[0.4, 0.15, 0.15, 0.15, 0.15]], np.float32))
        for top_p in (0.55, 0.7, 0.85):
            mine = np.asarray(gen.top_p_mask(jnp.asarray(logits, jnp.float32), top_p))
            hf = self._hf_keep(logits, top_p)
            assert mine.sum() == hf.sum(), top_p
            assert mine[0, 0] and hf[0, 0]  # the non-tied top token

    def test_uniform_logits(self):
        logits = np.zeros((1, 8), np.float32)
        mine = np.asarray(gen.top_p_mask(jnp.asarray(logits), 0.5))
        hf = self._hf_keep(logits, 0.5)
        assert mine.sum() == hf.sum() == 4

    def test_top_token_always_kept(self):
        rng = np.random.default_rng(7)
        logits = rng.normal(size=(3, 32)).astype(np.float32)
        mine = np.asarray(gen.top_p_mask(jnp.asarray(logits), 1e-9))
        assert (mine.sum(axis=-1) == 1).all()
        assert (mine[np.arange(3), logits.argmax(-1)]).all()


class TestInt8KVCache:
    """int8 quantized KV cache (qwen2.init_cache dtype=int8): decode parity
    vs the bf16/f32 cache and the quantizer contract."""

    def test_quantize_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5, 64))
        q, s = qwen2._quantize_kv(x)
        assert q.dtype == jnp.int8 and s.dtype == jnp.float32
        recon = q.astype(jnp.float32) * s
        err = np.abs(np.asarray(recon - x))
        amax = np.abs(np.asarray(x)).max(-1, keepdims=True)
        assert (err <= amax / 127.0 * 0.5 + 1e-7).all()  # half-ULP rounding

    def test_zero_rows(self):
        q, s = qwen2._quantize_kv(jnp.zeros((1, 1, 2, 8)))
        assert np.asarray(q).sum() == 0 and np.isfinite(np.asarray(s)).all()

    def test_greedy_tokens_match_fp_cache(self):
        gcfg = gen.GenerateConfig(max_new_tokens=6, do_sample=False, eos_token_id=257)
        ids = jax.random.randint(jax.random.PRNGKey(7), (2, 5), 0, CFG.vocab_size)
        embeds = qwen2.embed_tokens(PARAMS, ids)
        lengths = jnp.array([5, 3])
        ref, _ = gen.generate(
            PARAMS, CFG, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=16,
        )
        got, _ = gen.generate(
            PARAMS, CFG, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=16,
            cache_dtype=jnp.int8,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_decode_step_logits_close(self):
        """One prefill + one decode step: int8-cache logits within int8
        quantization error of the fp-cache logits."""
        b, t, max_len = 2, 4, 8
        embeds = jax.random.normal(
            jax.random.PRNGKey(1), (b, t, CFG.hidden_size), jnp.float32)
        mask = (jnp.arange(max_len)[None, None, :] <= jnp.arange(t)[None, :, None])
        mask = jnp.broadcast_to(mask, (b, t, max_len))
        outs = {}
        for dtype in (jnp.float32, jnp.int8):
            cache = qwen2.init_cache(CFG, b, max_len, dtype=dtype)
            logits, cache = qwen2.forward(
                PARAMS, CFG, embeds, mask, cache=cache, cache_index=jnp.int32(0))
            step_mask = (jnp.arange(max_len)[None, None, :] <= t)
            step_mask = jnp.broadcast_to(step_mask, (b, 1, max_len))
            step_emb = jax.random.normal(
                jax.random.PRNGKey(2), (b, 1, CFG.hidden_size), jnp.float32)
            logits_d, _ = qwen2.forward(
                PARAMS, CFG, step_emb, step_mask,
                positions=jnp.full((b, 1), t), cache=cache, cache_index=jnp.int32(t))
            outs[np.dtype(dtype).name] = np.asarray(logits_d[:, 0])
        ref, got = outs["float32"], outs["int8"]
        denom = np.abs(ref).max()
        assert np.abs(got - ref).max() / denom < 0.05, np.abs(got - ref).max()

    def test_per_row_write_index(self):
        """Per-row cache_index (continuous-batching path) works with the
        quantized cache."""
        b, max_len = 2, 8
        cache = qwen2.init_cache(CFG, b, max_len, dtype=jnp.int8)
        emb = jax.random.normal(jax.random.PRNGKey(3), (b, 1, CFG.hidden_size), jnp.float32)
        mask = jnp.ones((b, 1, max_len), bool)
        idx = jnp.array([2, 5], jnp.int32)
        logits, new_cache = qwen2.forward(
            PARAMS, CFG, emb, mask,
            positions=jnp.array([[2], [5]]), cache=cache, cache_index=idx)
        k = np.asarray(new_cache[0]["k"])
        assert np.abs(k[0, :, 2]).sum() > 0 and np.abs(k[1, :, 5]).sum() > 0
        assert np.abs(k[0, :, 5]).sum() == 0 and np.abs(k[1, :, 2]).sum() == 0
        assert np.isfinite(np.asarray(logits)).all()

    def test_int8_weights_plus_int8_cache_compose(self):
        """Mixed-precision serving stack: bf16 prefill + int8 decode weights
        (decode_llm=quantize_params) + int8 KV cache compose and match the
        fp greedy tokens on the tiny model."""
        q_params = qwen2.quantize_params(PARAMS)
        gcfg = gen.GenerateConfig(max_new_tokens=5, do_sample=False, eos_token_id=257)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, CFG.vocab_size)
        embeds = qwen2.embed_tokens(PARAMS, ids)
        lengths = jnp.array([5, 4])
        ref, _ = gen.generate(
            PARAMS, CFG, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=16)
        got, _ = gen.generate(
            PARAMS, CFG, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=16,
            decode_llm=q_params, cache_dtype=jnp.int8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_int4_weights_plus_int8_cache_compose(self):
        """W4 + int8 KV: true int4 leaves need int4-groupable dims, so this
        uses a 256-dim config (tiny's K=32 falls back to int8). Greedy tokens
        through the full generate() stack must stay finite and shaped; logits
        noise at int4 means token equality is not asserted on random weights
        (tiny-model converter parity covers numerics)."""
        cfg = qwen2.QwenConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
            rope_theta=10_000.0, lora_r=2, lora_alpha=4.0,
        )
        params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        q_params = qwen2.quantize_params(params, bits=4)
        assert "w_q4" in q_params["layers"][0]["q_proj"]
        gcfg = gen.GenerateConfig(max_new_tokens=5, do_sample=False, eos_token_id=511)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, cfg.vocab_size)
        embeds = qwen2.embed_tokens(params, ids)
        lengths = jnp.array([5, 4])
        # int4 weights for BOTH prefill and decode, int8 KV cache
        toks, nv = gen.generate(
            q_params, cfg, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=16,
            cache_dtype=jnp.int8)
        assert np.asarray(toks).shape == (2, 5)
        assert ((np.asarray(toks) >= 0) & (np.asarray(toks) < 512)).all()
        # and as a decode_llm on a fp prefill
        toks2, _ = gen.generate(
            params, cfg, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=16,
            decode_llm=q_params, cache_dtype=jnp.int8)
        assert np.asarray(toks2).shape == (2, 5)


class TestRepetitionPenalty:
    """HF RepetitionPenaltyLogitsProcessor parity — the processor behind
    the reference AU agent's generate(repetition_penalty=1.1)
    (my_affectgpt/models/au_agent.py:185-192)."""

    @staticmethod
    def _hf_penalize(logits: np.ndarray, ids: np.ndarray, penalty: float) -> np.ndarray:
        import torch
        from transformers.generation.logits_process import (
            RepetitionPenaltyLogitsProcessor,
        )

        proc = RepetitionPenaltyLogitsProcessor(penalty=penalty)
        return np.asarray(
            proc(torch.tensor(ids, dtype=torch.long),
                 torch.tensor(logits, dtype=torch.float32))
        )

    def test_processor_math_matches_hf(self):
        rng = np.random.RandomState(0)
        for penalty in (1.1, 1.5, 2.0):
            logits = rng.randn(3, 32).astype(np.float32) * 4.0
            ids = rng.randint(0, 32, (3, 9))
            seen = np.zeros((3, 32), bool)
            np.put_along_axis(seen, ids, True, axis=1)
            mine = np.asarray(
                gen.apply_repetition_penalty(
                    jnp.asarray(logits), jnp.asarray(seen), penalty
                )
            )
            np.testing.assert_allclose(
                mine, self._hf_penalize(logits, ids, penalty), rtol=1e-6
            )

    def test_penalty_one_is_bitwise_off(self):
        """repetition_penalty=1.0 (+ prompt_ids supplied) takes the inert
        path and must match the no-penalty call token-for-token."""
        ids = jax.random.randint(jax.random.PRNGKey(11), (2, 5), 0, 256)
        embeds = qwen2.embed_tokens(PARAMS, ids)
        lengths = jnp.array([5, 5])
        base = gen.GenerateConfig(
            max_new_tokens=6, do_sample=True, top_p=0.9, eos_token_id=257
        )
        on = gen.GenerateConfig(
            max_new_tokens=6, do_sample=True, top_p=0.9, eos_token_id=257,
            repetition_penalty=1.0,
        )
        t0, _ = gen.generate(
            PARAMS, CFG, base, embeds, lengths, jax.random.PRNGKey(12), max_len=16
        )
        t1, _ = gen.generate(
            PARAMS, CFG, on, embeds, lengths, jax.random.PRNGKey(12), max_len=16,
            prompt_ids=ids,
        )
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))

    def test_greedy_penalized_matches_hf_loop(self):
        """Greedy decode with penalty vs a per-step Python loop that runs
        our forward but penalizes through transformers' own processor on
        the running prompt+generated id sequence."""
        import torch
        from transformers.generation.logits_process import (
            RepetitionPenaltyLogitsProcessor,
        )

        penalty = 1.3
        n_steps = 6
        ids = jax.random.randint(jax.random.PRNGKey(13), (1, 6), 0, 256)
        embeds = qwen2.embed_tokens(PARAMS, ids)
        gcfg = gen.GenerateConfig(
            max_new_tokens=n_steps, do_sample=False, eos_token_id=257,
            repetition_penalty=penalty,
        )
        tokens, _ = gen.generate(
            PARAMS, CFG, gcfg, embeds, jnp.array([6]), jax.random.PRNGKey(14),
            max_len=16, prompt_ids=ids,
        )

        proc = RepetitionPenaltyLogitsProcessor(penalty=penalty)
        hist = list(np.asarray(ids)[0])
        cur = embeds
        ref = []
        for _ in range(n_steps):
            logits, _ = qwen2.forward(PARAMS, CFG, cur, jnp.ones((1, cur.shape[1])))
            scores = torch.tensor(np.asarray(logits[:, -1, :]), dtype=torch.float32)
            pen = proc(torch.tensor([hist], dtype=torch.long), scores)
            tok = int(torch.argmax(pen[0]))
            ref.append(tok)
            if tok == 257:
                break
            hist.append(tok)
            cur = jnp.concatenate(
                [cur, qwen2.embed_tokens(PARAMS, jnp.array([[tok]]))], axis=1
            )
        got = np.asarray(tokens[0])[: len(ref)]
        np.testing.assert_array_equal(got, np.asarray(ref))

    def test_penalized_ragged_batch_matches_single(self):
        """Ragged penalized prompts decoded together must equal their
        individual penalized decodes — validates that the seen-mask
        construction respects per-row lengths (padding must NOT be
        penalized) and that the mask carry survives left-packing."""
        gcfg = gen.GenerateConfig(
            max_new_tokens=5, do_sample=False, eos_token_id=257,
            repetition_penalty=1.4,
        )
        ids_a = jax.random.randint(jax.random.PRNGKey(17), (1, 7), 1, 256)
        ids_b = jax.random.randint(jax.random.PRNGKey(18), (1, 4), 1, 256)
        emb_a = qwen2.embed_tokens(PARAMS, ids_a)
        emb_b = qwen2.embed_tokens(PARAMS, ids_b)
        emb_b_pad = jnp.pad(emb_b, ((0, 0), (0, 3), (0, 0)))
        # pad row b's ids with token 0 — if padding leaked into the seen
        # mask, token 0 would be spuriously penalized for row b
        ids_b_pad = jnp.pad(ids_b, ((0, 0), (0, 3)))
        batch_embeds = jnp.concatenate([emb_a, emb_b_pad], axis=0)
        batch_ids = jnp.concatenate([ids_a, ids_b_pad], axis=0)
        lengths = jnp.array([7, 4])

        tok_batch, _ = gen.generate(
            PARAMS, CFG, gcfg, batch_embeds, lengths, jax.random.PRNGKey(19),
            max_len=16, prompt_ids=batch_ids,
        )
        tok_a, _ = gen.generate(
            PARAMS, CFG, gcfg, emb_a, jnp.array([7]), jax.random.PRNGKey(19),
            max_len=16, prompt_ids=ids_a,
        )
        tok_b, _ = gen.generate(
            PARAMS, CFG, gcfg, emb_b, jnp.array([4]), jax.random.PRNGKey(19),
            max_len=16, prompt_ids=ids_b,
        )
        np.testing.assert_array_equal(np.asarray(tok_batch[0]), np.asarray(tok_a[0]))
        np.testing.assert_array_equal(np.asarray(tok_batch[1]), np.asarray(tok_b[0]))
