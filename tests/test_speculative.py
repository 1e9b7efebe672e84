"""Prompt-lookup speculative decoding: exact greedy parity with generate().

Greedy acceptance is mathematically exact — any divergence from plain
greedy decoding is a bug in the draft/verify/cache bookkeeping, so these
tests compare raw token arrays, not just decoded text.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affectgpt_tpu.inference import generate as gen
from affectgpt_tpu.models import qwen2

CFG = qwen2.QwenConfig.tiny()
PARAMS = qwen2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _run_pair(params, cfg, ids, lengths, max_new, draft_len, stop_ids=(), eos=257, max_len=64):
    gcfg = gen.GenerateConfig(
        max_new_tokens=max_new, do_sample=False, eos_token_id=eos,
        stop_token_ids=stop_ids,
    )
    embeds = qwen2.embed_tokens(params, ids)
    ref, ref_nv = gen.generate(
        params, cfg, gcfg, embeds, lengths, jax.random.PRNGKey(2), max_len=max_len,
    )
    got, got_nv = gen.generate_speculative(
        params, cfg, gcfg, embeds, lengths, ids, max_len=max_len, draft_len=draft_len,
    )
    return np.asarray(ref), np.asarray(ref_nv), np.asarray(got), np.asarray(got_nv)


class TestExactParity:
    @pytest.mark.parametrize("draft_len", [1, 3, 4])
    def test_random_weights_ragged_batch(self, draft_len):
        ids = jax.random.randint(jax.random.PRNGKey(1), (3, 9), 1, CFG.vocab_size)
        lengths = jnp.array([9, 5, 7])
        ref, ref_nv, got, got_nv = _run_pair(
            PARAMS, CFG, ids, lengths, max_new=8, draft_len=draft_len
        )
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got_nv, ref_nv)

    def test_stop_token_truncation(self):
        # pick the model's own greedy continuation token as a stop id so
        # truncation genuinely triggers mid-stream
        ids = jax.random.randint(jax.random.PRNGKey(3), (2, 6), 1, CFG.vocab_size)
        lengths = jnp.array([6, 4])
        gcfg = gen.GenerateConfig(max_new_tokens=6, do_sample=False, eos_token_id=257)
        embeds = qwen2.embed_tokens(PARAMS, ids)
        ref, _ = gen.generate(
            PARAMS, CFG, gcfg, embeds, lengths, jax.random.PRNGKey(0), max_len=32,
        )
        stop = int(np.asarray(ref)[0, 2])  # a token the model actually emits
        ref2, ref_nv, got, got_nv = _run_pair(
            PARAMS, CFG, ids, lengths, max_new=6, draft_len=3, stop_ids=(stop,), max_len=32
        )
        np.testing.assert_array_equal(got, ref2)
        np.testing.assert_array_equal(got_nv, ref_nv)

    def test_high_acceptance_cyclic_model(self):
        """A rigged lm_head (two antipodal hot columns — one of them wins
        argmax for ANY hidden state) makes the model emit from a 2-token
        alphabet; prompt-lookup drafts then accept heavily — the fast path
        must still be token-exact."""
        params = dict(PARAMS)
        w = np.zeros(params["lm_head"]["w"].shape, np.float32)
        v = np.random.RandomState(0).randn(w.shape[0])
        w[:, 42] = v
        w[:, 43] = -v
        params["lm_head"] = {"w": jnp.asarray(w)}
        ids = jax.random.randint(jax.random.PRNGKey(4), (2, 7), 1, CFG.vocab_size)
        lengths = jnp.array([7, 6])
        ref, ref_nv, got, got_nv = _run_pair(
            params, CFG, ids, lengths, max_new=12, draft_len=4, max_len=64
        )
        assert set(np.asarray(ref)[:, :12].ravel()) <= {42, 43}  # the rig worked
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got_nv, ref_nv)

    def test_periodic_stream_accepts_full_drafts(self):
        """On a 2-cycle token-map model (zeroed projections + 2-column head)
        the lookup must draft from a match with a fully-written continuation
        — acceptance ≈ draft_len, so 24 tokens take ≤ ~7 verify steps, not
        24 (regression: the nearest match drafted unwritten zeros)."""
        params = dict(PARAMS)
        zero = lambda lyr: {
            **lyr,
            **{
                n: {k: jnp.zeros_like(v) for k, v in lyr[n].items()}
                for n in ("q_proj", "k_proj", "v_proj", "o_proj",
                          "gate_proj", "up_proj", "down_proj")
            },
        }
        params["layers"] = [zero(l) for l in PARAMS["layers"]]
        w = np.zeros(PARAMS["lm_head"]["w"].shape, np.float32)
        v = np.random.RandomState(1).randn(w.shape[0])
        w[:, 42] = v
        w[:, 43] = -v
        params["lm_head"] = {"w": jnp.asarray(w)}
        ids = jax.random.randint(jax.random.PRNGKey(6), (2, 7), 1, CFG.vocab_size)
        lengths = jnp.array([7, 6])
        gcfg = gen.GenerateConfig(max_new_tokens=24, do_sample=False, eos_token_id=257)
        embeds = qwen2.embed_tokens(params, ids)
        toks, nv, iters = gen.generate_speculative(
            params, CFG, gcfg, embeds, lengths, ids, max_len=64, draft_len=4,
            return_stats=True,
        )
        assert set(np.asarray(toks).ravel()) <= {42, 43}
        assert int(iters) <= 9, int(iters)  # ~24/5 + warmup, not 24
        # and still exact vs plain greedy
        ref, _ = gen.generate(
            params, CFG, gcfg, embeds, lengths, jax.random.PRNGKey(0), max_len=64)
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))

    def test_int8_weights_compose(self):
        qparams = qwen2.quantize_params(PARAMS)
        ids = jax.random.randint(jax.random.PRNGKey(5), (2, 8), 1, CFG.vocab_size)
        lengths = jnp.array([8, 6])
        ref, ref_nv, got, got_nv = _run_pair(
            qparams, CFG, ids, lengths, max_new=6, draft_len=2
        )
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got_nv, ref_nv)
