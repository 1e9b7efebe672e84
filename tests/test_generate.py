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
