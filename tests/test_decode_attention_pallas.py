"""Fused decode-attention kernel vs the XLA reference (interpret mode on
CPU; the real Mosaic compile is exercised on TPU by bench runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.ops.decode_attention_pallas import decode_attention_pallas


def _reference(q, k, v, mask):
    # q [b, kv, g, d]; k/v [b, kv, T, d]; mask [b, T]
    logits = jnp.einsum("bhgd,bhkd->bhgk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits / np.sqrt(q.shape[-1])
    logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhgk,bhkd->bhgd", p, v.astype(jnp.float32))


def test_matches_xla_reference():
    b, kv, g, t, d = 3, 2, 4, 24, 16
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, kv, g, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, kv, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, kv, t, d), jnp.float32)
    # ragged validity incl. one fully-masked prefix region
    lengths = jnp.array([24, 7, 13])
    mask = jnp.arange(t)[None, :] < lengths[:, None]

    out = decode_attention_pallas(q, k, v, mask, interpret=True)
    ref = _reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_left_packed_mask():
    """generate()'s mask shape: invalid prefix (left-pack pad) + valid tail."""
    b, kv, g, t, d = 2, 1, 8, 16, 8
    rng = jax.random.PRNGKey(3)
    q = jax.random.normal(rng, (b, kv, g, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, kv, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, kv, t, d), jnp.float32)
    pad = jnp.array([5, 0])
    upto = jnp.array([12, 9])
    cols = jnp.arange(t)[None, :]
    mask = (cols >= pad[:, None]) & (cols <= upto[:, None])

    out = decode_attention_pallas(q, k, v, mask, interpret=True)
    ref = _reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
