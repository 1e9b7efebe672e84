"""End-to-end raw-media model: forward contract and trainable encoders."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from affectgpt_tpu.toolkit import e2e


def make_batch(cfg, b=2):
    rng = np.random.RandomState(0)
    return {
        "frames": jnp.asarray(
            rng.randn(b, 2, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.float32
        ),
        "audios": jnp.asarray(rng.randn(b, 2, 1, 800), jnp.float32),
        "texts": jnp.asarray(rng.randn(b, cfg.text_dim), jnp.float32),
    }


def test_forward_and_train_step():
    cfg = e2e.E2EConfig(text_dim=12, hidden_dim=16, output_dim1=4)
    params = e2e.init_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg)
    feats, emos, vals, inter = e2e.apply(params, cfg, batch)
    assert emos.shape == (2, 4) and vals.shape == (2, 1)

    labels = jnp.asarray([0, 3])
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            _, e, _, _ = e2e.apply(p, cfg, batch)
            return optax.softmax_cross_entropy_with_integer_labels(e, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, grads

    before = np.asarray(params["visual"]["patch_embed"]["w"])
    losses = []
    for _ in range(5):
        params, opt_state, loss, grads = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # encoder weights actually received gradient (end-to-end, not frozen)
    after = np.asarray(params["visual"]["patch_embed"]["w"])
    assert not np.array_equal(before, after)
