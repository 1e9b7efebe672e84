"""VideoMAE pretraining tests: masking geometry, loss optimization,
representation extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from affectgpt_tpu.toolkit import videomae

CFG = videomae.VideoMAEConfig.tiny()


def test_tube_patchify_roundtrip_shape():
    video = jnp.asarray(np.random.RandomState(0).rand(2, 4, 32, 32, 3), jnp.float32)
    patches = videomae.tube_patchify(video, CFG)
    assert patches.shape == (2, CFG.num_patches, CFG.patch_dim)
    # energy preserved by the reshape/transpose
    np.testing.assert_allclose(
        float(jnp.sum(patches**2)), float(jnp.sum(video.astype(jnp.float32) ** 2)), rtol=1e-5
    )


def test_pretrain_loss_decreases():
    params = videomae.init_params(jax.random.PRNGKey(0), CFG)
    video = jnp.asarray(np.random.RandomState(1).rand(2, 4, 32, 32, 3), jnp.float32)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(
            lambda p: videomae.pretrain_loss(p, CFG, video, rng)
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(2)
    losses = []
    for i in range(15):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, i % 3))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_encode_video_shape():
    params = videomae.init_params(jax.random.PRNGKey(0), CFG)
    video = jnp.asarray(np.random.RandomState(3).rand(3, 4, 32, 32, 3), jnp.float32)
    out = videomae.encode_video(params, CFG, video)
    assert out.shape == (3, CFG.width)
    assert np.isfinite(np.asarray(out)).all()
