"""Image preprocessing and frame-sampling tests."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from affectgpt_tpu import constants
from affectgpt_tpu.ops import image as image_ops
from affectgpt_tpu.ops import sampling


class TestSampling:
    def test_uniform_matches_reference_math(self):
        # reference: indices = arange(0, vlen, vlen/n).astype(int)
        for vlen, n in [(100, 8), (8, 8), (3, 8), (250, 8), (7, 8)]:
            got = sampling.uniform_indices(vlen, n)
            n_use = min(n, vlen)
            exp = np.arange(0, vlen, vlen / n_use).astype(int).tolist()
            while len(exp) < n:
                exp.append(exp[-1])
            assert got == exp, (vlen, n)
            assert len(got) == n

    def test_headtail_split(self):
        rng = random.Random(0)
        idx = sampling.headtail_indices(100, 8, rng)
        assert len(idx) == 8
        assert all(i < 50 for i in idx[:4])
        assert all(i >= 50 for i in idx[4:])
        assert idx[:4] == sorted(idx[:4]) and idx[4:] == sorted(idx[4:])

    def test_emotion_peak_fallback_linspace(self):
        idx = sampling.emotion_peak_indices(None, 80, 8)
        assert idx == sorted(np.linspace(0, 79, 8).astype(int).tolist())

    def test_emotion_peak_centered(self):
        au_info = {
            "peak_frames": [
                {"peak_index": 40, "frames_before_peak": 40, "frames_after_peak": 39}
            ],
            "total_frames": 80,
        }
        idx = sampling.emotion_peak_indices(au_info, 80, 8)
        assert len(idx) == 8 and len(set(idx)) == 8
        for want in (38, 39, 40, 41, 42):
            assert want in idx

    def test_emotion_peak_tiny_video_repeats(self):
        au_info = {
            "peak_frames": [
                {"peak_index": 1, "frames_before_peak": 1, "frames_after_peak": 1}
            ],
            "total_frames": 3,
        }
        idx = sampling.emotion_peak_indices(au_info, 3, 8)
        assert len(idx) == 8
        assert set(idx) == {0, 1, 2}

    def test_clip_timepoints(self):
        pts = sampling.clip_timepoints(10.0)
        assert len(pts) == 8
        assert pts[0][0] == 0.0
        assert abs(pts[-1][1] - 10.0) < 1e-6
        # short audio: all clips start at 0
        pts2 = sampling.clip_timepoints(1.5)
        assert all(s == 0.0 for s, _ in pts2)


class TestImageOps:
    def test_normalize_clip(self):
        x = np.full((2, 4, 4, 3), 255, dtype=np.uint8)
        out = np.asarray(image_ops.normalize_clip(x))
        exp = (1.0 - np.asarray(constants.CLIP_IMAGE_MEAN)) / np.asarray(constants.CLIP_IMAGE_STD)
        np.testing.assert_allclose(out[0, 0, 0], exp, rtol=1e-5)

    def test_normalize_frames_schemes(self):
        # per-encoder processor stats (the reference runs each tower's own
        # HF AutoImageProcessor): clip == normalize_clip, imagenet/siglip
        # use their constants; unknown scheme fails loudly
        import pytest

        x = np.random.RandomState(0).randint(0, 256, (2, 4, 4, 3)).astype(np.uint8)
        np.testing.assert_array_equal(
            np.asarray(image_ops.normalize_frames(x, "clip")),
            np.asarray(image_ops.normalize_clip(x)),
        )
        for scheme, mean, std in [
            ("imagenet", constants.IMAGENET_IMAGE_MEAN, constants.IMAGENET_IMAGE_STD),
            ("siglip", constants.SIGLIP_IMAGE_MEAN, constants.SIGLIP_IMAGE_STD),
        ]:
            out = np.asarray(image_ops.normalize_frames(x, scheme))
            exp = (x / 255.0 - np.asarray(mean)) / np.asarray(std)
            np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)
        with pytest.raises(KeyError):
            image_ops.normalize_frames(x, "nope")

    def test_encoder_specs_carry_processor_scheme(self):
        from affectgpt_tpu.models import encoders as zoo

        assert zoo.get_visual_encoder("CLIP_VIT_LARGE").normalize == "clip"
        assert zoo.get_visual_encoder("DINO2_LARGE").normalize == "imagenet"
        assert zoo.get_visual_encoder("SigLIP_SO").normalize == "siglip"
        assert zoo.get_visual_encoder("EVA_CLIP_G").normalize == "clip"

    def test_preprocess_eval_batched_equals_per_image(self):
        # the chat realtime path preprocesses the whole [b·t] batch in one
        # call — must equal the per-image formulation exactly
        x = np.random.RandomState(1).randint(0, 256, (5, 32, 40, 3)).astype(np.uint8)
        batched = np.asarray(image_ops.preprocess_frames_eval(x, out_size=16))
        for i in range(x.shape[0]):
            single = np.asarray(
                image_ops.preprocess_frames_eval(x[i : i + 1], out_size=16)
            )
            np.testing.assert_allclose(batched[:, i], single[:, 0], rtol=1e-6)

    def test_resize_shape_and_constant(self):
        x = np.full((3, 50, 60, 3), 7.0, dtype=np.float32)
        out = np.asarray(image_ops.resize(x, (224, 224)))
        assert out.shape == (3, 224, 224, 3)
        np.testing.assert_allclose(out, 7.0, rtol=1e-4)

    def test_center_crop(self):
        x = np.arange(10 * 10).reshape(1, 10, 10, 1).astype(np.float32)
        out = np.asarray(image_ops.center_crop(x, 4))
        assert out.shape == (1, 4, 4, 1)
        assert out[0, 0, 0, 0] == x[0, 3, 3, 0]

    def test_preprocess_eval(self):
        frames = np.random.RandomState(0).randint(0, 255, (8, 120, 160, 3), dtype=np.uint8)
        out = np.asarray(image_ops.preprocess_frames_eval(frames))
        assert out.shape == (3, 8, 224, 224)

    def test_preprocess_train_static_shape_and_determinism(self):
        frames = np.random.RandomState(1).randint(0, 255, (8, 120, 160, 3), dtype=np.uint8)
        rng = jax.random.PRNGKey(0)
        out1 = np.asarray(image_ops.preprocess_frames_train(rng, frames))
        out2 = np.asarray(image_ops.preprocess_frames_train(rng, frames))
        assert out1.shape == (3, 8, 224, 224)
        np.testing.assert_array_equal(out1, out2)  # seeded → reproducible
        out3 = np.asarray(image_ops.preprocess_frames_train(jax.random.PRNGKey(7), frames))
        assert not np.array_equal(out1, out3)  # different seed → different crop


class TestRandAugment:
    def test_static_shape_and_range(self):
        from affectgpt_tpu.ops.augment import rand_augment

        frames = np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3)).astype(np.float32)
        out = np.asarray(rand_augment(jax.random.PRNGKey(0), frames))
        assert out.shape == frames.shape
        assert out.min() >= 0.0 and out.max() <= 255.0
        # seeded determinism + seed sensitivity
        out2 = np.asarray(rand_augment(jax.random.PRNGKey(0), frames))
        np.testing.assert_array_equal(out, out2)
        out3 = np.asarray(rand_augment(jax.random.PRNGKey(5), frames))
        assert not np.array_equal(out, out3)

    def test_temporal_consistency(self):
        from affectgpt_tpu.ops.augment import rand_augment

        # identical frames stay identical after augmentation (same op per clip)
        one = np.random.RandomState(1).randint(0, 255, (1, 16, 16, 3)).astype(np.float32)
        frames = np.repeat(one, 4, axis=0)
        out = np.asarray(rand_augment(jax.random.PRNGKey(3), frames))
        for t in range(1, 4):
            np.testing.assert_allclose(out[0], out[t], atol=1e-4)


class TestYuv420ToRgb:
    """yuv420_to_rgb — the ingest pipeline's 1.5 B/px wire format
    (halves host→device transfer vs RGB; see ops/image.py)."""

    def test_roundtrip_vs_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.RandomState(0)
        # smooth content: chroma-filter differences at hard edges are the
        # known nearest-vs-bilinear gap, not a conversion bug
        base = rng.randint(30, 220, (2, 1, 16, 16, 3)).astype(np.uint8)
        rgb = np.repeat(np.repeat(base, 4, axis=2), 4, axis=3)  # [2,1,64,64,3]
        planar = np.stack([
            cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420)
            for f in rgb.reshape(-1, 64, 64, 3)
        ]).reshape(2, 1, 96, 64)
        out = np.asarray(image_ops.yuv420_to_rgb(jnp.asarray(planar)))
        assert out.shape == rgb.shape and out.dtype == np.uint8
        back = np.stack([
            cv2.cvtColor(p, cv2.COLOR_YUV2RGB_I420)
            for p in planar.reshape(-1, 96, 64)
        ]).reshape(rgb.shape)
        np.testing.assert_allclose(
            out.astype(np.int16), back.astype(np.int16), atol=3
        )

    def test_luma_gradient_grays(self):
        # U=V=128 → all three channels equal (grays), studio-swing scaled
        y = np.tile(np.arange(16, 240, 16, dtype=np.uint8)[:, None], (1, 8))
        y = np.repeat(y[None], 2, axis=0)[:, :14]  # [2, 14, 8]
        h, w = 14, 8
        planar = np.concatenate(
            [y, np.full((2, h // 2, w), 128, np.uint8)], axis=1
        )
        out = np.asarray(image_ops.yuv420_to_rgb(jnp.asarray(planar)))
        np.testing.assert_array_equal(out[..., 0], out[..., 1])
        np.testing.assert_array_equal(out[..., 1], out[..., 2])
        expected = np.clip(np.round(1.164384 * (y.astype(np.float64) - 16)), 0, 255)
        np.testing.assert_allclose(out[..., 0].astype(np.int16), expected, atol=1)
