"""Chat interface tests: batched prompt building + end-to-end answer."""

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu.inference.chat import Chat, encode_media_features
from affectgpt_tpu.models import affectgpt, clip_vit, hubert
from affectgpt_tpu.tokenization import ByteTokenizer

CFG = affectgpt.AffectGPTConfig.tiny()
FROZEN = affectgpt.init_frozen(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
TRAINABLE = affectgpt.init_trainable(jax.random.PRNGKey(1), CFG)


class TestChat:
    def make_chat(self):
        return Chat(FROZEN, TRAINABLE, CFG, ByteTokenizer(), max_len=1024)

    def test_build_prompt_batch(self):
        chat = self.make_chat()
        ids, lengths, offsets = chat.build_prompt_batch(
            "multiface_audio_face_text", ["hi", "a longer subtitle here"], "How?"
        )
        assert ids.shape[0] == 2
        assert lengths[1] > lengths[0]
        assert set(offsets) == {"face", "audio", "multi"}
        # patch ids zeroed
        tok = chat.tokenizer
        for name, tok_id in tok.patch_token_ids.items():
            assert not np.any(ids == tok_id)

    def test_answer_batch_preextracted(self):
        chat = self.make_chat()
        b = 2
        features = {
            "face": jnp.asarray(np.random.RandomState(0).randn(b, 8, CFG.visual_dim), jnp.float32),
            "audio": jnp.asarray(np.random.RandomState(1).randn(b, 8, CFG.acoustic_dim), jnp.float32),
        }
        outputs = chat.answer_batch(
            "multiface_audio_face_text", ["sub one", "sub two"], "Describe.",
            features, max_new_tokens=6, do_sample=False,
        )
        assert len(outputs) == 2
        assert all(isinstance(o, str) for o in outputs)

    def test_answer_batch_int8_kv_cache(self):
        """kv_cache_dtype='int8' (YAML inference.kv_cache_dtype) produces
        the same greedy answers as the fp cache on the tiny model."""
        features = {
            "face": jnp.asarray(np.random.RandomState(0).randn(2, 8, CFG.visual_dim), jnp.float32),
            "audio": jnp.asarray(np.random.RandomState(1).randn(2, 8, CFG.acoustic_dim), jnp.float32),
        }
        kwargs = dict(max_new_tokens=6, do_sample=False)
        ref = self.make_chat().answer_batch(
            "multiface_audio_face_text", ["sub one", "sub two"], "Describe.",
            features, **kwargs)
        chat8 = Chat(FROZEN, TRAINABLE, CFG, ByteTokenizer(), max_len=1024,
                     kv_cache_dtype="int8")
        got = chat8.answer_batch(
            "multiface_audio_face_text", ["sub one", "sub two"], "Describe.",
            features, **kwargs)
        assert got == ref


class TestSpeculativeChat:
    def test_speculative_matches_standard_greedy(self):
        """speculative_draft_len>0 + greedy through answer_batch must return
        byte-identical strings to the standard path (exact acceptance)."""
        features = {
            "face": jnp.asarray(np.random.RandomState(0).randn(2, 8, CFG.visual_dim), jnp.float32),
            "audio": jnp.asarray(np.random.RandomState(1).randn(2, 8, CFG.acoustic_dim), jnp.float32),
        }
        kwargs = dict(max_new_tokens=6, do_sample=False)
        ref = Chat(FROZEN, TRAINABLE, CFG, ByteTokenizer(), max_len=1024).answer_batch(
            "multiface_audio_face_text", ["sub one", "sub two"], "Describe.",
            features, **kwargs)
        spec = Chat(FROZEN, TRAINABLE, CFG, ByteTokenizer(), max_len=1024,
                    speculative_draft_len=3)
        got = spec.answer_batch(
            "multiface_audio_face_text", ["sub one", "sub two"], "Describe.",
            features, **kwargs)
        assert got == ref
        # sampled requests must silently use the standard path
        sampled = spec.answer_batch(
            "multiface_audio_face_text", ["sub one", "sub two"], "Describe.",
            features, max_new_tokens=6, do_sample=True,
        )
        assert len(sampled) == 2


class TestChatRngAndStops:
    def test_omitted_rng_differs_across_sampled_calls(self):
        # the instance sampling stream must ADVANCE when rng is omitted —
        # a fixed default key made every sampled call byte-identical
        features = {
            "face": jnp.asarray(np.random.RandomState(0).randn(2, 8, CFG.visual_dim), jnp.float32),
            "audio": jnp.asarray(np.random.RandomState(1).randn(2, 8, CFG.acoustic_dim), jnp.float32),
        }
        chat = Chat(FROZEN, TRAINABLE, CFG, ByteTokenizer(), max_len=1024)
        kwargs = dict(max_new_tokens=12, do_sample=True, temperature=5.0)
        a = chat.answer_batch("multiface_audio_face_text", ["s1", "s2"], "Describe.",
                              features, **kwargs)
        b = chat.answer_batch("multiface_audio_face_text", ["s1", "s2"], "Describe.",
                              features, **kwargs)
        assert a != b  # hot temperature → overwhelmingly different samples
        # same seed → the stream itself is reproducible across instances
        chat2 = Chat(FROZEN, TRAINABLE, CFG, ByteTokenizer(), max_len=1024)
        assert chat2.answer_batch("multiface_audio_face_text", ["s1", "s2"],
                                  "Describe.", features, **kwargs) == a

    def test_single_token_stop_wired_from_tokenizer(self):
        # ByteTokenizer encodes '###' as 3 byte tokens → no single-token stop
        chat = Chat(FROZEN, TRAINABLE, CFG, ByteTokenizer(), max_len=1024)
        assert chat._stop_ids == ()

        # a tokenizer that encodes '###' as ONE token wires it as a stop id
        class HashTok(ByteTokenizer):
            HASH_ID = 300

            def encode(self, text, max_length=None):
                if text == "###":
                    return [self.HASH_ID]
                return super().encode(text, max_length)

        chat2 = Chat(FROZEN, TRAINABLE, CFG, HashTok(), max_len=1024)
        assert chat2._stop_ids == (HashTok.HASH_ID,)


class TestEncodeMedia:
    def test_realtime_encode_shapes(self):
        vision_cfg = clip_vit.ClipVisionConfig.tiny()
        audio_cfg = hubert.HubertConfig.tiny()
        frozen = {
            "visual_encoder": clip_vit.init_vision_params(
                jax.random.PRNGKey(0), vision_cfg, dtype=jnp.float32
            ),
            "acoustic_encoder": hubert.init_params(
                jax.random.PRNGKey(1), audio_cfg, dtype=jnp.float32
            ),
        }
        raw = {
            "frame": jnp.asarray(
                np.random.RandomState(0).randint(0, 255, (2, 3, 28, 28, 3)), jnp.uint8
            ),
            "audio": jnp.asarray(np.random.RandomState(1).randn(2, 4, 1, 800), jnp.float32),
        }
        # tiny vision cfg expects 28x28 inputs; patch the eval size via resize
        feats = encode_media_features(
            frozen,
            affectgpt.AffectGPTConfig.tiny(),
            raw,
            vision_cfg=vision_cfg,
            audio_cfg=audio_cfg,
        )
        assert feats["frame"].shape == (2, 3, vision_cfg.projection_dim)
        assert feats["audio"].shape == (2, 4, audio_cfg.hidden_size)
