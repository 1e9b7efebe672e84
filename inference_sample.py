"""Single-clip inference entry point.

API parity with the reference (reference: AffectGPT/inference_sample.py:
110-223): one (video, audio, subtitle) triple → printed emotion
description. Media decoding gates on available backends (data/media.py);
all tensor work runs on device through the compiled Chat path.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from affectgpt_tpu import constants
from affectgpt_tpu.bootstrap import build_model
from affectgpt_tpu.config import Config
from affectgpt_tpu.data import media
from affectgpt_tpu.inference.chat import Chat, encode_media_features
from affectgpt_tpu.ops import audio as audio_ops
from affectgpt_tpu.utils.logging import setup_logger


def parse_args():
    parser = argparse.ArgumentParser(description="AffectGPT-TPU single-clip inference")
    parser.add_argument("--cfg-path", default=None, help="path to configuration file.")
    parser.add_argument("--options", nargs="+")
    parser.add_argument("--zeroshot", action="store_true", default=False)
    parser.add_argument("--outside_user_message", default=None)
    parser.add_argument("--outside_face_or_frame", default=None)
    parser.add_argument("--video_path", default=None)
    parser.add_argument("--audio_path", default=None)
    parser.add_argument("--subtitle", default=None)
    parser.add_argument("--max_new_tokens", type=int, default=300)
    return parser.parse_args()


def main() -> None:
    args = parse_args()
    setup_logger()
    cfg = Config.from_file(args.cfg_path, args.options) if args.cfg_path else Config.from_dict({})

    face_or_frame = args.outside_face_or_frame or cfg.inference.get(
        "face_or_frame", "frame"
    )
    user_message = args.outside_user_message or (
        "Please infer the person's emotional state and provide your reasoning process."
    )

    model_cfg, frozen, trainable, tokenizer = build_model(cfg, with_encoders=True)
    chat = Chat(frozen, trainable, model_cfg, tokenizer)

    raw = {}
    if args.video_path:
        frames = media.read_video_frames(args.video_path, n_frms=8)
        raw["frame"] = jnp.asarray(frames[None])  # [1, T, H, W, 3]
    if args.audio_path:
        wav, rate = media.read_wav(args.audio_path)
        wav = audio_ops.resample_numpy(wav, rate, constants.AUDIO_SAMPLE_RATE)
        wav = wav.mean(axis=0) if wav.ndim == 2 else wav
        min_len = int(constants.AUDIO_CLIP_SECONDS * constants.AUDIO_SAMPLE_RATE)
        if wav.shape[0] < min_len:
            wav = np.pad(wav, (0, min_len - wav.shape[0]))
        clips = np.asarray(audio_ops.extract_clips(np.asarray(wav)))
        raw["audio"] = jnp.asarray(clips[None])  # [1, 8, 1, 32000]

    features = encode_media_features(frozen, model_cfg, raw) if raw else {}
    outputs = chat.answer_batch(
        face_or_frame, [args.subtitle], user_message, features,
        rng=jax.random.PRNGKey(0), max_new_tokens=args.max_new_tokens,
    )
    print(outputs[0])


if __name__ == "__main__":
    main()
