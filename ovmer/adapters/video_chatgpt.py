"""Video-ChatGPT-style VIDEO-side adapter for the OV-MER zero-shot harness.

Matches the reference's Video-ChatGPT harness contract
(reference: OV-MER/Video-ChatGPT/main-video.py:96-150): iterate the
dataset's test names, 100-frame uniform sampling over the whole clip
(video_chatgpt's load_video num_frm=100), the detailed-description
emotion prompt variants (main-video.py:132-135 verbatim), responses
normalized and saved as name2reason in the shared `results-{flag}.npz`
format that evaluation.py scores.

Model side, redesigned for this stack: Video-ChatGPT is a CLIP-frames →
spatio-temporal-pooled-features → Vicuna model distributed outside HF.
The wrapper drives transformers-native
`LlavaNextVideoForConditionalGeneration` — the same architecture family
(CLIP tower, spatially pooled per-frame tokens, LLM decoder), shipped in
transformers, so no remote code executes. Frames decode through this
framework's media path (native decoder ladder, no decord), preprocessing
through ops.image — torch runs only the wrapped third-party model.

Usage (python API):
    from ovmer.adapters.video_chatgpt import build_model_fn
    from ovmer.zero_shot_harness import run_zero_shot
    fn = build_model_fn("/path/to/llava-next-video-checkpoint")
    run_zero_shot("MER2023", fn, save_npz="out/result-mer2023/0.npz")

CLI (mirrors the reference driver):
    python -m ovmer.adapters.video_chatgpt --model_dir ... --dataset MER2023 \
        --subtitle_flag subtitle --save_root out/
"""

from __future__ import annotations

import os
import sys
from typing import Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

# the reference's two prompt variants (main-video.py:132-135)
PROMPT_BASE = (
    "As an expert in the field of emotions, please focus on the facial "
    "expressions, body movements, environment, acoustic information, subtitle "
    "content, etc., in the video to discern clues related to the emotions of "
    "the individual. Please provide a detailed description and ultimately "
    "predict the emotional state of the individual in the video. "
)


def _emotion_prompt(subtitle: Optional[str]) -> str:
    if subtitle:
        return PROMPT_BASE + f"Subtitle content of the video: {subtitle} "
    return PROMPT_BASE


def build_model_fn(
    model_dir: Optional[str],
    device: str = "cpu",
    max_new_tokens: int = 256,
    num_frames: int = 100,
    model=None,
    tokenizer=None,
):
    """Returns model_fn(video_path, audio_path, subtitle, prompt) -> str.

    model/tokenizer may be passed pre-built (tests drive a tiny random
    LlavaNextVideo); otherwise they load from model_dir. num_frames
    follows Video-ChatGPT's 100-frame uniform sampling."""
    import jax.numpy as jnp
    import torch

    from affectgpt_tpu.data import media
    from affectgpt_tpu.ops import image as image_ops

    if model is None:
        from transformers import LlavaNextVideoForConditionalGeneration

        model = LlavaNextVideoForConditionalGeneration.from_pretrained(
            model_dir, torch_dtype=torch.float32
        ).to(device).eval()
    if tokenizer is None:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_dir)

    video_token = tokenizer.convert_ids_to_tokens(model.config.video_token_index)
    vision = model.config.vision_config
    out_size = vision.image_size
    pool = getattr(model.config, "spatial_pool_stride", 2)
    tokens_per_frame = (vision.image_size // vision.patch_size // pool) ** 2

    def model_fn(video_path, audio_path, subtitle, prompt) -> str:
        del audio_path, prompt  # Video-ChatGPT is video+text only
        frames = media.read_video_frames(video_path, n_frms=num_frames,
                                         sampling_name="uniform")
        pre = np.asarray(
            image_ops.preprocess_frames_eval(jnp.asarray(frames), out_size=out_size),
            np.float32,
        )
        if pre.shape[0] == 3:  # [3,T,H,W] → [T,3,H,W]
            pre = pre.transpose(1, 0, 2, 3)
        pixel_values_videos = torch.tensor(pre, device=device)[None]  # [1,T,3,H,W]
        n_frames = pixel_values_videos.shape[1]
        text = (
            f"USER: {video_token * (tokens_per_frame * n_frames)}\n"
            f"{_emotion_prompt(subtitle)}ASSISTANT:"
        )
        ids = torch.tensor([tokenizer.encode(text)], device=device)
        with torch.no_grad():
            out = model.generate(
                input_ids=ids,
                pixel_values_videos=pixel_values_videos,
                attention_mask=torch.ones_like(ids),
                max_new_tokens=max_new_tokens,
                do_sample=False,
            )
        reply = tokenizer.decode(out[0, ids.shape[1]:].tolist(), skip_special_tokens=True)
        # same response normalization as the reference (main-video.py:140)
        return reply.replace("\n", " ").replace("\t", " ").strip()

    return model_fn


def main() -> None:
    import argparse

    from ovmer.zero_shot_harness import run_zero_shot

    parser = argparse.ArgumentParser(description="Video-ChatGPT-style OV-MER video driver")
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--dataset", required=True, help="comma-separated dataset names")
    parser.add_argument("--subtitle_flag", default="subtitle",
                        choices=["subtitle", "nosubtitle"])
    parser.add_argument("--save_root", default="output/ovmer-video-chatgpt")
    parser.add_argument("--device", default="cpu")
    parser.add_argument("--max_new_tokens", type=int, default=256)
    parser.add_argument("--num_frames", type=int, default=100)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args()

    fn = build_model_fn(args.model_dir, device=args.device,
                        max_new_tokens=args.max_new_tokens,
                        num_frames=args.num_frames)
    for dataset in args.dataset.split(","):
        run_zero_shot(
            dataset, fn,
            save_npz=os.path.join(
                args.save_root, f"result-{dataset.lower()}",
                f"results-{args.subtitle_flag}.npz",
            ),
            with_subtitle=args.subtitle_flag == "subtitle",
            limit=args.limit,
        )


if __name__ == "__main__":
    main()
