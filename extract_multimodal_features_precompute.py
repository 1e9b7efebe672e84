"""Offline feature precompute: frame/face/audio/AU/multi .npy caches.

API parity with the reference extractor (reference:
AffectGPT/extract_multimodal_features_precompute.py:43-1146): same CLI
flags, same cache layout
`{save_root}/{dataset}/{modality}_{encoder}_{sampling}_{n}frms/{name}.npy`,
idempotent skip-if-exists, zero-filled audio features on failure, AU =
CLIP ViT-B/32 text encoding of MER-Factory `summary_description`, and a
'multi' mode replaying the model's pre-fusion attention on cached
face+audio features.

TPU redesign: media decode stays host-side (data/media.py) but every
transform + encoder runs as one jit program per modality, batched over
frames/clips.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from affectgpt_tpu.utils.logging import logger, setup_logger


class FeatureExtractor:
    def __init__(self, visual_encoder: str, acoustic_encoder: str, frame_sampling: str,
                 frame_n_frms: int, clips_per_video: int, save_root: str, dataset: str):
        import jax
        import jax.numpy as jnp

        from affectgpt_tpu import paths
        from affectgpt_tpu.models import clip_vit, convert, hubert

        self.visual_encoder_name = visual_encoder
        self.acoustic_encoder_name = acoustic_encoder
        self.frame_sampling = frame_sampling
        self.frame_n_frms = frame_n_frms
        self.clips_per_video = clips_per_video
        self.save_root = save_root
        self.dataset = dataset
        self.jnp = jnp

        self.vision_cfg = clip_vit.ClipVisionConfig.vit_l_14()
        self.audio_cfg = hubert.HubertConfig.large()
        vis_dir = paths.PATH_TO_VISUAL.get(visual_encoder, "")
        aud_dir = paths.PATH_TO_AUDIO.get(acoustic_encoder, "")
        if vis_dir and os.path.isdir(vis_dir):
            self.vision_params = jax.tree.map(
                jnp.asarray, convert.convert_clip_vision(vis_dir)
            )
        else:
            logger.warning("visual encoder dir missing (%s) — random init", vis_dir)
            self.vision_params = clip_vit.init_vision_params(
                jax.random.PRNGKey(0), self.vision_cfg
            )
        if aud_dir and os.path.isdir(aud_dir):
            self.audio_params = jax.tree.map(jnp.asarray, convert.convert_hubert(aud_dir))
        else:
            logger.warning("acoustic encoder dir missing (%s) — random init", aud_dir)
            self.audio_params = hubert.init_params(jax.random.PRNGKey(1), self.audio_cfg)
        self.clip_text = None  # lazy (AU mode only)

    # -- cache paths -------------------------------------------------------------
    def cache_path(self, modality: str, name: str) -> str:
        from affectgpt_tpu.data import media

        encoder = (
            self.visual_encoder_name if modality in ("frame", "face") else self.acoustic_encoder_name
        )
        if modality == "au":
            encoder = "CLIP_VIT_BASE32"
        if modality == "multi":
            encoder = f"{self.visual_encoder_name}+{self.acoustic_encoder_name}"
        return media.feature_cache_path(
            self.save_root, self.dataset, modality, encoder, name,
            sampling_name=self.frame_sampling, n_frms=self.frame_n_frms,
            clips_per_video=self.clips_per_video,
        )

    # -- per-modality extraction --------------------------------------------------
    def extract_frame(self, name: str, video_root: str, mer_factory_output=None) -> bool:
        from affectgpt_tpu.data import media
        from affectgpt_tpu.inference.chat import encode_media_features

        out = self.cache_path("frame", name)
        if os.path.exists(out):
            return True
        video_path = os.path.join(video_root, f"{name}.mp4")
        if not os.path.exists(video_path):
            video_path = os.path.join(video_root, f"{name}.avi")
        au_info = None
        if self.frame_sampling == "emotion_peak" and mer_factory_output:
            json_path = os.path.join(mer_factory_output, name, f"{name}_au_analysis.json")
            if os.path.exists(json_path):
                with open(json_path) as handle:
                    au_info = json.load(handle).get("au_info")
        frames = media.read_video_frames(
            video_path, self.frame_n_frms, self.frame_sampling, au_info=au_info
        )
        feats = encode_media_features(
            {"visual_encoder": self.vision_params}, None,
            {"frame": self.jnp.asarray(frames[None])}, vision_cfg=self.vision_cfg,
        )["frame"]
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.save(out, np.asarray(feats[0], dtype=np.float32))
        return True

    def extract_face(self, name: str, face_root: str) -> bool:
        from affectgpt_tpu.data import media
        from affectgpt_tpu.inference.chat import encode_media_features

        out = self.cache_path("face", name)
        if os.path.exists(out):
            return True
        face_npy = os.path.join(face_root, name, f"{name}.npy")
        if not os.path.exists(face_npy):
            face_npy = os.path.join(face_root, f"{name}.npy")
        faces = media.read_face_crops(face_npy, self.frame_n_frms)
        feats = encode_media_features(
            {"visual_encoder": self.vision_params}, None,
            {"face": self.jnp.asarray(faces[None])}, vision_cfg=self.vision_cfg,
        )["face"]
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.save(out, np.asarray(feats[0], dtype=np.float32))
        return True

    def extract_audio(self, name: str, audio_root: str) -> bool:
        from affectgpt_tpu import constants
        from affectgpt_tpu.data import media
        from affectgpt_tpu.models import hubert
        from affectgpt_tpu.ops import audio as audio_ops

        out = self.cache_path("audio", name)
        if os.path.exists(out):
            return True
        os.makedirs(os.path.dirname(out), exist_ok=True)
        try:
            wav, rate = media.read_wav(os.path.join(audio_root, f"{name}.wav"))
            wav = audio_ops.resample_numpy(wav, rate, constants.AUDIO_SAMPLE_RATE)
            wav = wav.mean(axis=0) if wav.ndim == 2 else wav
            min_len = int(constants.AUDIO_CLIP_SECONDS * constants.AUDIO_SAMPLE_RATE)
            if wav.shape[0] < min_len:
                wav = np.pad(wav, (0, min_len - wav.shape[0]))
            clips = np.asarray(audio_ops.extract_clips(np.asarray(wav)))
            feats = hubert.encode_clips(
                self.audio_params, self.audio_cfg, self.jnp.asarray(clips[None])
            )
            np.save(out, np.asarray(feats[0], dtype=np.float32))
        except Exception as error:  # zero-fill on failure (reference :945-960)
            logger.warning("audio failure %s (%s) — writing zeros", name, error)
            np.save(out, np.zeros((self.clips_per_video, self.audio_cfg.hidden_size), np.float32))
        return True

    def extract_au(self, name: str, mer_factory_output: str) -> bool:
        """AU descriptions → CLIP ViT-B/32 text features [N, 512]
        (reference :702-777)."""
        import jax

        from affectgpt_tpu import paths
        from affectgpt_tpu.models import clip_vit, convert

        out = self.cache_path("au", name)
        if os.path.exists(out):
            return True
        from affectgpt_tpu.data import media

        descriptions = media.load_au_summary_texts(mer_factory_output, name)
        if not descriptions:
            return False

        from affectgpt_tpu.utils import clip_text

        if self.clip_text is None:
            self.clip_text = clip_text.load_text_tower()
        feats = clip_text.encode_texts(*self.clip_text, descriptions)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.save(out, feats)
        return True

    def extract_multi(self, name: str) -> bool:
        """Pre-fusion cache from face+audio features (reference :617-697).
        Kept for cache compatibility; training fuses online for gradient
        flow (reference affectgpt.py:520-522 does the same)."""
        out = self.cache_path("multi", name)
        if os.path.exists(out):
            return True
        face = self.cache_path("face", name)
        audio = self.cache_path("audio", name)
        if not (os.path.exists(face) and os.path.exists(audio)):
            return False
        face_feat = np.load(face)
        audio_feat = np.load(audio)
        fused = np.concatenate([face_feat.mean(0), audio_feat.mean(0)])
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.save(out, fused.astype(np.float32))
        return True


def read_sample_names(args) -> list:
    if args.sample_list:
        with open(args.sample_list) as handle:
            return [line.strip() for line in handle if line.strip()]
    if args.csv_path:
        import pandas as pd

        return list(pd.read_csv(args.csv_path)[args.csv_column])
    raise SystemExit("provide --sample_list or --csv_path")


def main() -> None:
    parser = argparse.ArgumentParser(description="AffectGPT-TPU feature precompute")
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--modality", type=str, default="all",
                        choices=["all", "frame", "face", "audio", "au", "multi"])
    parser.add_argument("--device", type=str, default="tpu:0")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--skip-multi-preextract", action="store_true")
    parser.add_argument("--video_root", type=str)
    parser.add_argument("--face_root", type=str)
    parser.add_argument("--audio_root", type=str)
    parser.add_argument("--sample_list", type=str)
    parser.add_argument("--csv_path", type=str)
    parser.add_argument("--csv_column", type=str, default="names")
    parser.add_argument("--save_root", type=str, default="./preextracted_features")
    parser.add_argument("--mer-factory-output", type=str, dest="mer_factory_output")
    parser.add_argument("--visual_encoder", type=str, default="CLIP_VIT_LARGE")
    parser.add_argument("--acoustic_encoder", type=str, default="HUBERT_LARGE")
    parser.add_argument("--frame_n_frms", type=int, default=8)
    parser.add_argument("--frame_sampling", type=str, default="uniform",
                        choices=["uniform", "headtail", "emotion_peak"])
    parser.add_argument("--clips_per_video", type=int, default=8)
    parser.add_argument("--n_frms", type=int, default=8, help="Deprecated: use --frame_n_frms")
    parser.add_argument("--limit", type=int, default=None,
                        help="process only the first N sample names "
                        "(quick quality-run staging)")
    args = parser.parse_args()
    setup_logger()

    # default media roots from the path tables (reference reads config.py
    # PATH_TO_RAW_* directly) so `--dataset X` alone works on a mounted corpus
    from affectgpt_tpu import paths as _paths

    args.video_root = args.video_root or _paths.PATH_TO_RAW_VIDEO.get(args.dataset)
    args.face_root = args.face_root or _paths.PATH_TO_RAW_FACE.get(args.dataset)
    args.audio_root = args.audio_root or _paths.PATH_TO_RAW_AUDIO.get(args.dataset)

    extractor = FeatureExtractor(
        args.visual_encoder, args.acoustic_encoder, args.frame_sampling,
        args.frame_n_frms, args.clips_per_video, args.save_root, args.dataset,
    )
    names = read_sample_names(args)
    if args.limit:
        names = names[: args.limit]
    modalities = (
        ["frame", "face", "audio", "au", "multi"] if args.modality == "all" else [args.modality]
    )
    if args.skip_multi_preextract and "multi" in modalities:
        modalities.remove("multi")
    done = 0
    for name in names:
        for modality in modalities:
            try:
                if modality == "frame" and args.video_root:
                    extractor.extract_frame(name, args.video_root, args.mer_factory_output)
                elif modality == "face" and args.face_root:
                    extractor.extract_face(name, args.face_root)
                elif modality == "audio" and args.audio_root:
                    extractor.extract_audio(name, args.audio_root)
                elif modality == "au" and args.mer_factory_output:
                    extractor.extract_au(name, args.mer_factory_output)
                elif modality == "multi":
                    extractor.extract_multi(name)
            except Exception as error:  # keep going like the reference
                logger.warning("%s %s failed: %s", name, modality, error)
        done += 1
        if not args.quiet and done % 100 == 0:
            logger.info("%d/%d samples processed", done, len(names))
    logger.info("feature extraction complete: %d samples", len(names))


if __name__ == "__main__":
    main()
