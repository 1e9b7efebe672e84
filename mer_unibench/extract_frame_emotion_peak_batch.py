"""Batch feature precompute for the 9 MER-UniBench evaluation datasets.

Capability-parity with the reference batch script (reference:
MER-UniBench/extract_frame_emotion_peak_batch.py:38-394): per-dataset
configs (video roots, label sources), emotion-peak or uniform frame
sampling, resumable per-sample .npy caches. Thin wrapper over
extract_multimodal_features_precompute.FeatureExtractor.

Usage:
  python mer_unibench/extract_frame_emotion_peak_batch.py \
      --datasets mer2023 meld --modality frame --save_root ./preextracted_features
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from affectgpt_tpu import paths, registry  # noqa: E402
from affectgpt_tpu.data.base_dataset import DatasetConfig, ModelDataConfig  # noqa: E402
from affectgpt_tpu.data.datasets import get_dataset_class  # noqa: E402,F401
from affectgpt_tpu.tokenization import ByteTokenizer  # noqa: E402
from affectgpt_tpu.utils.logging import logger, setup_logger  # noqa: E402

DATASET_CONFIGS = {
    "mer2023": "MER2023", "mer2024": "MER2024", "meld": "MELD",
    "iemocapfour": "IEMOCAPFour", "cmumosi": "CMUMOSI", "cmumosei": "CMUMOSEI",
    "sims": "SIMS", "simsv2": "SIMSv2", "ovmerdplus": "OVMERDPlus",
}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--datasets", nargs="+", default=list(DATASET_CONFIGS))
    parser.add_argument("--modality", default="all",
                        choices=["all", "frame", "face", "audio"])
    parser.add_argument("--save_root", default="./preextracted_features")
    parser.add_argument("--frame_sampling", default="uniform",
                        choices=["uniform", "headtail", "emotion_peak"])
    parser.add_argument("--frame_n_frms", type=int, default=8)
    parser.add_argument("--mer-factory-output", dest="mer_factory_output", default=None)
    args = parser.parse_args()
    setup_logger()

    from extract_multimodal_features_precompute import FeatureExtractor

    for key in args.datasets:
        ds_name = DATASET_CONFIGS[key.lower()]
        dataset = registry.get("dataset", ds_name)(
            ByteTokenizer(), DatasetConfig(face_or_frame="textonly"), ModelDataConfig()
        )
        names = dataset.read_test_names()
        extractor = FeatureExtractor(
            "CLIP_VIT_LARGE", "HUBERT_LARGE", args.frame_sampling,
            args.frame_n_frms, 8, args.save_root, ds_name,
        )
        modalities = ["frame", "face", "audio"] if args.modality == "all" else [args.modality]
        for i, name in enumerate(names):
            for modality in modalities:
                try:
                    if modality == "frame":
                        extractor.extract_frame(
                            name, paths.PATH_TO_RAW_VIDEO[ds_name], args.mer_factory_output
                        )
                    elif modality == "face":
                        extractor.extract_face(name, paths.PATH_TO_RAW_FACE[ds_name])
                    elif modality == "audio":
                        extractor.extract_audio(name, paths.PATH_TO_RAW_AUDIO[ds_name])
                except Exception as error:
                    logger.warning("%s/%s %s failed: %s", ds_name, name, modality, error)
            if (i + 1) % 100 == 0:
                logger.info("%s: %d/%d", ds_name, i + 1, len(names))
        logger.info("%s done (%d clips)", ds_name, len(names))


if __name__ == "__main__":
    main()
