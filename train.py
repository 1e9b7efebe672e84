"""Training entry point.

API parity with the reference CLI (reference: AffectGPT/train.py:31-86):
`python train.py --cfg-path <yaml> [--options a.b=c ...]`. NCCL/torchrun
setup is replaced by the jax mesh (multi-host via jax.distributed when
launched on a slice); seeds are fixed per host.
"""

from __future__ import annotations

import argparse
import datetime
import random

import numpy as np

from affectgpt_tpu.bootstrap import build_model
from affectgpt_tpu.config import Config
from affectgpt_tpu.training.runner import Runner, build_datasets
from affectgpt_tpu.utils.logging import setup_logger


def parse_args():
    parser = argparse.ArgumentParser(description="AffectGPT-TPU training")
    parser.add_argument("--cfg-path", required=True, help="path to configuration file.")
    parser.add_argument(
        "--options", nargs="+",
        help="overwrite params in the config, e.g. --options run.max_epoch=2 model.ckpt=aaa",
    )
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed for a multi-host slice")
    return parser.parse_args()


def setup_seeds(seed: int) -> None:
    import jax

    random.seed(seed)
    np.random.seed(seed)
    _ = jax.random.PRNGKey(seed)


def main() -> None:
    args = parse_args()
    setup_logger()
    if args.multihost:
        import jax

        jax.distributed.initialize()

    cfg = Config.from_file(args.cfg_path, options=args.options)
    setup_seeds(int(cfg.run.get("seed", 42)))
    # run.job_id overrides the timestamp (deterministic run dirs for
    # scripted resume/A-B workflows; the default mirrors the reference's
    # now() job id, runner_base.py setup_output_dir)
    job_id = str(cfg.run.get("job_id") or datetime.datetime.now().strftime("%Y%m%d%H%M"))

    model_cfg, frozen, trainable, tokenizer = build_model(
        cfg, with_encoders=not cfg.model.get("skip_encoders", False)
    )
    datasets, ratios = build_datasets(cfg, tokenizer, model_cfg)
    runner = Runner(
        cfg, tokenizer, frozen, trainable, model_cfg, datasets, ratios, job_id=job_id
    )
    runner.train()


if __name__ == "__main__":
    main()
