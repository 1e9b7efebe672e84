"""Training orchestration: datasets → mixed loaders → compiled sharded
step → per-epoch checkpoints, logs and curves.

Capability-parity with the reference runtime (reference:
runners/runner_base.py:42-704 RunnerBase + tasks/base_task.py:101-198
train_epoch): warmup-cosine LR at iteration resolution, grad
accumulation, ratio-mixed multi-dataset sampling, epoch-0 zero-shot
checkpoint, per-epoch trainable-only checkpoints with loss in the name,
JSON-lines log.txt, training curves. DDP/AMP/GradScaler machinery is
replaced by one pjit-compiled step on a dp×tp mesh (training/train_step).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from affectgpt_tpu import registry
from affectgpt_tpu.config import Config
import affectgpt_tpu.data.datasets  # noqa: F401 — registers the dataset classes
import affectgpt_tpu.data.instruction_datasets  # noqa: F401 — instruction/caption corpora
from affectgpt_tpu.data.base_dataset import DatasetConfig, ModelDataConfig
from affectgpt_tpu.data.loaders import DevicePrefetcher, IterLoader, MultiIterLoader
from affectgpt_tpu.models import affectgpt
from affectgpt_tpu.parallel import mesh as mesh_lib
from affectgpt_tpu.training import checkpoint, optim, train_step
from affectgpt_tpu.utils.logging import (
    JsonLinesLogger,
    MetricLogger,
    TrainingVisualizer,
    logger,
)


@registry.register_task("video_text_pretrain")
def build_datasets(cfg: Config, tokenizer, model_cfg: affectgpt.AffectGPTConfig):
    """Instantiate every dataset named in the YAML `datasets:` section
    (the reference's builder registry path, tasks/base_task.py:33-62)."""
    data_model_cfg = ModelDataConfig(
        num_video_query_token=model_cfg.num_video_query_token,
        num_audio_query_token=model_cfg.num_audio_query_token,
        num_multi_query_token=model_cfg.num_multi_query_token,
        num_image_query_token=model_cfg.num_image_query_token,
        au_fusion_type=model_cfg.au_fusion_type,
    )
    datasets, ratios = [], []
    for name, node in cfg.datasets.items():
        ds_cfg = DatasetConfig.from_cfg(node)
        if ds_cfg.face_or_frame.startswith("multi"):
            assert model_cfg.use_multi, "multi fusion requested but model has use_multi=False"
        cls = registry.get("dataset", _canonical_dataset_name(name))
        datasets.append(cls(tokenizer, ds_cfg, data_model_cfg))
        ratios.append(float((node or {}).get("ratio", 1.0)))
    return datasets, ratios


def _canonical_dataset_name(name: str) -> str:
    """YAML keys are conventionally lowercase (the reference's builder
    names); resolve them case-insensitively against the registry."""
    registered = registry.names("dataset")
    if name in registered:
        return name
    lowered = {n.lower(): n for n in registered}
    return lowered.get(name.lower(), name)


@registry.register_runner("runner_base")
class Runner:
    def __init__(
        self,
        cfg: Config,
        tokenizer,
        frozen,
        trainable,
        model_cfg: affectgpt.AffectGPTConfig,
        datasets,
        ratios,
        mesh=None,
        job_id: Optional[str] = None,
    ):
        self.cfg = cfg
        run = cfg.run
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer
        self.mesh = mesh or mesh_lib.create_mesh(tp=int(run.get("tp", 1)))

        # multihost: the mesh spans all processes' devices; each process
        # loads 1/process_count of the global batch and feeds it through
        # make_array_from_process_local_data (reference trains multi-GPU via
        # torchrun + DistributedSampler, my_affectgpt/common/dist_utils.py:54-79)
        self.n_proc = jax.process_count()
        self.is_main = jax.process_index() == 0

        self.max_epoch = int(run.get("max_epoch", 1))
        self.iters_per_epoch = int(run.get("iters_per_epoch", 100))
        global_batch = int(run.get("batch_size_train", 1)) * self.mesh.shape["dp"]
        assert global_batch % self.n_proc == 0, (global_batch, self.n_proc)
        self.batch_size = global_batch // self.n_proc  # per-process loader batch
        self.log_freq = int(run.get("log_freq", 50))

        total_steps = self.max_epoch * self.iters_per_epoch
        sched_name = run.get("lr_sched", "linear_warmup_cosine_lr")
        schedule = registry.get("lr_scheduler", sched_name)(
            init_lr=float(run.get("init_lr", 1e-5)),
            min_lr=float(run.get("min_lr", 1e-6)),
            warmup_steps=int(run.get("warmup_steps", 0)),
            total_steps=total_steps,
            warmup_start_lr=float(run.get("warmup_lr", -1)),
            decay_rate=float(run.get("lr_decay_rate", 1.0)),
            steps_per_epoch=self.iters_per_epoch,
        )
        self.schedule = schedule
        self.tx = optim.make_optimizer(
            schedule,
            weight_decay=float(run.get("weight_decay", 0.05)),
            beta2=float(run.get("beta2", 0.999)),
            max_grad_norm=run.get("max_grad_norm"),
            accum_steps=int(run.get("accum_grad_iters", 1)),
        )
        model_node = cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model)
        if any(str(k).startswith("frozen_") and v for k, v in model_node.items()):
            mask = optim.freeze_mask_from_flags(trainable, model_node)
            self.tx = optim.apply_freeze_mask(self.tx, mask)

        state = train_step.create_train_state(trainable, self.tx)
        self.state = train_step.shard_state(self.mesh, state)
        self.frozen = mesh_lib.shard_params(self.mesh, frozen)
        remat_cfg = run.get("remat", False)  # False | True | "dots"
        # train-mode dropout: the reference trains under model.train()
        # (runner_base.py:461) — the seed is passed unconditionally so
        # EVERY site's own rate gates itself: LoRA dropout (peft 0.05;
        # YAML model.lora_dropout: 0 disables that site only) and the
        # merger Q-Formers' BERT dropouts (0.1, active whenever the
        # fusion type is qformer, independent of lora_dropout — exactly
        # torch's model.train()). Validation below stays eval-mode
        # (no rng), like runner_base.py:496.
        self.step_fn = train_step.compile_train_step(
            self.mesh, model_cfg, self.tx, self.state, self.frozen,
            remat=remat_cfg if remat_cfg == "dots" else bool(remat_cfg),
            dropout_seed=int(run.get("seed", 42)),
        )

        if bool(run.get("smoke_check", True)):
            # fail fast on a broken corpus before any compile/training work
            # (reference constructs+collates 3 samples at dataset init,
            # base_dataset.py:156-165)
            for ds in datasets:
                ds.smoke_check()
                logger.info("smoke check ok: %s (%d samples)", ds.dataset, len(ds))

        # per-process seed offset: hosts draw disjoint random sample streams
        # (the role of the reference's DistributedSampler rank sharding)
        proc_off = 7919 * jax.process_index()
        loaders = [
            IterLoader(ds, self.batch_size, seed=int(run.get("seed", 42)) + i + proc_off)
            for i, ds in enumerate(datasets)
        ]
        self.loader = MultiIterLoader(loaders, ratios, seed=int(run.get("seed", 42)))

        # optional validation (reference runner_base.py:385-446 evaluate +
        # best-checkpoint): a loss-only eval loop over an INDEPENDENT
        # sample stream of the first training corpus. NOTE this is
        # eval-mode loss on training-distribution data (the reference's
        # valid splits are separate asset files this config schema does
        # not carry) — it tracks fit/divergence, not generalization.
        # proc_off keeps per-host val shards disjoint in multihost runs,
        # same as the train loaders.
        self.evaluate = bool(run.get("evaluate", False))
        self.val_iters = int(run.get("val_iters", 20))
        self._val_loader = None
        if self.evaluate and datasets:
            self._val_loader = IterLoader(
                datasets[0], self.batch_size,
                seed=int(run.get("seed", 42)) + 999 + proc_off,
            )
            cfg_model = model_cfg

            def eval_loss(trainable, frozen, batch):
                from affectgpt_tpu.models import affectgpt as _m

                return _m.forward_loss(frozen, trainable, cfg_model, batch)

            self._eval_fn = jax.jit(eval_loss)
        self.best_val = float("inf")

        self.output_dir = cfg.output_dir if job_id is None else f"{cfg.output_dir}/{job_id}"
        self.json_log = JsonLinesLogger(self.output_dir)
        self.visualizer = TrainingVisualizer(self.output_dir)
        self.tb = None
        if run.get("tensorboard", False):
            import os as _os

            from affectgpt_tpu.utils.tensorboard import TensorBoardLogger

            self.tb = TensorBoardLogger(_os.path.join(self.output_dir, "tb"))
        self.start_epoch = 0

        resume = run.get("resume_ckpt_path")
        if resume:
            payload = checkpoint.load_checkpoint(resume)
            opt_state = self.state.opt_state
            if "opt_state" in payload:
                # orbax restores plain dicts — re-restore with the live
                # opt_state as the structure template so optax NamedTuples
                # (MultiStepsState/ScaleByAdamState) come back intact;
                # field-name mapping, not leaf order, so it is safe
                template = {
                    "trainable": payload["trainable"],
                    "epoch": payload["epoch"],
                    "step": payload["step"],
                    "opt_state": jax.tree.map(np.asarray, jax.device_get(opt_state)),
                }
                if "best_val" in payload:
                    template["best_val"] = payload["best_val"]
                payload = checkpoint.load_checkpoint(resume, template=template)
                opt_state = payload["opt_state"]
            self.state = train_step.TrainState(
                step=jax.device_put(np.int32(payload["step"])),
                trainable=payload["trainable"],
                opt_state=opt_state,
            )
            self.state = train_step.shard_state(self.mesh, self.state)
            # checkpoints are saved with epoch = EPOCHS COMPLETED, so the
            # next epoch index to train IS payload["epoch"] (a +1 here
            # would silently skip one full epoch)
            self.start_epoch = int(payload["epoch"])
            self.best_val = float(payload.get("best_val", float("inf")))
            logger.info("Resumed from %s at epoch %d", resume, self.start_epoch)

    def _put(self, array, sharding):
        """Host batch → global device array. Single-process: device_put.
        Multihost: this process's local batch is one shard of the global
        [global_batch, ...] array (jax.make_array_from_process_local_data
        assembles it without any cross-host copy)."""
        if self.n_proc > 1:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(array)
            )
        return jax.device_put(array, sharding)

    def _device_batch(self, batch: dict) -> dict:
        sharded = {}
        sharding = mesh_lib.batch_sharding(self.mesh)
        for key in ("input_ids", "attention_mask", "labels"):
            sharded[key] = self._put(batch[key], sharding)
        features = {
            m: self._put(v, sharding) for m, v in batch["features"].items()
        }
        raw = batch.get("raw") or {}
        if raw and ("visual_encoder" in self.frozen or "acoustic_encoder" in self.frozen):
            # realtime mode: frozen encoders run on device inside the input
            # path (the reference's non-preextracted branch)
            from affectgpt_tpu.inference.chat import encode_media_features

            raw_dev = {m: self._put(v, sharding) for m, v in raw.items()}
            features.update(encode_media_features(self.frozen, self.model_cfg, raw_dev))
        sharded["features"] = features
        sharded["offsets"] = {
            m: self._put(v, sharding) for m, v in batch["offsets"].items()
        }
        return sharded

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        metrics_log = MetricLogger()
        prefetcher = DevicePrefetcher(self.loader, put_fn=self._device_batch)
        tic = time.time()
        try:
            for it in range(self.iters_per_epoch):
                batch = next(prefetcher)
                self.state, metrics = self.step_fn(self.state, self.frozen, batch)
                step = epoch * self.iters_per_epoch + it
                if it % self.log_freq == 0 or it == self.iters_per_epoch - 1:
                    # schedule() is a jnp closure — evaluate it only at log
                    # boundaries, or every iteration pays a device→host
                    # round trip that serializes the loop with the
                    # in-flight step on the single-ordered-stream relay
                    lr = float(self.schedule(step))
                    loss = float(metrics["loss"])  # host sync point
                    metrics_log.update(loss=loss, lr=lr)
                    self.visualizer.record(loss=loss, lr=lr)
                    if self.tb is not None:
                        self.tb.add_scalar("train/loss", loss, step)
                        self.tb.add_scalar("train/lr", lr, step)
                    logger.info(
                        "epoch %d iter %d/%d loss %.4f lr %.2e",
                        epoch, it, self.iters_per_epoch, loss, lr,
                    )
        finally:
            prefetcher.close()
        stats = metrics_log.to_dict()
        stats["epoch_time_s"] = time.time() - tic
        return stats

    def train(self) -> None:
        if self.is_main:
            self.json_log.write({"config": self.cfg.to_dict()})
        # epoch-0 zero-shot checkpoint before training (runner_base.py:396);
        # called on all processes — save_checkpoint gathers collectively and
        # writes from process 0 only
        if self.start_epoch == 0:
            checkpoint.save_checkpoint(
                self.output_dir, 0, self.state.trainable, step=0, config=self.cfg.to_dict()
            )
        # first-class tracing (SURVEY §5: the reference has none) — set
        # run.profile_dir to capture a jax.profiler trace of the first epoch.
        profile_dir = self.cfg.run.get("profile_dir")
        for epoch in range(self.start_epoch, self.max_epoch):
            if profile_dir and epoch == self.start_epoch:
                from affectgpt_tpu.utils.logging import profile_trace

                with profile_trace(profile_dir):
                    stats = self.train_epoch(epoch)
            else:
                stats = self.train_epoch(epoch)
            if self._val_loader is not None:
                val_losses = []
                for _ in range(self.val_iters):
                    batch = self._device_batch(next(self._val_loader))
                    val_losses.append(float(self._eval_fn(self.state.trainable, self.frozen, batch)))
                stats["val_loss"] = float(np.mean(val_losses))
                if stats["val_loss"] < self.best_val:
                    self.best_val = stats["val_loss"]
                    checkpoint.save_checkpoint(
                        self.output_dir + "/best", epoch + 1, self.state.trainable,
                        loss=stats["val_loss"], config=self.cfg.to_dict(),
                    )
                    logger.info("new best val_loss %.4f at epoch %d", self.best_val, epoch)
            if self.is_main:
                self.json_log.write({"epoch": epoch, **stats})
                self.visualizer.plot_and_save(epoch)
            checkpoint.save_checkpoint(
                self.output_dir, epoch + 1, self.state.trainable,
                opt_state=self.state.opt_state,
                step=int(self.state.step), loss=stats.get("loss"),
                config=self.cfg.to_dict(),
                # carried so a resumed run doesn't re-declare a worse
                # post-crash val_loss as a "new best" checkpoint
                best_val=self.best_val,
            )
        logger.info("Training complete: %d epochs in %s", self.max_epoch, self.output_dir)
