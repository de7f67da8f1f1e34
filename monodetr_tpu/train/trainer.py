"""Training orchestration.

Parity with reference lib/helpers/trainer_helper.py (Trainer): epoch loop
with per-epoch numpy reseed (:74), pretrain/resume checkpoint loading
(:44-63), periodic checkpoint saves (latest / per-epoch / best by
Car-moderate AP3D_R40, :86-108), in-loop Tester evaluation, per-30-batch
loss logging.  The per-batch work is one jitted train_step; batches stream
from the threaded loader with host->device transfer overlapped by prefetch.
"""

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import (get_checkpoint_state, load_checkpoint, merge_params,
                         save_checkpoint)
from .optimizer import build_optimizer
from .scheduler import lr_at_epoch
from .train_step import make_train_step
from ..utils.misc import is_main_process

BATCH_KEYS = (
    "images", "calibs", "img_sizes", "labels", "boxes", "boxes_3d", "depth",
    "size_3d", "heading_bin", "heading_res", "mask",
)


class Trainer:
    def __init__(self, cfg, model, criterion, params, train_loader,
                 test_loader, lr_cfg, optim_cfg, logger, model_name,
                 tester=None, mesh=None):
        self.cfg = cfg
        self.model = model
        self.criterion = criterion
        self.params = params
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.lr_cfg = lr_cfg
        self.base_lr = float(optim_cfg.get("lr", 2e-4))
        self.logger = logger
        self.epoch = 0
        self.best_result = 0.0
        self.best_epoch = 0
        self.model_name = model_name
        self.output_dir = os.path.join("./" + cfg.get("save_path", "outputs/"), model_name)
        self.tester = tester
        self.shard_batch = None

        self.opt_state, step_fn = build_optimizer(optim_cfg, params)
        if mesh is not None:
            from ..parallel.mesh import make_parallel_train_step, shard_batch_fn

            self.train_step = make_parallel_train_step(
                model, criterion, step_fn, mesh
            )
            self.shard_batch = shard_batch_fn(mesh)
            logger.info("data parallel over %d devices" % mesh.size)
        else:
            self.train_step = make_train_step(model, criterion, step_fn)
        # dropout-mask PRNG impl: 'rbg' is the cheap TPU-native generator
        # (dropout bit patterns carry no reference-parity constraint)
        impl = cfg.get("rng_impl", "threefry2x32")
        if impl == "threefry":  # forgiving alias for the jax impl name
            impl = "threefry2x32"
        self.rng = jax.random.key(cfg.get("seed", 444), impl=impl)

        if cfg.get("pretrain_model"):
            assert os.path.exists(cfg["pretrain_model"])
            state = load_checkpoint(cfg["pretrain_model"], self.logger)
            # partial checkpoints (e.g. backbone-only ImageNet weights from
            # tools/convert_checkpoint.py --torchvision-backbone) merge into
            # the fresh init; full checkpoints replace every leaf
            self.params = jax.device_put(
                merge_params(self.params, state["model_state"]))

        if cfg.get("resume_model"):
            resume_path = os.path.join(self.output_dir, "checkpoint.pth")
            assert os.path.exists(resume_path)
            state = load_checkpoint(resume_path, self.logger)
            self.params = jax.device_put(state["model_state"])
            self.opt_state = jax.device_put(state["optimizer_state"])
            self.epoch = state["epoch"]
            self.best_result = state["best_result"]
            self.best_epoch = state["best_epoch"]
            self.logger.info(
                "Loading Checkpoint... Best Result:{}, Best Epoch:{}".format(
                    self.best_result, self.best_epoch
                )
            )

    def train(self):
        start_epoch = self.epoch
        best_result = self.best_result
        best_epoch = self.best_epoch
        for epoch in range(start_epoch, self.cfg["max_epoch"]):
            np.random.seed(np.random.get_state()[1][0] + epoch)
            self.train_one_epoch(epoch)
            self.epoch += 1

            if (self.epoch % self.cfg.get("save_frequency", 1)) == 0:
                best_result, best_epoch = self._save_and_eval_epoch(
                    best_result, best_epoch)

        # PROC-0-ONLY INVARIANT: non-main processes skip eval entirely
        # (_save_and_eval_epoch returns its inputs unchanged there), so
        # best_result/best_epoch are only meaningful on process 0.  Nothing
        # may branch or issue collectives keyed on them off process 0; they
        # exist for proc-0 logging and the final summary line below.
        self.best_result = best_result
        self.best_epoch = best_epoch
        self.logger.info(
            "Best Result:{}, epoch:{}".format(best_result, best_epoch)
        )

    def _save_and_eval_epoch(self, best_result, best_epoch):
        """Checkpoint save + in-loop eval for the current epoch.

        Writes and eval happen once, on process 0 only (reference
        save_on_master/is_main_process, utils/misc.py:381-432; SURVEY §5.8).
        Non-main processes return immediately and block at their first
        collective of the next epoch until process 0 catches up."""
        if not is_main_process():
            return best_result, best_epoch
        os.makedirs(self.output_dir, exist_ok=True)
        if self.cfg.get("save_all", False):
            ckpt_name = os.path.join(
                self.output_dir, "checkpoint_epoch_%d" % self.epoch
            )
        else:
            ckpt_name = os.path.join(self.output_dir, "checkpoint")
        save_checkpoint(
            get_checkpoint_state(
                self.params, self.opt_state, self.epoch,
                best_result, best_epoch,
            ),
            ckpt_name,
        )
        if self.tester is not None:
            self.logger.info("Test Epoch {}".format(self.epoch))
            # multi-host: params are replicated global arrays; pull a
            # host-local copy so the tester's single-device jit works
            self.tester.params = (
                jax.device_get(self.params)
                if jax.process_count() > 1 else self.params)
            self.tester.inference()
            cur_result = self.tester.evaluate()
            if cur_result > best_result:
                best_result = cur_result
                best_epoch = self.epoch
                save_checkpoint(
                    get_checkpoint_state(
                        self.params, self.opt_state, self.epoch,
                        best_result, best_epoch,
                    ),
                    os.path.join(self.output_dir, "checkpoint_best"),
                )
            self.logger.info(
                "Best Result:{}, epoch:{}".format(best_result, best_epoch)
            )
        return best_result, best_epoch

    def train_one_epoch(self, epoch):
        self.train_loader.set_epoch(epoch)
        lr = jnp.float32(lr_at_epoch(
            self.lr_cfg, self.base_lr, epoch,
            max_epoch=int(self.cfg.get("max_epoch", 195))))
        t0 = time.time()
        n_imgs = 0
        # optional profiler trace of a few steps in the first epoch
        # (cfg profile_steps: N -> trace batches [2, 2+N) to <output>/profile)
        profile_steps = int(self.cfg.get("profile_steps", 0))
        for batch_idx, (batch, _infos) in enumerate(self.train_loader):
            if profile_steps and epoch == 0 and batch_idx == 2:
                jax.profiler.start_trace(
                    os.path.join(self.output_dir, "profile")
                )
            if profile_steps and epoch == 0 and batch_idx == 2 + profile_steps:
                jax.block_until_ready(self.params)
                jax.profiler.stop_trace()
                profile_steps = 0
                self.logger.info(
                    "profiler trace written to %s/profile" % self.output_dir
                )
            arrays = {k: jnp.asarray(batch[k]) for k in BATCH_KEYS}
            if self.shard_batch is not None:
                arrays = self.shard_batch(arrays)
            self.rng, sub = jax.random.split(self.rng)
            self.params, self.opt_state, losses = self.train_step(
                self.params, self.opt_state, arrays, lr, sub
            )
            n_imgs += int(batch["valid"].sum())

            if batch_idx % 30 == 0:
                losses = {k: float(v) for k, v in losses.items()}  # one pull
                dt = time.time() - t0
                ips = n_imgs / dt if dt > 0 else 0
                main = {
                    k: v for k, v in losses.items()
                    if not any(k.endswith(f"_{i}") for i in range(6))
                }
                self.logger.info(
                    "epoch %d batch %d | loss_detr %.2f | %s | %.1f img/s"
                    % (
                        epoch, batch_idx, losses.get("loss_detr", 0.0),
                        ", ".join(f"{k} {v:.2f}" for k, v in sorted(main.items())),
                        ips,
                    )
                )
        jax.block_until_ready(self.params)
        dt = time.time() - t0
        self.logger.info(
            "epoch %d done in %.1fs (%.2f img/s)" % (epoch, dt, n_imgs / max(dt, 1e-9))
        )
