"""Evaluation orchestration.

Parity with reference lib/helpers/tester_helper.py (Tester): `single` mode
(best or chosen-epoch checkpoint) or `all` mode (every checkpoint at/after a
start epoch, mtime-sorted), batched no-grad inference with per-image timing,
on-device top-k extraction, host decode to KITTI txt, official AP eval.
"""

import glob
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.kitti_utils import Calibration
from ..train.checkpoint import load_checkpoint
from ..utils.misc import is_main_process
from .decode import decode_detections, extract_dets_from_outputs, save_results


class Tester:
    def __init__(self, cfg, model, params, dataloader, logger,
                 train_cfg=None, model_name="monodetr"):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.dataloader = dataloader
        self.logger = logger
        self.train_cfg = train_cfg or {}
        self.model_name = model_name
        self.class_name = dataloader.dataset.class_name
        self.output_dir = os.path.join(
            "./" + self.train_cfg.get("save_path", "outputs/"), model_name
        )
        self.dataset_type = cfg.get("type", "KITTI")
        self.max_objs = dataloader.dataset.max_objs

        self._eval_fn = jax.jit(
            lambda p, imgs, calibs, sizes: extract_dets_from_outputs(
                self.model.apply(p, imgs, calibs, sizes, train=False),
                topk=self.cfg.get("topk", 50),
            )
        )

    def test(self):
        assert self.cfg["mode"] in ["single", "all"]

        # single-checkpoint path (reference tester_helper.py:30-43): 'all'
        # without save_all degrades to this branch there too.
        if self.cfg["mode"] == "single" or not self.train_cfg.get("save_all", False):
            if self.cfg.get("checkpoint_path"):
                checkpoint_path = self.cfg["checkpoint_path"]
            elif self.train_cfg.get("save_all", False):
                checkpoint_path = os.path.join(
                    self.output_dir,
                    "checkpoint_epoch_{}.pth".format(self.cfg.get("checkpoint", 0)),
                )
            else:
                checkpoint_path = os.path.join(self.output_dir, "checkpoint_best.pth")
                if not os.path.exists(checkpoint_path):
                    # no eval ever beat the initial best (e.g. short smoke
                    # runs): fall back to the latest checkpoint
                    fallback = os.path.join(self.output_dir, "checkpoint.pth")
                    if os.path.exists(fallback):
                        self.logger.info(
                            "checkpoint_best.pth missing; using %s" % fallback
                        )
                        checkpoint_path = fallback
            if os.path.exists(checkpoint_path):
                state = load_checkpoint(checkpoint_path, self.logger)
                self.params = jax.device_put(state["model_state"])
            else:
                self.logger.info(
                    "no checkpoint on disk (%s); evaluating in-memory params"
                    % checkpoint_path
                )
            self.inference()
            self.evaluate()
        else:
            # every epoch checkpoint at/after the start epoch, mtime-sorted
            # (reference tester_helper.py:46-62: collects checkpoint_epoch_N.pth
            # with N >= cfg['checkpoint'] at walk time)
            start_epoch = int(self.cfg.get("checkpoint", 0))
            checkpoints_list = []
            for _, _, files in os.walk(self.output_dir):
                for f in files:
                    if (f.startswith("checkpoint_epoch_") and f.endswith(".pth")
                            and f[17:-4].isdigit() and int(f[17:-4]) >= start_epoch):
                        checkpoints_list.append(os.path.join(self.output_dir, f))
            checkpoints_list.sort(key=os.path.getmtime)
            for checkpoint in checkpoints_list:
                state = load_checkpoint(checkpoint, self.logger)
                self.params = jax.device_put(state["model_state"])
                self.inference()
                self.evaluate()

    def inference(self):
        results = {}
        model_times = []
        for batch, infos in self.dataloader:
            t0 = time.time()
            dets = self._eval_fn(
                self.params,
                jnp.asarray(batch["images"]),
                jnp.asarray(batch["calibs"]),
                jnp.asarray(batch["img_sizes"]),
            )
            dets = np.asarray(dets)
            model_times.append((time.time() - t0) / len(infos))

            n_valid = len(infos)
            info = {
                "img_id": [i["img_id"] for i in infos],
                "img_size": [i["img_size"] for i in infos],
            }
            calibs = [Calibration.from_p2(batch["calibs"][i]) for i in range(n_valid)]
            batch_results = decode_detections(
                dets[:n_valid], info, calibs,
                self.dataloader.dataset.cls_mean_size,
                self.cfg.get("threshold", 0.2),
            )
            results.update(batch_results)

        if model_times:
            self.logger.info(
                "inference on %d images, %.1f ms/img (model)"
                % (len(results), 1000 * float(np.mean(model_times[1:] or model_times)))
            )
        self.save_results(results)
        return results

    @property
    def results_dir(self):
        # under the run dir like the reference (tester_helper.py:113:
        # <save_path>/<model_name>/outputs/data), so a non-default
        # save_path keeps checkpoints and result txts together
        return os.path.join(self.output_dir, "outputs", "data")

    def save_results(self, results):
        if not is_main_process():
            # multi-host: result txts are written once, by process 0
            # (reference save_on_master semantics, utils/misc.py:404-407)
            return
        save_results(results, self.results_dir)

    def evaluate(self):
        if not is_main_process():
            return 0.0
        assert os.path.exists(self.results_dir)
        return self.dataloader.dataset.eval(results_dir=self.results_dir, logger=self.logger)
