"""CLI driver: train + evaluate MonoDETR-TPU from a YAML config.

Reference parity (tools/train_val.py): `--config` + `-e/--evaluate_only`
flags, seeded setup, builders for loaders/model/criterion, Trainer then
final Tester (skipped when test_split == 'test').
"""

import argparse
import datetime
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import yaml

from monodetr_tpu.config import load_config
from monodetr_tpu.parallel.mesh import make_mesh, maybe_init_distributed
from monodetr_tpu.data import build_dataloader
from monodetr_tpu.eval.tester import Tester
from monodetr_tpu.models import build_monodetr
from monodetr_tpu.models.criterion import SetCriterion
from monodetr_tpu.train.trainer import Trainer
from monodetr_tpu.utils import create_logger, set_random_seed

parser = argparse.ArgumentParser(description="MonoDETR-TPU monocular 3D detection")
parser.add_argument("--config", dest="config", help="settings in yaml format")
parser.add_argument("-e", "--evaluate_only", action="store_true", help="evaluate model on validation set")
args = parser.parse_args()


def main():
    assert os.path.exists(args.config)
    cfg = load_config(args.config)
    set_random_seed(cfg.get("random_seed", 444))
    rank = maybe_init_distributed()

    model_name = cfg["model_name"]
    output_path = os.path.join("./" + cfg["trainer"].get("save_path", "outputs/"), model_name)
    os.makedirs(output_path, exist_ok=True)

    log_file = os.path.join(
        output_path,
        "train.log.%s" % datetime.datetime.now().strftime("%Y%m%d_%H%M%S"),
    )
    logger = create_logger(log_file, rank=rank)
    logger.info("devices: %s" % (jax.devices(),))

    # data parallelism: explicit `trainer.data_parallel: true`, or automatic
    # when more than one device is visible
    mesh = None
    if cfg["trainer"].get("data_parallel", len(jax.devices()) > 1):
        if len(jax.devices()) > 1:
            mesh = make_mesh()
            logger.info("mesh: %s" % (mesh,))

    # build dataloaders; multi-host DP loads per-host slices of each
    # global batch (parallel/mesh.py shard_batch_fn reassembles them)
    shard = None
    if jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())
    train_loader, test_loader = build_dataloader(cfg["dataset"], process_shard=shard)

    # build model + criterion
    model = build_monodetr(cfg["model"])
    criterion = SetCriterion(cfg["model"])

    # init params on a sample batch shape
    res = cfg["dataset"].get("resolution", [1280, 384])
    sample_images = np.zeros((1, res[1], res[0], 3), np.float32)
    sample_calibs = np.eye(3, 4, dtype=np.float32)[None]
    sample_sizes = np.array([[res[0], res[1]]], np.float32)
    params = jax.jit(
        lambda r: model.init(r, sample_images, sample_calibs, sample_sizes, train=False)
    )(jax.random.PRNGKey(cfg.get("random_seed", 444)))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logger.info("model params: %.2fM" % (n_params / 1e6))

    if args.evaluate_only:
        logger.info("###################  Evaluation Only  ##################")
        tester = Tester(
            cfg=cfg["tester"], model=model, params=params,
            dataloader=test_loader, logger=logger,
            train_cfg=cfg["trainer"], model_name=model_name,
        )
        tester.test()
        return

    tester = Tester(
        cfg=cfg["tester"], model=model, params=params,
        dataloader=test_loader, logger=logger,
        train_cfg=cfg["trainer"], model_name=model_name,
    )

    trainer_cfg = dict(cfg["trainer"])
    trainer_cfg["seed"] = cfg.get("random_seed", 444)
    trainer_cfg.setdefault("rng_impl", cfg.get("rng_impl", "threefry2x32"))
    trainer = Trainer(
        cfg=trainer_cfg,
        model=model,
        criterion=criterion,
        params=params,
        train_loader=train_loader,
        test_loader=test_loader,
        lr_cfg=cfg["lr_scheduler"],
        optim_cfg=cfg["optimizer"],
        logger=logger,
        model_name=model_name,
        tester=tester if cfg["dataset"]["test_split"] != "test" else None,
        mesh=mesh,
    )

    logger.info("###################  Training  ##################")
    logger.info("Batch Size: %d" % (cfg["dataset"]["batch_size"]))
    logger.info("Learning Rate: %f" % (cfg["optimizer"]["lr"]))
    trainer.train()

    if cfg["dataset"]["test_split"] == "test":
        return

    logger.info("###################  Evaluation  ##################")
    tester.params = trainer.params
    tester.test()


if __name__ == "__main__":
    main()
