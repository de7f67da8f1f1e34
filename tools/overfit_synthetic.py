"""Learning-loop sanity proxy: overfit the SHIPPED config on synthetic KITTI.

Real-KITTI AP parity is environmentally impossible here (no dataset, no
reference checkpoint), and the executable goldens only pin forward/backward
numerics.  This tool closes the remaining dynamic gap: it trains the shipped
TPU configuration (windowed-Pallas encoder MSDA, bf16, grouped queries,
reference-AdamW) on a handful of synthetic images with val == train and
checks that val-on-train AP comes out high — proof the full learning system
(kernels incl. the clamped sampling semantics, matcher, 8 losses, decode,
official KITTI eval) converges end-to-end, not just that each stage matches
the reference statically (reference training loop being proxied:
/root/reference/tools/train_val.py:90-106 + lib/helpers/trainer_helper.py).

Drives the real CLI driver (tools/train_val.py) so the integration path is
the shipped one.  Writes outputs/overfit_synthetic.json with the loss
trajectory endpoints and the final AP table.

Usage:  python tools/overfit_synthetic.py [--images 8] [--epochs 300]
            [--out outputs/overfit_synthetic.json] [--workdir /tmp/overfit]
Runtime: ~25 min on one v5e chip at the default settings.
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import yaml


def make_config(workdir, data_root, images, epochs, msda_impl=None):
    with open(os.path.join(REPO, "configs", "monodetr.yaml")) as f:
        cfg = yaml.safe_load(f)
    if msda_impl:
        # clamp-semantics A/B: 'pallas' (shipped windowed kernel) vs
        # 'gather' (exact reference semantics) on identical seed/data
        cfg["model"]["msda_impl"] = msda_impl

    # overfit protocol: augmentation off, val == train, tiny LR schedule
    cfg["dataset"].update(
        root_dir=str(data_root),
        batch_size=images,   # one batch per epoch
        aug_pd=False,
        aug_crop=False,
        random_flip=0.0,
        random_crop=0.0,
    )
    # model/kernels stay EXACTLY as shipped (pallas MSDA, bf16, 3+3 layers)
    cfg["model_name"] = "overfit"
    cfg["trainer"].update(max_epoch=epochs, save_frequency=epochs)
    cfg["lr_scheduler"]["decay_list"] = [int(epochs * 0.7), int(epochs * 0.9)]
    cfg["tester"].update(mode="single", checkpoint=epochs, threshold=0.2)

    cfg_path = os.path.join(workdir, "overfit.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


def parse_results(output_dir):
    """Loss endpoints + final AP table from the train logs."""
    logs = []
    for f in sorted(os.listdir(output_dir)):
        if f.startswith("train.log"):
            with open(os.path.join(output_dir, f)) as fh:
                logs.append(fh.read())
    log = "\n".join(logs)

    losses = [float(m) for m in re.findall(r"loss_detr ([0-9.]+)", log)]
    # official-eval AP lines: "Car AP(_R40)?@0.70, 0.70, 0.70:" then
    # "bbox AP:a, b, c" / "bev AP:..." / "3d AP:..."
    aps = {}
    blocks = re.findall(
        r"Car AP(_R40)?@([0-9., ]+):\s*\n"
        r"\s*bbox\s+AP:([0-9.,\s]+)\n\s*bev\s+AP:([0-9.,\s]+)\n"
        r"\s*3d\s+AP:([0-9.,\s]+)", log)
    for r40, thresh, bbox, bev, ap3d in blocks[-2:]:
        key = "Car_AP" + ("_R40" if r40 else "") + "@" + thresh.split(",")[0].strip()
        aps[key] = {
            "bbox": [float(x) for x in bbox.split(",")],
            "bev": [float(x) for x in bev.split(",")],
            "3d": [float(x) for x in ap3d.split(",")],
        }
    return losses, aps, log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--workdir", default="/tmp/overfit_synthetic")
    ap.add_argument("--msda-impl", default=None,
                    help="override model.msda_impl (pallas|gather|...) for "
                         "the clamp-semantics AP A/B")
    ap.add_argument("--out", default=os.path.join(REPO, "outputs",
                                                  "overfit_synthetic.json"))
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    data_root = os.path.join(args.workdir, "kitti")

    from tests.synthetic_kitti import make_synthetic_kitti
    if not os.path.exists(os.path.join(data_root, "ImageSets", "train.txt")):
        make_synthetic_kitti(data_root, n_train=args.images, n_val=2, seed=3,
                             max_cars=6)
    # val == train: the eval measures pure memorization capacity
    with open(os.path.join(data_root, "ImageSets", "train.txt")) as f:
        train_ids = f.read()
    with open(os.path.join(data_root, "ImageSets", "val.txt"), "w") as f:
        f.write(train_ids)

    cfg_path = make_config(args.workdir, data_root, args.images, args.epochs,
                           args.msda_impl)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_val.py"),
         "--config", cfg_path],
        cwd=args.workdir, text=True, timeout=7200)
    output_dir = os.path.join(args.workdir, "outputs", "overfit")
    losses, aps, log = parse_results(output_dir)

    result = {
        "rc": proc.returncode,
        "epochs": args.epochs,
        "images": args.images,
        "msda_impl": args.msda_impl or "pallas (config default)",
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "loss_trajectory_every10": losses[::10],
        "final_ap": aps,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
