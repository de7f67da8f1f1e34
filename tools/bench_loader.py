"""Loader-only throughput bench: synthetic KITTI PNGs on disk -> batches/s.

The full train step targets >= 110 img/s/chip, so the host pipeline must
sustain ~7 batches/s at batch 16 (PNG decode + affine warp + target encode +
collate).  Prints one line per worker count.

Usage: python tools/bench_loader.py [--batches 20] [--batch-size 16]
                                    [--workers 2,4,8,12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--workers", default="2,4,8,12")
    ap.add_argument("--mode", default="thread,process",
                    help="comma list of worker modes to sweep")
    ap.add_argument("--root", default="/tmp/kitti_loader_bench")
    args = ap.parse_args()

    from monodetr_tpu.data.kitti_dataset import KITTIDataset
    from monodetr_tpu.data.loader import DataLoader
    from monodetr_tpu import native
    from tests.synthetic_kitti import make_synthetic_kitti

    n_imgs = args.batches * args.batch_size
    if not os.path.exists(os.path.join(args.root, "ImageSets", "train.txt")):
        print(f"generating {n_imgs} synthetic KITTI images under {args.root} ...")
        make_synthetic_kitti(args.root, n_train=n_imgs, n_val=4, seed=7,
                             max_cars=8)

    ds = KITTIDataset("train", {"root_dir": args.root, "writelist": ["Car"],
                                "aug_pd": True, "aug_crop": True})
    print(f"native warp: {native.available()}; dataset: {len(ds)} images; "
          f"host cpus: {os.cpu_count()}")

    for mode in args.mode.split(","):
      for w in [int(x) for x in args.workers.split(",")]:
        loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                            num_workers=w, prefetch=4, worker_mode=mode)
        np.random.seed(0)
        it = iter(loader)
        next(it)  # warm the pool
        t0 = time.perf_counter()
        n = 0
        for batch, _ in it:
            n += 1
            if n >= args.batches:
                break
        dt = time.perf_counter() - t0
        bps = n / dt
        print(f"mode={mode:8s} workers={w:3d}: {bps:6.2f} batches/s = "
              f"{bps * args.batch_size:7.1f} img/s")


if __name__ == "__main__":
    main()
