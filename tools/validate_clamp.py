"""Windowed-clamp semantics validation (VERDICT round-1, item 4).

The production encoder MSDA (`msda_impl: pallas`) clamps sampling offsets
to a +-(G/2-1)px window around each query's static center and scales the
reference offset-bias init ring to 0.75x the window; the `gather` impl is
bit-faithful to the reference's ms_deform_attn_core_pytorch
(ops/functions/ms_deform_attn_func.py:41-61).  This script measures whether
the deviation matters in training:

  1. train two models N steps from IDENTICAL params (the shipped windowed
     init) and an identical rng/batch sequence, differing ONLY in
     msda_impl: gather vs pallas; record full loss trajectories;
  2. cross-impl forward agreement: run the eval forward under BOTH impls on
     the pallas-trained params and compare decoded top-k detections
     (score, class, 2D box) — if training keeps sampling points inside the
     window, exact and clamped semantics coincide on the learned weights.

Writes outputs/clamp_validation.json and prints a summary.  Run on the TPU
chip (~6 min):  python tools/validate_clamp.py [--steps 300] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_batch(rng, B, H, W):
    import jax.numpy as jnp

    T = 50
    calib = np.array(
        [[721.54, 0.0, 609.56, 44.86],
         [0.0, 721.54, 172.85, 0.22],
         [0.0, 0.0, 1.0, 0.003]], np.float32)
    n_obj = rng.randint(3, 12, B)
    mask = np.arange(T)[None] < n_obj[:, None]
    return {
        "images": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "calibs": jnp.asarray(np.tile(calib[None], (B, 1, 1))),
        "img_sizes": jnp.asarray(
            np.tile(np.array([[1242.0, 375.0]], np.float32), (B, 1))),
        "labels": jnp.asarray(rng.randint(0, 3, (B, T)).astype(np.int32)),
        "boxes": jnp.asarray(np.concatenate(
            [rng.rand(B, T, 2) * 0.8 + 0.1,
             rng.rand(B, T, 2) * 0.15 + 0.03], -1).astype(np.float32)),
        "boxes_3d": jnp.asarray(np.concatenate(
            [rng.rand(B, T, 2) * 0.8 + 0.1,
             rng.rand(B, T, 4) * 0.12 + 0.02], -1).astype(np.float32)),
        "depth": jnp.asarray((rng.rand(B, T, 1) * 55 + 3).astype(np.float32)),
        "size_3d": jnp.asarray(
            (rng.rand(B, T, 3) * 1.5 + 0.8).astype(np.float32)),
        "heading_bin": jnp.asarray(
            rng.randint(0, 12, (B, T, 1)).astype(np.int32)),
        "heading_res": jnp.asarray(
            (rng.randn(B, T, 1) * 0.2).astype(np.float32)),
        "mask": jnp.asarray(mask),
    }


def train_one(impl, window, params0, batches, steps, lr_peak, warmup):
    import jax
    import jax.numpy as jnp

    from monodetr_tpu.models import MonoDETR
    from monodetr_tpu.models.criterion import SetCriterion
    from monodetr_tpu.train.optimizer import build_optimizer
    from monodetr_tpu.train.train_step import make_train_step

    model = MonoDETR(msda_impl=impl, msda_window=window)
    crit = SetCriterion({"num_classes": 3, "dec_layers": 3, "group_num": 11})
    params = jax.tree_util.tree_map(jnp.copy, params0)
    opt_state, step_fn = build_optimizer(
        {"type": "adamw", "lr": lr_peak, "weight_decay": 1e-4}, params)
    train_step = make_train_step(model, crit, step_fn)

    traj = []
    t0 = time.time()
    for i in range(steps):
        lr = lr_peak * min(1.0, (i + 1) / warmup)
        params, opt_state, losses = train_step(
            params, opt_state, batches[i % len(batches)],
            jnp.float32(lr), jax.random.PRNGKey(1000 + i))
        total = float(losses["loss_detr"])
        traj.append(total)
        if i % 25 == 0 or i == steps - 1:
            print(f"[{impl}] step {i}: loss_detr={total:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return params, traj


def decode_agreement(params, batch, wimpl="pallas", window=8, threshold=0.2):
    """Top-k decode under gather vs pallas forward on the same params."""
    import jax

    from monodetr_tpu.eval.decode import extract_dets_from_outputs
    from monodetr_tpu.models import MonoDETR

    dets = {}
    for impl in ("gather", wimpl):
        out = jax.jit(
            lambda p, b, impl=impl: extract_dets_from_outputs(
                MonoDETR(msda_impl=impl, msda_window=window).apply(
                    p, b["images"], b["calibs"], b["img_sizes"], train=False),
                topk=50)
        )(params, batch)
        dets[impl] = np.asarray(out)

    # dets: [B, K, 37]; col 0 = class, col 1 = score, cols 2:6 = 2d box
    # (fractional cx,cy,l,r or similar 2d proj) — compare confident ones
    a, b = dets["gather"], dets[wimpl]
    agree, total = 0, 0
    score_gap = []
    for i in range(a.shape[0]):
        sa = a[i][a[i, :, 1] > threshold]
        sb = b[i][b[i, :, 1] > threshold]
        total += len(sa)
        for d in sa:
            if len(sb) == 0:
                continue
            same_cls = sb[sb[:, 0] == d[0]]
            if len(same_cls) == 0:
                continue
            # nearest same-class detection by 2d-box center
            dist = np.abs(same_cls[:, 2:6] - d[2:6]).sum(-1)
            j = int(np.argmin(dist))
            if dist[j] < 0.05 * 4:  # avg 1.25% of image per box coord
                agree += 1
                score_gap.append(abs(float(same_cls[j, 1]) - float(d[1])))
    frac = agree / max(1, total)
    return {"n_confident_gather": int(total), "n_matched_in_pallas": int(agree),
            "match_frac": float(frac),
            "mean_score_gap": float(np.mean(score_gap)) if score_gap else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--impl", default="pallas",
                    help="windowed impl to validate against gather")
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--out", default=os.path.join("outputs",
                    "clamp_validation.json"))
    args = ap.parse_args()

    import jax

    from monodetr_tpu.models import MonoDETR

    rng = np.random.RandomState(0)
    batches = [make_batch(rng, args.batch, args.height, args.width)
               for _ in range(4)]

    # identical start: the shipped (windowed-scaled) init
    model = MonoDETR(msda_impl=args.impl, msda_window=args.window)
    params0 = jax.jit(
        lambda r: model.init(
            r, batches[0]["images"], batches[0]["calibs"],
            batches[0]["img_sizes"], train=True)
    )(jax.random.PRNGKey(0))

    results = {"steps": args.steps, "batch": args.batch,
               "resolution": [args.width, args.height],
               "impl": args.impl, "window": args.window}
    trained = {}
    for impl in ("gather", args.impl):
        params, traj = train_one(
            impl, args.window, params0, batches, args.steps, 2e-4, warmup=50)
        trained[impl] = params
        results[f"traj_{impl}"] = traj

    g = np.asarray(results["traj_gather"])
    p = np.asarray(results[f"traj_{args.impl}"])
    rel = np.abs(g - p) / np.maximum(np.abs(g), 1e-6)
    results["final_gather"] = float(g[-1])
    results["final_windowed"] = float(p[-1])
    results["final_rel_diff"] = float(rel[-1])
    results["max_rel_diff"] = float(rel.max())
    # smoothed tail comparison (last 20% of steps)
    k = max(1, len(g) // 5)
    results["tail_mean_gather"] = float(g[-k:].mean())
    results["tail_mean_windowed"] = float(p[-k:].mean())
    results["tail_rel_diff"] = float(
        abs(g[-k:].mean() - p[-k:].mean()) / abs(g[-k:].mean()))

    results["decode_agreement_on_windowed_params"] = decode_agreement(
        trained[args.impl], batches[0], args.impl, args.window)
    results["decode_agreement_on_gather_params"] = decode_agreement(
        trained["gather"], batches[0], args.impl, args.window)

    os.makedirs("outputs", exist_ok=True)
    out = args.out
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if not k.startswith("traj")}, indent=1))
    print(f"written: {out}")


if __name__ == "__main__":
    main()
