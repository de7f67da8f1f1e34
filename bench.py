"""Benchmark: MonoDETR-TPU training throughput (images/sec/chip) on the real
TPU at the reference recipe's shapes (384x1280, batch 16, 550 grouped
queries, full criterion + reference-AdamW update in one jitted step).

Measured on v5e (bf16, donated buffers, value-fetch synced): ~0.73 s/step
(~22 img/s) with the windowed-Pallas encoder MSDA + greedy-init on-device
Hungarian matcher, vs ~6.4 s/step (~2.5 img/s) for the exact-gather
formulation it replaces (kernel-level: fwd 447->38 ms, fwd+bwd
1289->96 ms per encoder layer).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": R}

vs_baseline: the reference publishes no throughput (BASELINE.md), so the
A100 denominator is an ANALYTICAL UPPER BOUND, derived as follows:
  - train-step compute at bs16/384x1280 is ~450 GFLOP/img (fwd ~150:
    ResNet-50 ~39 at this resolution + 3 encoder layers' FFN/proj soup
    ~80 + depth/decoder attention ~30; x3 for fwd+bwd);
  - a best-case A100 run of this irregular model (bf16 AMP, ~30% MFU on
    94 TFLOP/s dense bf16 ... ~25 TFLOP/s sustained) gives
    25e12 / 450e9 ~= 55 img/s.
The reference as shipped is fp32 (no AMP anywhere in the repo) with a
scipy-on-CPU matcher sync every step, so its real A100 throughput would be
well BELOW this bound — 55 img/s deliberately over-credits the baseline;
vs_baseline = value / 55.0 and >= 2.0 meets the driver's target.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

A100_REF_IMG_PER_SEC = 55.0
# v5e bf16 dense peak (for the MFU line; the chip this runs on)
TPU_PEAK_FLOPS = 197e12


def bench_env():
    """Parse the BENCH_* env overrides (tools/tpu_sprint*.sh sweeps).

    Shared by bench.py and tools/profile_step.py so a trace always matches
    the bench configuration being profiled.  Defaults = the shipped config,
    so the driver's bare `python bench.py` is unaffected.
    """
    remat = os.environ.get("BENCH_REMAT", "0")  # 0|1|backbone|encoder|all
    remat = {"0": False, "1": True}.get(remat, remat)
    # dropout-mask PRNG: 'rbg' (TPU-native generator, cheap; shipped
    # default after the round-3 A/B) vs 'threefry' (jax default, exact but
    # VPU-heavy at [B,S,256]-sized masks).  No parity constraint on dropout
    # bit patterns — the reference streams torch RNG.
    rng_impl = os.environ.get("BENCH_RNG", "rbg")
    if rng_impl == "threefry":  # forgiving alias for the jax impl name
        rng_impl = "threefry2x32"
    return {
        "batch": int(os.environ.get("BENCH_BS", 16)),
        "rng_impl": rng_impl,
        # stress config (BASELINE #4): BENCH_H=768 BENCH_W=2560
        # BENCH_BACKBONE=resnet101 BENCH_BS=2 BENCH_REMAT=1
        "height": int(os.environ.get("BENCH_H", 384)),
        "width": int(os.environ.get("BENCH_W", 1280)),
        "model_kwargs": dict(
            remat=remat,
            backbone_name=os.environ.get("BENCH_BACKBONE", "resnet50"),
            msda_impl=os.environ.get("BENCH_MSDA", "fused"),  # fused|pallas|sepwin|windowed|gather
            msda_window=int(os.environ.get("BENCH_WINDOW", 6)),
            dec_msda_impl=os.environ.get("BENCH_DEC_MSDA", "sep"),
        ),
    }


def main():
    import jax
    import jax.numpy as jnp

    from monodetr_tpu.models import MonoDETR
    from monodetr_tpu.models.criterion import SetCriterion
    from monodetr_tpu.train.optimizer import build_optimizer
    from monodetr_tpu.train.train_step import make_train_step

    env = bench_env()
    B = env["batch"]
    rng_impl = env["rng_impl"]
    H, W, T = env["height"], env["width"], 50
    # bf16 compute + remat: the TPU fast path (fp32 master params)
    model = MonoDETR(dtype=jnp.bfloat16, **env["model_kwargs"])
    crit = SetCriterion({"num_classes": 3, "dec_layers": 3, "group_num": 11})

    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "calibs": jnp.tile(
            jnp.asarray(
                [[721.54, 0.0, 609.56, 44.86],
                 [0.0, 721.54, 172.85, 0.22],
                 [0.0, 0.0, 1.0, 0.003]], jnp.float32,
            )[None],
            (B, 1, 1),
        ),
        "img_sizes": jnp.tile(jnp.asarray([[1242.0, 375.0]], jnp.float32), (B, 1)),
        "labels": jnp.asarray(rng.randint(0, 2, (B, T)).astype(np.int32)),
        "boxes": jnp.asarray(
            np.concatenate(
                [rng.rand(B, T, 2) * 0.8 + 0.1, rng.rand(B, T, 2) * 0.15 + 0.02], -1
            ).astype(np.float32)
        ),
        "boxes_3d": jnp.asarray(
            np.concatenate(
                [rng.rand(B, T, 2), rng.rand(B, T, 4) * 0.1 + 0.02], -1
            ).astype(np.float32)
        ),
        "depth": jnp.asarray((rng.rand(B, T, 1) * 50 + 5).astype(np.float32)),
        "size_3d": jnp.asarray((rng.rand(B, T, 3) + 0.8).astype(np.float32)),
        "heading_bin": jnp.asarray(rng.randint(0, 12, (B, T, 1)).astype(np.int32)),
        "heading_res": jnp.asarray((rng.randn(B, T, 1) * 0.2).astype(np.float32)),
        "mask": jnp.asarray(rng.rand(B, T) > 0.7),
    }

    params = jax.jit(
        lambda r: model.init(
            r, batch["images"], batch["calibs"], batch["img_sizes"], train=True
        )
    )(jax.random.PRNGKey(0))
    opt_state, step_fn = build_optimizer(
        {"type": "adamw", "lr": 2e-4, "weight_decay": 1e-4}, params
    )

    key = jax.random.key(1, impl=rng_impl)
    lr = jnp.float32(2e-4)

    def run(donate):
        train_step = make_train_step(model, crit, step_fn, donate=donate)
        return _timed_loop(jax, train_step, params, opt_state, batch, lr, key, B)

    try:
        runs = run(donate=True)
    except Exception:
        # donated-buffer chains can be unreliable through remote relays;
        # fall back to the non-donated step
        runs = run(donate=False)
    img_per_sec = float(np.median(runs))

    # MFU: XLA's own per-step FLOP count (cost_analysis of the compiled
    # train step) against the chip's dense bf16 peak.  Falls back to the
    # analytical ~450 GFLOP/img estimate if the platform won't report it.
    try:
        compiled = make_train_step(
            model, crit, step_fn, donate=False
        ).jitted.lower(params, opt_state, batch, lr, key).compile()
        flops_per_step = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_per_step = 450e9 * B
    mfu = img_per_sec / B * flops_per_step / TPU_PEAK_FLOPS

    print(
        json.dumps(
            {
                "metric": f"train_throughput_{H}x{W}_bs{B}",
                "value": round(img_per_sec, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_sec / A100_REF_IMG_PER_SEC, 3),
                "runs": [round(r, 2) for r in runs],
                "flops_per_img": round(flops_per_step / B / 1e9, 1),
                "mfu": round(mfu, 4),
            }
        )
    )


def _timed_loop(jax, train_step, params, opt_state, batch, lr, key, B):
    import time

    # warmup: compile + settle the device/runtime (the first ~10 executions
    # after a fresh compile run far below steady state on this platform)
    # Synchronize with VALUE fetches: on this platform block_until_ready
    # does not wait through the remote relay (a known-FLOPs matmul chain
    # "measured" 250x physical peak without a fetch).  One fetch closes each
    # phase; its single round-trip latency is amortized over the window.
    import jax as _jax

    p = _jax.tree_util.tree_map(lambda x: x.copy(), params)
    s = _jax.tree_util.tree_map(lambda x: x.copy(), opt_state)
    for _ in range(4):
        key, sub = jax.random.split(key)
        p, s, losses = train_step(p, s, batch, lr, sub)
    _ = float(losses["loss_detr"])

    # 3 independent windows -> median + per-run spread in the JSON line
    # (quantifies the run-to-run variance the single-window bench hid)
    rates = []
    for _ in range(3):
        iters = 12
        t0 = time.perf_counter()
        for i in range(iters):
            key, sub = jax.random.split(key)
            p, s, losses = train_step(p, s, batch, lr, sub)
        _ = float(losses["loss_detr"])
        dt = (time.perf_counter() - t0) / iters
        rates.append(B / dt)
    return rates


if __name__ == "__main__":
    main()
