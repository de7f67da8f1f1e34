"""Profile the full train step on the real TPU and print a per-component
device-time breakdown.

Runs a few steps under jax.profiler.trace, then parses the generated
trace.json.gz directly (the TensorBoard UI is unavailable here) and
aggregates XLA op durations by the jax name-stack substrings that identify
each model component.

Usage: python tools/profile_step.py [--steps 3] [--batch 16]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HLO_DUMP_DIR = "/tmp/monodetr_hlo_dump"

COMPONENTS = [
    ("dec cross_attn (MSDA)", ["cross_attn/"]),
    ("dec depth-cross-attn", ["cross_attn_depth"]),
    ("dec self-attn/dense", ["decoder_layer"]),
    ("enc MSDA", ["self_attn"]),
    ("enc dense (ffn/norm)", ["encoder_layer"]),
    ("depth predictor", ["depth_predictor"]),
    ("backbone", ["backbone"]),
    ("matcher", ["matcher"]),
    ("criterion/losses", ["criterion", "loss_"]),
    ("optimizer", ["adamw", "transpose(update)", "opt"]),
]


def load_hlo_scope_map():
    """instruction name -> jax op_name scope, from the XLA text dump."""
    files = [f for f in glob.glob(os.path.join(HLO_DUMP_DIR, "*.txt"))
             if "jit__step" in f and "after_optimizations" in f
             and "before" not in os.path.basename(f)]
    if not files:
        return {}
    path = max(files, key=os.path.getmtime)
    scope = {}
    pat = re.compile(r"%?([\w.\-]+) = .*metadata=\{[^}]*op_name=\"([^\"]+)\"")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                scope[m.group(1)] = m.group(2)
    return scope


def make_batch(B, H, W, T=50):
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    return {
        "images": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "calibs": jnp.tile(jnp.asarray(
            [[721.54, 0.0, 609.56, 44.86], [0.0, 721.54, 172.85, 0.22],
             [0.0, 0.0, 1.0, 0.003]], jnp.float32)[None], (B, 1, 1)),
        "img_sizes": jnp.tile(jnp.asarray([[1242.0, 375.0]], jnp.float32), (B, 1)),
        "labels": jnp.asarray(rng.randint(0, 2, (B, T)).astype(np.int32)),
        "boxes": jnp.asarray(np.concatenate(
            [rng.rand(B, T, 2) * 0.8 + 0.1,
             rng.rand(B, T, 2) * 0.15 + 0.02], -1).astype(np.float32)),
        "boxes_3d": jnp.asarray(np.concatenate(
            [rng.rand(B, T, 2), rng.rand(B, T, 4) * 0.1 + 0.02],
            -1).astype(np.float32)),
        "depth": jnp.asarray((rng.rand(B, T, 1) * 50 + 5).astype(np.float32)),
        "size_3d": jnp.asarray((rng.rand(B, T, 3) + 0.8).astype(np.float32)),
        "heading_bin": jnp.asarray(rng.randint(0, 12, (B, T, 1)).astype(np.int32)),
        "heading_res": jnp.asarray((rng.randn(B, T, 1) * 0.2).astype(np.float32)),
        "mask": jnp.asarray(rng.rand(B, T) > 0.7),
    }


def parse_trace(trace_dir, n_steps):
    """Sum device-op durations (us) grouped by component name patterns."""
    files = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert files, f"no trace.json.gz under {trace_dir}"
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # device PIDs: process_name metadata containing "TPU" and not "Host"
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if ("TPU" in name or "/device" in name.lower()) and "Host" not in name:
                dev_pids.add(e["pid"])

    scope_map = load_hlo_scope_map()
    sums = {}
    op_sums = {}
    scope_sums = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        # only leaf HLO rows: skip step/run aggregate rows (they double-count)
        if not re.search(r"[a-zA-Z]", name) or name.startswith("jit_") \
                or name.startswith("RunId"):
            continue
        args = e.get("args", {}) or {}
        if "hlo_category" not in args:
            continue
        dur = e.get("dur", 0)
        total += dur
        scope = scope_map.get(name.lstrip("%"), "")
        longname = scope + " " + args.get("long_name", "")[:200] + " " + name
        key = None
        for comp, pats in COMPONENTS:
            if any(p in longname for p in pats):
                key = comp
                break
        sums[key or "other"] = sums.get(key or "other", 0.0) + dur
        op_sums[(name, scope[:120])] = op_sums.get((name, scope[:120]), 0.0) + dur
        # aggregate by 3-level scope prefix
        sp = "/".join(scope.split("/")[:4]) if scope else "(no scope)"
        scope_sums[sp] = scope_sums.get(sp, 0.0) + dur

    print(f"\n== device time by component (ms per step, {n_steps} steps) ==")
    for k, v in sorted(sums.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v / 1000.0 / n_steps:8.1f}")
    print(f"  {'TOTAL':28s} {total / 1000.0 / n_steps:8.1f}")

    print("\n== device time by scope prefix (ms per step) ==")
    for k, v in sorted(scope_sums.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v / 1000.0 / n_steps:8.1f}  {k}")

    print("\n== top 40 ops (ms per step) ==")
    for (name, scope), v in sorted(op_sums.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {v / 1000.0 / n_steps:8.2f}  {name}  {scope}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=None,
                    help="override batch (default: BENCH_BS env or 16)")
    ap.add_argument("--trace-dir", default="/tmp/monodetr_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monodetr_tpu.models import MonoDETR
    from monodetr_tpu.models.criterion import SetCriterion
    from monodetr_tpu.train.optimizer import build_optimizer
    from monodetr_tpu.train.train_step import make_train_step

    # the BENCH_* env overrides, parsed by the same helper bench.py uses,
    # so a trace always matches the bench configuration being profiled
    # (incl. BENCH_WINDOW and the extended BENCH_REMAT strings)
    from bench import bench_env

    env = bench_env()
    rng_impl = env["rng_impl"]
    model = MonoDETR(dtype=jnp.bfloat16, **env["model_kwargs"])
    crit = SetCriterion({"num_classes": 3, "dec_layers": 3, "group_num": 11})
    B = env["batch"] if args.batch is None else args.batch
    batch = make_batch(B, env["height"], env["width"])

    params = jax.jit(lambda r: model.init(
        r, batch["images"], batch["calibs"], batch["img_sizes"], train=True
    ))(jax.random.PRNGKey(0))
    opt_state, step_fn = build_optimizer(
        {"type": "adamw", "lr": 2e-4, "weight_decay": 1e-4}, params)
    train_step = make_train_step(model, crit, step_fn, donate=False)

    key = jax.random.key(1, impl=rng_impl)
    lr = jnp.float32(2e-4)
    p, s = params, opt_state
    for _ in range(4):  # warmup/compile
        key, sub = jax.random.split(key)
        p, s, losses = train_step(p, s, batch, lr, sub)
    _ = float(losses["loss_detr"])

    # fetch the optimized HLO (with op_name metadata) for scope attribution;
    # --xla_dump_to does not work here because compilation runs on a remote
    # relay service, so the dump files land on the relay host, not ours
    os.makedirs(HLO_DUMP_DIR, exist_ok=True)
    txt = train_step.jitted.lower(p, s, batch, lr, key).compile().as_text()
    with open(os.path.join(
            HLO_DUMP_DIR, "module_jit__step.after_optimizations.txt"),
            "w") as f:
        f.write(txt)

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        key, sub = jax.random.split(key)
        p, s, losses = train_step(p, s, batch, lr, sub)
    _ = float(losses["loss_detr"])
    jax.profiler.stop_trace()
    wall = (time.perf_counter() - t0) / args.steps
    print(f"wall per step (incl. trace overhead): {wall * 1000:.1f} ms")

    parse_trace(args.trace_dir, args.steps)


if __name__ == "__main__":
    main()
