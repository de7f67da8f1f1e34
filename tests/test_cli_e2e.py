"""Full-CLI end-to-end smoke test (VERDICT round-2 item 3).

Drives the real CLI driver (`tools/train_val.py`, reference parity:
/root/reference/tools/train_val.py:90-106) as a subprocess on a synthetic
KITTI dataset: train 2 epochs -> per-epoch Tester eval -> checkpoint on
disk -> final AP eval, then the `-e/--evaluate_only` path against the saved
checkpoint.  This is the one test exercising the integration seam (config
plumbing, Trainer<->Tester<->eval handoff, checkpoint selection) that every
unit/golden test skips.
"""

import os
import subprocess
import sys

import pytest
import yaml

from tests.synthetic_kitti import make_synthetic_kitti

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_tiny_config(tmp_path, data_root):
    with open(os.path.join(REPO, "configs", "monodetr.yaml")) as f:
        cfg = yaml.safe_load(f)

    cfg["dataset"].update(
        root_dir=str(data_root),
        batch_size=2,
        resolution=[320, 128],  # divisible by 64 (4 feature levels)
        # keep augmentation on: it is part of the integration seam
    )
    cfg["model"].update(
        enc_layers=1,
        dec_layers=1,
        # exact reference sampling semantics; also the fastest path on CPU
        # (no interpret-mode Pallas)
        msda_impl="gather",
        dec_msda_impl="gather",
        dtype="fp32",
        remat=False,
    )
    cfg["model_name"] = "smoke"
    cfg["trainer"].update(max_epoch=2, save_frequency=1)
    cfg["lr_scheduler"]["decay_list"] = [1]
    cfg["tester"].update(mode="single", threshold=0.1)

    cfg_path = tmp_path / "smoke.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # single CPU device: the driver auto-enables the DP mesh on >1 device,
    # which tests/test_parallel.py already covers
    env["XLA_FLAGS"] = ""
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_val.py")] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1800,
    )


def _read_logs(output_dir):
    logs = []
    for f in sorted(os.listdir(output_dir)):
        if f.startswith("train.log"):
            with open(os.path.join(output_dir, f)) as fh:
                logs.append(fh.read())
    return "\n".join(logs)


@pytest.mark.slow
def test_cli_train_then_evaluate_only(tmp_path):
    data_root = tmp_path / "kitti"
    make_synthetic_kitti(str(data_root), n_train=4, n_val=2, seed=7)
    cfg_path = _write_tiny_config(tmp_path, data_root)

    # --- train 2 epochs + in-loop eval + final eval ---
    proc = _run_cli(["--config", str(cfg_path)], cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr[-4000:]

    output_dir = tmp_path / "outputs" / "smoke"
    assert (output_dir / "checkpoint.pth").exists()

    log = _read_logs(output_dir)
    assert "Training" in log
    assert "epoch 1 done" in log  # both epochs ran
    # per-epoch Tester eval + final eval each emit the official AP table
    assert log.count("Evaluating (official)") >= 3
    assert "Car AP" in log
    assert "Best Result:" in log

    # results written in KITTI txt format for every val image, under the
    # run dir like the reference (tester_helper.py:113)
    results_dir = tmp_path / "outputs" / "smoke" / "outputs" / "data"
    txts = [f for f in os.listdir(results_dir) if f.endswith(".txt")]
    assert len(txts) == 2

    # --- evaluate_only against the saved checkpoint ---
    proc = _run_cli(["--config", str(cfg_path), "-e"], cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr[-4000:]
    log = _read_logs(output_dir)
    assert "Evaluation Only" in log
    # checkpoint_best may not exist after 2 random-init epochs (AP can stay
    # 0.0, and best requires a strict improvement) -- the Tester must fall
    # back to checkpoint.pth and still evaluate
    assert ("Loading Checkpoint" in log) or ("checkpoint_best.pth missing" in log)
